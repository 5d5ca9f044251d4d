"""BPE tokenizer training — Sennrich et al. 2016 (arXiv:1508.07909),
the merge-learning loop behind GPT-2/Llama-style tokenizers.

Semantics (word-level BPE, no end-of-word marker): start from the
distinct-word table with corpus frequencies; each round counts every
adjacent symbol pair (all positions, weighted by word frequency),
merges the single most frequent pair — ties broken by (symbol-id asc,
symbol-id asc) — greedily LEFT-TO-RIGHT non-overlapping inside every
word, and records the merge.

Exact-replay encoding: a word's symbol sequence is a string of
fixed-width anchored tokens ``;%07d`` (initial symbol id = the
character's code point, which is < 9,000,000 for all of Unicode;
merged symbol r gets id 9,000,000 + r). Because ``;`` occurs only at
token starts and matches never share characters, the engines' literal
``replace()`` (left-to-right, non-overlapping, resume-after-match in
both Spark and DuckDB) applies the merge EXACTLY as BPE's greedy scan
does — including the ``aaaaa -> [aa][aa][a]`` regrouping cases a
separator-sharing encoding gets wrong.

Scale shape (the classic reason word-level BPE is feasible on a
100 TB corpus): ONE corpus scan builds the distinct-word frequency
table (groupBy word — map-side combined); every merge round then runs
on that vocabulary-sized table only (thousands of rows, not the
corpus), localCheckpointed per round so lineage stays flat. The
top-pair pick is an ORDER BY ... LIMIT 1 (TakeOrdered, no global
sort); the driver loop is O(R) rounds, each one distributed job —
the same accepted shape as the Lloyd / pointer-jump fixpoints.

Oracle: the DuckDB side replays the SAME arithmetic with R unrolled
``AS MATERIALIZED`` CTE stages (house rule: DuckDB 1.0 inlines plain
CTEs, which re-expands a chained pipeline exponentially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .textops import HASH_P, tokens_sql

N_MERGES = 12
_W = 7  # token digit width; max code point 0x10FFFF = 1,114,111 < 9e6
_NEW_BASE = 9_000_000


def _enc_sql(dialect: str, w: str) -> str:
    """Word -> anchored fixed-width symbol string (';%07d' per char)."""
    if dialect == "spark":
        return (
            f"aggregate(split({w}, ''), '', (acc, c) -> "
            f"concat(acc, ';', lpad(cast(ascii(c) as string), {_W}, '0')))"
        )
    return (
        f"list_aggregate(list_transform(string_split({w}, ''), "
        f"c -> ';' || lpad(cast(ascii(c) as varchar), {_W}, '0')), "
        f"'string_agg', '')"
    )


def _ids_sql(dialect: str, enc: str) -> str:
    """Symbol-id list of an encoded word."""
    if dialect == "spark":
        return (
            f"transform(filter(split({enc}, ';'), t -> t <> ''), "
            f"t -> cast(t as bigint))"
        )
    return (
        f"list_transform(list_filter(string_split({enc}, ';'), "
        f"t -> t <> ''), t -> cast(t as bigint))"
    )


def _pairs_sql(dialect: str, ids: str) -> str:
    """Adjacent (a, b) id pairs — every position, the Sennrich
    get_stats counting. Spark: slice+zip_with (never element_at in a
    lambda — see CLAUDE.md); guard short arrays (sequence/slice
    misbehave below length 2)."""
    if dialect == "spark":
        return (
            f"(CASE WHEN size({ids}) < 2 THEN array() "
            f"ELSE zip_with(slice({ids}, 1, size({ids}) - 1), "
            f"slice({ids}, 2, size({ids}) - 1), "
            f"(a, b) -> struct(a, b)) END)"
        )
    return (
        f"list_transform(range(1, len({ids})), "
        f"k -> struct_pack(a := {ids}[k], b := {ids}[k + 1]))"
    )


def _tok(dialect: str, id_expr: str) -> str:
    cast_t = "string" if dialect == "spark" else "varchar"
    return f"concat(';', lpad(cast({id_expr} as {cast_t}), {_W}, '0'))"


def _train_words(
    docs: DataFrame, n_merges: int
) -> tuple[DataFrame, list[dict]]:
    """Run the merge-learning rounds; returns (words, merges) where
    ``words`` is the final distinct-word table (w, enc, cnt) with all
    merges applied to ``enc``."""
    words = (
        docs.selectExpr(f"explode({tokens_sql('spark')}) AS w")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .selectExpr("w", f"{_enc_sql('spark', 'w')} AS enc", "cnt")
        .localCheckpoint()
    )
    surface: dict[int, str] = {}
    merges: list[dict] = []
    for r in range(n_merges):
        top = (
            words.selectExpr(
                f"inline({_pairs_sql('spark', _ids_sql('spark', 'enc'))})",
                "cnt",
            )
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = int(top[0]["a"]), int(top[0]["b"]), int(top[0]["n"])
        new_id = _NEW_BASE + r
        for sid in (a, b):
            if sid < _NEW_BASE and sid not in surface:
                surface[sid] = chr(sid)
        surface[new_id] = surface[a] + surface[b]
        merges.append(
            {
                "rank": r,
                "a_id": a,
                "b_id": b,
                "new_id": new_id,
                "pair_count": n,
                "a_sym": surface[a],
                "b_sym": surface[b],
                "new_sym": surface[new_id],
            }
        )
        words = words.select(
            "w",
            F.expr(
                f"replace(enc, ';{a:0{_W}d};{b:0{_W}d}', "
                f"';{new_id:0{_W}d}') AS enc"
            ),
            "cnt",
        ).localCheckpoint()
    return words, merges


def bpe_train(
    docs: DataFrame, n_merges: int = N_MERGES
) -> tuple[DataFrame, list[dict]]:
    """Learn ``n_merges`` BPE merges from the documents' text.

    Returns (merges_df, merges_list): one row per merge —
    (rank, a_id, b_id, new_id, pair_count, a_sym, b_sym, new_sym)
    where the ``*_sym`` columns are the decoded surface strings."""
    spark = docs.sparkSession
    _, merges = _train_words(docs, n_merges)
    schema = (
        "rank bigint, a_id bigint, b_id bigint, new_id bigint, "
        "pair_count bigint, a_sym string, b_sym string, new_sym string"
    )
    out = spark.createDataFrame(
        [
            (
                m["rank"],
                m["a_id"],
                m["b_id"],
                m["new_id"],
                m["pair_count"],
                m["a_sym"],
                m["b_sym"],
                m["new_sym"],
            )
            for m in merges
        ],
        schema=schema,
    )
    return out, merges


def bpe_query(spark: SparkSession, docs: DataFrame) -> DataFrame:
    df, _ = bpe_train(docs)
    return df.select("rank", "a_id", "b_id", "new_id", "pair_count")


def _oracle_stages(n_merges: int) -> tuple[list[str], list[str]]:
    """The unrolled training pipeline: returns (stages, merge_rows);
    w{n_merges} is the final word table (w, enc, cnt)."""
    d = "duckdb"
    stages = [
        f"w0 AS MATERIALIZED (SELECT w, {_enc_sql(d, 'w')} AS enc, "
        f"cast(count(*) as bigint) AS cnt FROM (SELECT unnest("
        f"{tokens_sql(d)}) AS w FROM documents) GROUP BY w)"
    ]
    merge_rows = []
    for r in range(n_merges):
        ids = _ids_sql(d, "enc")
        stages.append(
            f"p{r} AS MATERIALIZED (SELECT pr.a AS a, pr.b AS b, "
            f"cast(sum(cnt) as bigint) AS n FROM (SELECT "
            f"unnest({_pairs_sql(d, ids)}) AS pr, cnt FROM w{r}) "
            f"GROUP BY 1, 2)"
        )
        stages.append(
            f"m{r} AS MATERIALIZED (SELECT a, b, n FROM p{r} "
            f"ORDER BY n DESC, a, b LIMIT 1)"
        )
        new_tok = f"';{_NEW_BASE + r:0{_W}d}'"
        stages.append(
            f"w{r + 1} AS MATERIALIZED (SELECT w{r}.w, replace(w{r}.enc, "
            f"{_tok(d, 'm.a')} || {_tok(d, 'm.b')}, {new_tok}) AS enc, "
            f"w{r}.cnt FROM w{r}, m{r} m)"
        )
        merge_rows.append(
            f"SELECT cast({r} as bigint) AS rank, a AS a_id, b AS b_id, "
            f"cast({_NEW_BASE + r} as bigint) AS new_id, "
            f"n AS pair_count FROM m{r}"
        )
    return stages, merge_rows


def oracle_bpe(n_merges: int = N_MERGES) -> str:
    stages, merge_rows = _oracle_stages(n_merges)
    return "WITH " + ", ".join(stages) + " " + " UNION ALL ".join(merge_rows)


# ---------------------------------------------------------------------------
# encoding (inference): apply the learned merges to the corpus.
# A single rank-ordered pass of the replace chain is EXACT BPE
# encoding: merged ids are fresh, so a later merge can never create
# an occurrence of an earlier pair (its output symbol did not exist
# when the earlier pair was learned), and replace() already applies
# one merge's occurrences greedily left-to-right. The corpus-side
# cost is a broadcast join against the vocabulary-sized word table —
# the corpus is scanned ONCE and never carries symbol arrays through
# a shuffle.


def _word_key_exprs(dialect: str) -> tuple[str, str]:
    """(n_sym, word_fp) fragments over an encoded word ``enc``:
    symbol count and the rolling hash of the symbol-id list."""
    ids = _ids_sql(dialect, "enc")
    if dialect == "spark":
        n = f"size({ids})"
        fp = (
            f"aggregate({ids}, cast(7 as bigint), "
            f"(acc, x) -> (acc * 31 + x) % {HASH_P})"
        )
    else:
        n = f"len({ids})"
        fp = (
            f"list_reduce(list_prepend(cast(7 as bigint), {ids}), "
            f"(acc, x) -> (acc * 31 + x) % {HASH_P})"
        )
    return f"cast({n} as bigint)", fp


def bpe_encode(
    docs: DataFrame, n_merges: int = N_MERGES
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens, ids_key): per-document BPE
    token count after ``n_merges`` learned merges, plus an exact
    integer sequence key — sum over word positions of
    ((pos+1) * word_fp) % P, order-free to aggregate yet
    position-sensitive."""
    spark = docs.sparkSession
    words, _ = _train_words(docs, n_merges)
    n_sym, fp = _word_key_exprs("spark")
    wk = words.selectExpr("w", f"{n_sym} AS n_sym", f"{fp} AS word_fp")
    tok = docs.selectExpr(
        "doc_id", f"posexplode({tokens_sql('spark')}) AS (pos, w)"
    )
    return (
        tok.join(F.broadcast(wk), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
            F.sum(
                F.expr(f"((pos + 1) * word_fp) % {HASH_P}")
            ).cast("long").alias("ids_key"),
        )
    )


def bpe_encode_query(spark: SparkSession, docs: DataFrame) -> DataFrame:
    return bpe_encode(docs)


def oracle_bpe_encode(n_merges: int = N_MERGES) -> str:
    stages, _ = _oracle_stages(n_merges)
    n_sym, fp = _word_key_exprs("duckdb")
    stages.append(
        f"wk AS MATERIALIZED (SELECT w, {n_sym} AS n_sym, {fp} AS word_fp "
        f"FROM w{n_merges})"
    )
    stages.append(
        "tok AS MATERIALIZED (SELECT doc_id, t.pos AS pos, t.w AS w FROM "
        "(SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1), "
        "k -> struct_pack(pos := k - 1, w := toks[k]))) AS t FROM "
        f"(SELECT doc_id, {tokens_sql('duckdb')} AS toks FROM documents)))"
    )
    return (
        "WITH "
        + ", ".join(stages)
        + " SELECT doc_id, cast(count(*) as bigint) AS n_words, "
        "cast(sum(n_sym) as bigint) AS n_bpe_tokens, "
        f"cast(sum(((pos + 1) * word_fp) % {HASH_P}) as bigint) AS ids_key "
        "FROM tok JOIN wk ON tok.w = wk.w GROUP BY doc_id"
    )
