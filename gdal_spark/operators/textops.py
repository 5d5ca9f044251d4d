"""Text analysis for large-scale training-data pipelines.

Operators over the ``documents`` table (doc_id, text, lang, source,
n_chars): token counting, quality scoring, language-ID heuristic, and
document fingerprinting (rolling polynomial hash). These extend the
reference's scalar-function surface (OGR SQL string ops,
ogr/swq_op_registrar.cpp:44-75 — CONCAT/SUBSTR/LIKE) to the
text-pipeline operations a 100 TB corpus needs.

Scale posture: every operator here is a pure Catalyst expression
(higher-order array functions over ``split`` output) — whole-stage
codegen, zero Python, zero shuffle for the per-document ops; the
corpus-level aggregations are a single map-side-combined groupBy.

Each fragment is emitted for BOTH the Spark and DuckDB dialects so the
driver's oracle runs the semantically identical query; differences are
only function names (size/len, transform/list_transform, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# rolling-hash modulus: largest prime < 1e12 — keeps acc*31+code well
# inside int64 in both engines (no overflow, no bigint promotion)
HASH_P = 999_999_999_989

# tiny per-language stopword lists for the language-ID heuristic
# (n-gram/stopword-hit scoring; predicts argmax, ties broken by the
# fixed language order below)
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ein"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "y", "las", "una"),
    "zh": ("的", "了", "是", "在", "我"),
}
LANG_ORDER = ("en", "de", "fr", "es", "zh")


# ---------------------------------------------------------------------------
# dialect-shared SQL fragments


def tokens_sql(dialect: str, col: str = "text") -> str:
    """Whitespace tokens with empties dropped (split on single space —
    the corpus is single-space delimited; '' entries from runs are
    filtered)."""
    if dialect == "spark":
        return f"filter(split({col}, ' '), t -> t <> '')"
    return f"list_filter(string_split({col}, ' '), t -> t <> '')"


def _size(dialect: str, e: str) -> str:
    return f"size({e})" if dialect == "spark" else f"len({e})"


def _distinct(dialect: str, e: str) -> str:
    return f"array_distinct({e})" if dialect == "spark" else f"list_distinct({e})"


def _transform(dialect: str, e: str, lam: str) -> str:
    fn = "transform" if dialect == "spark" else "list_transform"
    return f"{fn}({e}, {lam})"


def _filter(dialect: str, e: str, lam: str) -> str:
    fn = "filter" if dialect == "spark" else "list_filter"
    return f"{fn}({e}, {lam})"


def char_codes_sql(dialect: str, s: str) -> str:
    """Unicode code points of each character of string expression
    ``s`` (ascii() returns the code point in both engines)."""
    if dialect == "spark":
        return f"transform(split({s}, ''), c -> cast(ascii(c) as bigint))"
    return f"list_transform(string_split({s}, ''), c -> cast(ascii(c) as bigint))"


def fold_hash_sql(dialect: str, codes: str) -> str:
    """Polynomial rolling hash: acc = (acc*31 + code) % P, acc0 = 7.
    Deterministic, order-dependent — the document fingerprint."""
    if dialect == "spark":
        return f"aggregate({codes}, cast(7 as bigint), (acc, x) -> (acc * 31 + x) % {HASH_P})"
    return (
        f"list_reduce(list_prepend(cast(7 as bigint), {codes}), "
        f"(acc, x) -> (acc * 31 + x) % {HASH_P})"
    )


def str_hash_sql(dialect: str, s: str) -> str:
    """Rolling hash of a string expression."""
    return fold_hash_sql(dialect, char_codes_sql(dialect, s))


def token_hashes_sql(dialect: str, toks: str) -> str:
    """Per-token rolling hashes (nested higher-order lambda)."""
    return _transform(dialect, toks, f"t -> {str_hash_sql(dialect, 't')}")


def _in_list(vals: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


def stop_hits_sql(dialect: str, toks: str, words: tuple[str, ...]) -> str:
    return _size(dialect, _filter(dialect, toks, f"t -> t IN ({_in_list(words)})"))


def profile_select_sql(dialect: str) -> list[str]:
    """SELECT-list fragments for text_profile; expects a ``toks``
    column in scope."""
    d = dialect
    n_tok = _size(d, "toks")
    n_typ = _size(d, _distinct(d, "toks"))
    tot_len = (
        f"aggregate({_transform(d, 'toks', 't -> cast(length(t) as bigint)')}, "
        f"cast(0 as bigint), (acc, x) -> acc + x)"
        if d == "spark"
        else f"cast(list_sum({_transform(d, 'toks', 't -> cast(length(t) as bigint)')}) as bigint)"
    )
    max_len = (
        f"array_max({_transform(d, 'toks', 't -> length(t)')})"
        if d == "spark"
        else f"list_max({_transform(d, 'toks', 't -> length(t)')})"
    )
    fp = str_hash_sql(d, "text")
    min_th = (
        f"array_min({token_hashes_sql(d, 'toks')})"
        if d == "spark"
        else f"list_min({token_hashes_sql(d, 'toks')})"
    )
    return [
        f"cast({n_tok} as bigint) AS n_tokens",
        f"cast({n_typ} as bigint) AS n_types",
        f"{tot_len} AS total_token_len",
        f"cast({max_len} as bigint) AS max_token_len",
        f"{fp} AS text_fp",
        f"{min_th} AS min_token_hash",
    ]


def quality_select_sql(dialect: str) -> list[str]:
    """Quality-score fragments: stopword ratio, type-token ratio, and a
    combined [0,1000] score. All ratios are integer-scaled via floor so
    both engines hash-match bit-for-bit; the double intermediates are
    single correctly-rounded IEEE ops (identical cross-engine)."""
    d = dialect
    n_tok = f"cast({_size(d, 'toks')} as bigint)"
    n_typ = f"cast({_size(d, _distinct(d, 'toks'))} as bigint)"
    stop = stop_hits_sql(d, "toks", LANG_STOPWORDS["en"])
    ttr = f"(cast({n_typ} as double) / cast({n_tok} as double))"
    stop_r = f"(cast({stop} as double) / cast({n_tok} as double))"
    len_term = f"least(1.0E0, cast({n_tok} as double) / 64.0E0)"
    score = f"(400.0E0 * {len_term} + 400.0E0 * {ttr} + 200.0E0 * {stop_r})"
    return [
        f"{n_tok} AS n_tokens",
        f"cast({stop} as bigint) AS stop_hits",
        f"cast(floor(1000000.0E0 * {ttr}) as bigint) AS ttr_key",
        f"cast(floor(1000000.0E0 * {stop_r}) as bigint) AS stop_ratio_key",
        f"cast(floor({score}) as bigint) AS quality_key",
    ]


def lang_scores_sql(dialect: str) -> list[str]:
    return [
        f"cast({stop_hits_sql(dialect, 'toks', LANG_STOPWORDS[lg])} as bigint) "
        f"AS score_{lg}"
        for lg in LANG_ORDER
    ]


def lang_pred_sql() -> str:
    """argmax over score columns, ties to the earlier language in
    LANG_ORDER (dialect-neutral CASE chain)."""
    best = f"greatest({', '.join('score_' + lg for lg in LANG_ORDER)})"
    cases = " ".join(
        f"WHEN score_{lg} = best THEN '{lg}'" for lg in LANG_ORDER
    )
    return f"(CASE {cases} END)", best, cases


# ---------------------------------------------------------------------------
# DataFrame operators (Spark side)


def _with_tokens(docs: DataFrame) -> DataFrame:
    return docs.withColumn("toks", F.expr(tokens_sql("spark")))


def text_profile(docs: DataFrame) -> DataFrame:
    """Per-document token counts + rolling-hash fingerprint — pure
    Catalyst expressions (whole-stage codegen, no UDF, no shuffle)."""
    return _with_tokens(docs).selectExpr("doc_id", *profile_select_sql("spark"))


def quality_score(docs: DataFrame) -> DataFrame:
    """Per-document quality features + combined score."""
    return _with_tokens(docs).selectExpr("doc_id", *quality_select_sql("spark"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language-ID heuristic: per-language scores + argmax
    prediction (ties resolved by LANG_ORDER)."""
    scored = _with_tokens(docs).selectExpr(
        "doc_id", "lang", *lang_scores_sql("spark")
    )
    pred, best, _ = lang_pred_sql()
    return scored.withColumn("best", F.expr(best)).selectExpr(
        "doc_id",
        "lang",
        *(f"score_{lg}" for lg in LANG_ORDER),
        f"{pred} AS pred_lang",
    )


def token_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus-level token frequencies, top-k by document frequency —
    explode + map-side-combined groupBy (the classic word count)."""
    toks = _with_tokens(docs).select(
        "doc_id", F.explode("toks").alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_total"),
        )
        .orderBy(F.desc("n_total"), "token")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# oracle SQL builders (DuckDB dialect; `documents` is a pre-registered view)


def oracle_text_profile() -> str:
    return (
        f"WITH t AS (SELECT doc_id, text, {tokens_sql('duckdb')} AS toks "
        f"FROM documents) "
        f"SELECT doc_id, {', '.join(profile_select_sql('duckdb'))} FROM t"
    )


def oracle_quality_score() -> str:
    return (
        f"WITH t AS (SELECT doc_id, {tokens_sql('duckdb')} AS toks "
        f"FROM documents) "
        f"SELECT doc_id, {', '.join(quality_select_sql('duckdb'))} FROM t"
    )


def oracle_lang_id() -> str:
    scores = ", ".join(lang_scores_sql("duckdb"))
    pred, best, _ = lang_pred_sql()
    return (
        f"WITH t AS (SELECT doc_id, lang, {tokens_sql('duckdb')} AS toks "
        f"FROM documents), "
        f"s AS (SELECT doc_id, lang, {scores} FROM t), "
        f"b AS (SELECT *, {best} AS best FROM s) "
        f"SELECT doc_id, lang, "
        + ", ".join(f"score_{lg}" for lg in LANG_ORDER)
        + f", {pred} AS pred_lang FROM b"
    )


def oracle_token_topk(k: int = 50) -> str:
    return (
        f"WITH t AS (SELECT doc_id, unnest({tokens_sql('duckdb')}) AS token "
        f"FROM documents) "
        f"SELECT token, count(DISTINCT doc_id) AS n_docs, count(*) AS n_total "
        f"FROM t GROUP BY token ORDER BY n_total DESC, token LIMIT {k}"
    )
