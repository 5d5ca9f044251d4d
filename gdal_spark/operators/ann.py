"""Similarity search over embedding columns (array<float>).

Three stages over the ``embeddings`` table (vec_id, embedding
float[64], label):

- **cosine_topk** — exact brute-force top-k per query vector. The
  correctness baseline; O(Q x N) with Q small (broadcast the query
  side).
- **ann_lsh_topk** — the scale path: random-hyperplane LSH with T
  hash tables of P planes each (sign-bit buckets); candidates =
  bucket collisions in any table, re-ranked exactly. At 10^12 rows
  the bucket join replaces the full cross product; T/P tune the
  recall/cost trade-off.
- **embedding_neardup** — near-duplicate pairs above a cosine
  threshold (pairwise here; the LSH bucket join is the scale path).

Numeric contract: embeddings are scaled to integers (floor(x*1e6)) so
every dot product is integer-exact and order-independent; the final
cosine is a fixed sequence of correctly-rounded IEEE double ops, so
Spark and the DuckDB oracle agree bit-for-bit on the floor-scaled
``cos_key``. Everything is Catalyst array expressions + joins — no
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SCALE = 1_000_000
N_QUERIES = 32
LSH_TABLES = 8
LSH_PLANES = 4
DIM = 64


def scaled_vec_sql(dialect: str, col: str = "embedding") -> str:
    lam = "x -> cast(floor(cast(x as double) * 1000000.0E0) as bigint)"
    fn = "transform" if dialect == "spark" else "list_transform"
    return f"{fn}({col}, {lam})"


def dot_sql(dialect: str, a: str, b: str) -> str:
    """Integer dot product of two scaled bigint vectors."""
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            f"cast(0 as bigint), (acc, x) -> acc + x)"
        )
    return f"cast(list_dot_product({a}, {b}) as bigint)"


def cos_key_sql() -> str:
    """floor(1e6 * dot / (|a| |b|)) — dialect-neutral; expects dot,
    na, nb (self-dots) in scope."""
    return (
        "cast(floor(1000000.0E0 * cast(dot as double) / "
        "(sqrt(cast(na as double)) * sqrt(cast(nb as double)))) as bigint)"
    )


def _vectors(emb: DataFrame) -> DataFrame:
    """(vec_id, vs, norm2): scaled int vector + self-dot."""
    return emb.selectExpr(
        "vec_id", f"{scaled_vec_sql('spark')} AS vs"
    ).selectExpr("vec_id", "vs", f"{dot_sql('spark', 'vs', 'vs')} AS norm2")


def _vectors_cte() -> str:
    vs = scaled_vec_sql("duckdb")
    return (
        f"SELECT vec_id, vs, {dot_sql('duckdb', 'vs', 'vs')} AS na FROM "
        f"(SELECT vec_id, {vs} AS vs FROM embeddings)"
    )


# ---------------------------------------------------------------------------
# exact brute-force top-k


def cosine_topk(
    emb: DataFrame, k: int = 5, n_queries: int = N_QUERIES
) -> DataFrame:
    """Exact cosine top-k: (qid, rank, vec_id, cos_key). Query side is
    tiny -> broadcast; ranking via window row_number with vec_id
    tie-break."""
    v = _vectors(emb)
    q = v.filter(F.col("vec_id") < n_queries).selectExpr(
        "vec_id AS qid", "vs AS qv", "norm2 AS na"
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .selectExpr(
            "qid", "vec_id", "na", "norm2 AS nb",
            f"{dot_sql('spark', 'qv', 'vs')} AS dot",
        )
        .selectExpr("qid", "vec_id", f"{cos_key_sql()} AS cos_key")
    )
    win = Window.partitionBy("qid").orderBy(F.desc("cos_key"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cos_key")
    )


def oracle_cosine_topk(k: int = 5, n_queries: int = N_QUERIES) -> str:
    return (
        f"WITH v AS ({_vectors_cte()}), "
        f"scored AS (SELECT q.vec_id AS qid, c.vec_id, q.na AS na, c.na AS nb, "
        f"{dot_sql('duckdb', 'q.vs', 'c.vs')} AS dot "
        f"FROM v q JOIN v c ON q.vec_id < {n_queries} AND c.vec_id <> q.vec_id), "
        f"keyed AS (SELECT qid, vec_id, {cos_key_sql()} AS cos_key, "
        f"row_number() OVER (PARTITION BY qid ORDER BY {cos_key_sql()} DESC, "
        f"vec_id) AS rank FROM scored) "
        f"SELECT qid, cast(rank as int) AS rank, vec_id, cos_key "
        f"FROM keyed WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the 100 TB path)


def _plane_sign_sql() -> str:
    """Deterministic pseudo-random +/-1 for (table t, plane j, dim d):
    quadratic-residue mixing, integer-exact in both engines."""
    m = "((t * 1009 + j * 101 + d * 13) % 509)"
    return f"(CASE WHEN (({m} * {m}) % 127) % 2 = 0 THEN 1 ELSE -1 END)"


def lsh_buckets(emb: DataFrame, tables: int = LSH_TABLES, planes: int = LSH_PLANES) -> DataFrame:
    """(vec_id, t, bucket): sign-bit bucket of each vector in each
    hash table. Explode over (table, plane, dim), two tree
    aggregations — all map-side combinable."""
    v = _vectors(emb).selectExpr("vec_id", "vs")
    # fan out over (table, plane) with explode(sequence(...)): map-only
    # (no join nodes at all), unlike a crossJoin which compiles to
    # BroadcastNestedLoopJoin. The per-plane dot against the sign
    # pattern is a zip_with fold, NOT a per-dim explode + element_at:
    # Catalyst inlines the vs projection into consumers and CSE does
    # not reach inside lambdas, so element_at per exploded dim row
    # re-evaluated the whole scaled-vector transform DIM times per
    # term (and the dim explode itself was a 64x row fan-out feeding
    # an extra shuffle).
    sign = _plane_sign_sql()
    terms = (
        v.selectExpr(
            "vec_id", "vs",
            f"explode(sequence(0, {tables * planes - 1})) AS tp",
        )
        .selectExpr(
            "vec_id", "vs",
            f"cast(tp div {planes} as bigint) AS t",
            f"cast(tp % {planes} as bigint) AS j",
        )
        .selectExpr(
            "vec_id", "t", "j",
            f"aggregate(zip_with(vs, "
            f"transform(sequence(0, {DIM - 1}), d -> {sign}), "
            f"(x, s) -> x * s), cast(0 as bigint), (acc, x) -> acc + x) "
            f"AS tsum",
        )
    )
    bits = terms.selectExpr(
        "vec_id", "t", "j", "cast(tsum >= 0 as bigint) AS bit"
    )
    return bits.groupBy("vec_id", "t").agg(
        F.expr("sum(shiftleft(bit, cast(j as int))) AS bucket")
    )


def ann_lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = N_QUERIES,
    tables: int = LSH_TABLES,
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Approximate top-k: candidates from bucket collisions (any
    table), exact re-rank. Same schema as cosine_topk; recall vs the
    exact path is asserted in tests."""
    b = lsh_buckets(emb, tables, planes)
    qb = b.filter(F.col("vec_id") < n_queries).selectExpr(
        "vec_id AS qid", "t", "bucket"
    )
    cand = (
        b.join(F.broadcast(qb), ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    v = _vectors(emb)
    q = v.selectExpr("vec_id AS qid", "vs AS qv", "norm2 AS na")
    scored = (
        cand.join(F.broadcast(q), "qid")
        .join(v, "vec_id")
        .selectExpr(
            "qid", "vec_id", "na", "norm2 AS nb",
            f"{dot_sql('spark', 'qv', 'vs')} AS dot",
        )
        .selectExpr("qid", "vec_id", f"{cos_key_sql()} AS cos_key")
    )
    win = Window.partitionBy("qid").orderBy(F.desc("cos_key"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cos_key")
    )


def oracle_ann_lsh_topk(
    k: int = 5,
    n_queries: int = N_QUERIES,
    tables: int = LSH_TABLES,
    planes: int = LSH_PLANES,
) -> str:
    sign = _plane_sign_sql()
    return (
        f"WITH v AS ({_vectors_cte()}), "
        f"terms AS (SELECT vec_id, t, j, vs[cast(d + 1 as int)] * {sign} AS term "
        f"FROM v, range(0, {tables}) tt(t), range(0, {planes}) tj(j), "
        f"range(0, {DIM}) td(d)), "
        f"bits AS (SELECT vec_id, t, j, cast(sum(term) >= 0 as bigint) AS bit "
        f"FROM terms GROUP BY 1, 2, 3), "
        f"buckets AS (SELECT vec_id, t, cast(sum(bit << cast(j as int)) as bigint) "
        f"AS bucket FROM bits GROUP BY 1, 2), "
        f"cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id FROM buckets q "
        f"JOIN buckets c ON q.t = c.t AND q.bucket = c.bucket "
        f"AND q.vec_id < {n_queries} AND c.vec_id <> q.vec_id), "
        f"scored AS (SELECT cand.qid, cand.vec_id, q.na AS na, c.na AS nb, "
        f"{dot_sql('duckdb', 'q.vs', 'c.vs')} AS dot "
        f"FROM cand JOIN v q ON q.vec_id = cand.qid "
        f"JOIN v c ON c.vec_id = cand.vec_id), "
        f"keyed AS (SELECT qid, vec_id, {cos_key_sql()} AS cos_key, "
        f"row_number() OVER (PARTITION BY qid ORDER BY {cos_key_sql()} DESC, "
        f"vec_id) AS rank FROM scored) "
        f"SELECT qid, cast(rank as int) AS rank, vec_id, cos_key "
        f"FROM keyed WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probed clusters
#
# The centroid arithmetic is kept integer-exact so the oracle can
# replay it: vectors are scaled to ints at IVF_SCALE; a centroid is
# represented as (component sums S, count n); the distance comparison
# ||v - S/n||^2 is evaluated as ||n*v - S||^2 (scaled by n^2, order-
# free integer arithmetic). Lloyd iterations are fixed (IVF_ITERS)
# with deterministic init (the first K vectors by vec_id) — fully
# deterministic, no RNG, reproducible in SQL.

IVF_SCALE = 10_000
IVF_K = 8
IVF_ITERS = 2
IVF_PROBES = 2


def ivf_scaled_sql(dialect: str, col: str = "embedding") -> str:
    lam = f"x -> cast(floor(cast(x as double) * {IVF_SCALE}.0E0) as bigint)"
    fn = "transform" if dialect == "spark" else "list_transform"
    return f"{fn}({col}, {lam})"


def _sqdist_num_sql(dialect: str, v: str, s: str, n: str, dim: int = DIM) -> str:
    """Integer numerator ||n*v - S||^2 — an order-free integer fold.
    Within one cluster (shared S, n) it orders identically to the true
    squared distance, so within-cluster comparisons stay pure-integer."""
    if dialect == "spark":
        return (
            f"aggregate(zip_with({v}, {s}, (x, y) -> ({n} * x - y) * ({n} * x - y)), "
            f"cast(0 as bigint), (acc, x) -> acc + x)"
        )
    return (
        f"cast(list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> ({n} * {v}[i] - {s}[i]) * ({n} * {v}[i] - {s}[i]))) as bigint)"
    )


def _sqdist_scaled_sql(dialect: str, v: str, s: str, n: str, dim: int = DIM) -> str:
    """||v - S/n||^2 = ||n*v - S||^2 / n^2: the numerator is an
    order-free integer fold; the single final division is a
    correctly-rounded double op, identical cross-engine (comparable
    across clusters of different sizes)."""
    num = _sqdist_num_sql(dialect, v, s, n, dim)
    return f"(cast({num} as double) / (cast({n} as double) * cast({n} as double)))"


def _vec_sum_sql(dialect: str, col: str, dim: int = DIM) -> str:
    """Element-wise sum aggregate of array columns (``dim`` wide —
    zip_with pads the SHORTER side with nulls, so a wrong width
    silently nulls the whole fold)."""
    if dialect == "spark":
        return (
            f"aggregate(collect_list({col}), "
            f"transform(sequence(1, {dim}), d -> cast(0 as bigint)), "
            f"(acc, v) -> zip_with(acc, v, (a, b) -> a + b))"
        )
    raise NotImplementedError


def ivf_assignments(
    emb: DataFrame, n_clusters: int = IVF_K, iters: int = IVF_ITERS
):
    """Run the fixed Lloyd iterations; returns (vectors_df with
    cluster col, centroids_df (cid, s (array), n)). ``n_clusters`` /
    ``iters`` are run-scale knobs (module defaults match the oracle;
    a 100x corpus passes bigger values here without code edits)."""
    v = emb.selectExpr("vec_id", f"{ivf_scaled_sql('spark')} AS vs")
    cents = (
        v.filter(F.col("vec_id") < n_clusters)
        .selectExpr("vec_id AS cid", "vs AS s", "cast(1 as bigint) AS n")
    )
    for _ in range(iters):
        scored = v.crossJoin(F.broadcast(cents)).selectExpr(
            "vec_id", "vs", "cid",
            f"{_sqdist_scaled_sql('spark', 'vs', 's', 'n')} AS d",
        )
        win = Window.partitionBy("vec_id").orderBy("d", "cid")
        assigned = (
            scored.withColumn("rk", F.row_number().over(win))
            .filter("rk = 1")
            .select("vec_id", "vs", "cid")
        )
        # truncate lineage per Lloyd round: each iteration's centroid
        # table is tiny (K rows) but otherwise re-embeds the whole
        # previous round's plan into the next broadcast
        cents = assigned.groupBy("cid").agg(
            F.expr(_vec_sum_sql("spark", "vs")).alias("s"),
            F.count("*").alias("n"),
        ).localCheckpoint(eager=True)
    return assigned, cents


def ann_ivf_topk(
    emb: DataFrame, k: int = 5, n_queries: int = N_QUERIES,
    probes: int = IVF_PROBES, n_clusters: int = IVF_K,
    iters: int = IVF_ITERS,
) -> DataFrame:
    """IVF ANN: assign vectors to k-means clusters, probe each
    query's ``probes`` nearest centroids, exact cosine re-rank within
    the probed clusters. Same schema as cosine_topk."""
    assigned, cents = ivf_assignments(emb, n_clusters, iters)
    q = assigned.filter(F.col("vec_id") < n_queries).selectExpr(
        "vec_id AS qid", "vs AS qv"
    )
    qscored = q.crossJoin(F.broadcast(cents)).selectExpr(
        "qid", "cid", f"{_sqdist_scaled_sql('spark', 'qv', 's', 'n')} AS d"
    )
    win = Window.partitionBy("qid").orderBy("d", "cid")
    probe = (
        qscored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= probes)
        .select("qid", "cid")
    )
    cand = (
        probe.join(assigned.select("vec_id", "cid"), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    v = _vectors(emb)
    qv = v.selectExpr("vec_id AS qid", "vs AS qv", "norm2 AS na")
    scored = (
        cand.join(F.broadcast(qv), "qid")
        .join(v, "vec_id")
        .selectExpr(
            "qid", "vec_id", "na", "norm2 AS nb",
            f"{dot_sql('spark', 'qv', 'vs')} AS dot",
        )
        .selectExpr("qid", "vec_id", f"{cos_key_sql()} AS cos_key")
    )
    rwin = Window.partitionBy("qid").orderBy(F.desc("cos_key"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(rwin))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cos_key")
    )


def _oracle_ivf_ctes(
    n_clusters: int = IVF_K, iters: int = IVF_ITERS
) -> tuple[list[str], str, str]:
    """DuckDB CTE chain replaying ivf_assignments; returns
    (ctes, final_assignment_cte, final_centroid_cte)."""
    vs = ivf_scaled_sql("duckdb")
    d = _sqdist_scaled_sql("duckdb", "v.vs", "c.s", "c.n")
    ctes = [
        f"v AS (SELECT vec_id, {vs} AS vs FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, vs AS s, cast(1 as bigint) AS n "
        f"FROM v WHERE vec_id < {n_clusters})",
    ]
    prev = "c0"
    for it in range(iters):
        a, c = f"a{it}", f"c{it + 1}"
        ctes.append(
            f"{a} AS (SELECT vec_id, vs, cid FROM ("
            f"SELECT v.vec_id, v.vs, c.cid, "
            f"row_number() OVER (PARTITION BY v.vec_id ORDER BY {d}, c.cid) AS rk "
            f"FROM v, {prev} c) WHERE rk = 1)"
        )
        # element-wise integer sum of assigned vectors per cluster
        # (count per (cid, dim) group == member count)
        ctes.append(
            f"{c} AS (SELECT cid, list(sv ORDER BY dim) AS s, "
            f"any_value(nn) AS n FROM ("
            f"SELECT cid, dim, cast(sum(vs[dim]) as bigint) AS sv, "
            f"count(*) AS nn "
            f"FROM {a}, range(1, {DIM} + 1) t(dim) GROUP BY cid, dim) "
            f"GROUP BY cid)"
        )
        prev = c
    return ctes, f"a{iters - 1}", f"c{iters}"


def oracle_ann_ivf_topk(
    k: int = 5, n_queries: int = N_QUERIES, probes: int = IVF_PROBES
) -> str:
    qd = _sqdist_scaled_sql("duckdb", "q.vs", "c.s", "c.n")
    ctes, final_a, final_c = _oracle_ivf_ctes()
    ctes.append(
        f"probe AS (SELECT qid, cid FROM ("
        f"SELECT q.vec_id AS qid, c.cid, "
        f"row_number() OVER (PARTITION BY q.vec_id ORDER BY {qd}, c.cid) AS rk "
        f"FROM v q, {final_c} c WHERE q.vec_id < {n_queries}) WHERE rk <= {probes})"
    )
    ctes.append(
        f"cand AS (SELECT DISTINCT probe.qid, a.vec_id "
        f"FROM probe JOIN {final_a} a ON a.cid = probe.cid "
        f"AND a.vec_id <> probe.qid)"
    )
    ctes.append(
        f"vv AS ({_vectors_cte()})"
    )
    ctes.append(
        f"scored AS (SELECT cand.qid, cand.vec_id, q.na AS na, c2.na AS nb, "
        f"{dot_sql('duckdb', 'q.vs', 'c2.vs')} AS dot FROM cand "
        f"JOIN vv q ON q.vec_id = cand.qid JOIN vv c2 ON c2.vec_id = cand.vec_id)"
    )
    ctes.append(
        f"keyed AS (SELECT qid, vec_id, {cos_key_sql()} AS cos_key, "
        f"row_number() OVER (PARTITION BY qid ORDER BY {cos_key_sql()} DESC, "
        f"vec_id) AS rank FROM scored)"
    )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT qid, cast(rank as int) AS rank, vec_id, cos_key "
        f"FROM keyed WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# cosine near-duplicate pairs


def embedding_neardup(
    emb: DataFrame,
    min_cos_ppm: int = 350_000,
    tables: int = LSH_TABLES,
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Near-duplicate pairs with cosine >= threshold:
    (vec_a, vec_b, cos_key). Candidate pairs come from LSH bucket
    collisions (same (table, bucket) in any of the ``tables`` hash
    tables) — a self-equi-join on the bucket key, never an all-pairs
    cross join — then an exact cosine verify. Recall < 1 by LSH design
    (~0.7 at the default threshold, recall-tested); the oracle replays
    the identical bucket assignment, so the contract is deterministic.
    """
    b = lsh_buckets(emb, tables, planes)
    l = b.selectExpr("vec_id AS vec_a", "t", "bucket")
    r = b.selectExpr("vec_id AS vec_b", "t", "bucket")
    cand = (
        l.join(r, ["t", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    v = _vectors(emb)
    va = v.selectExpr("vec_id AS vec_a", "vs AS va", "norm2 AS na")
    vb = v.selectExpr("vec_id AS vec_b", "vs AS vb", "norm2 AS nb")
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .selectExpr(
            "vec_a", "vec_b", "na", "nb",
            f"{dot_sql('spark', 'va', 'vb')} AS dot",
        )
        .selectExpr("vec_a", "vec_b", f"{cos_key_sql()} AS cos_key")
        .filter(F.col("cos_key") >= min_cos_ppm)
    )


def embedding_neardup_exact(emb: DataFrame, min_cos_ppm: int = 350_000) -> DataFrame:
    """Exhaustive all-pairs variant (recall baseline for tests —
    O(n^2), never the scale path)."""
    v = _vectors(emb)
    a = v.selectExpr("vec_id AS vec_a", "vs AS va", "norm2 AS na")
    b = v.selectExpr("vec_id AS vec_b", "vs AS vb", "norm2 AS nb")
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .selectExpr(
            "vec_a", "vec_b", "na", "nb",
            f"{dot_sql('spark', 'va', 'vb')} AS dot",
        )
        .selectExpr("vec_a", "vec_b", f"{cos_key_sql()} AS cos_key")
        .filter(F.col("cos_key") >= min_cos_ppm)
    )


def oracle_embedding_neardup_exact(min_cos_ppm: int = 350_000) -> str:
    """All-pairs cosine >= threshold (mirrors embedding_neardup_exact
    — the default small-scale semantics; the _lsh variant is the
    recall<1 scale path, named so the tradeoff is visible)."""
    return (
        f"WITH v AS ({_vectors_cte()}), "
        f"scored AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
        f"a.na AS na, b.na AS nb, {dot_sql('duckdb', 'a.vs', 'b.vs')} AS dot "
        f"FROM v a JOIN v b ON a.vec_id < b.vec_id) "
        f"SELECT vec_a, vec_b, {cos_key_sql()} AS cos_key FROM scored "
        f"WHERE {cos_key_sql()} >= {min_cos_ppm}"
    )


def oracle_embedding_neardup(
    min_cos_ppm: int = 350_000,
    tables: int = LSH_TABLES,
    planes: int = LSH_PLANES,
) -> str:
    """Replays the LSH-bucketed candidate generation + exact verify."""
    sign = _plane_sign_sql()
    return (
        f"WITH v AS ({_vectors_cte()}), "
        f"terms AS (SELECT vec_id, t, j, vs[cast(d + 1 as int)] * {sign} AS term "
        f"FROM v, range(0, {tables}) tt(t), range(0, {planes}) tj(j), "
        f"range(0, {DIM}) td(d)), "
        f"bits AS (SELECT vec_id, t, j, cast(sum(term) >= 0 as bigint) AS bit "
        f"FROM terms GROUP BY 1, 2, 3), "
        f"buckets AS (SELECT vec_id, t, cast(sum(bit << cast(j as int)) as bigint) "
        f"AS bucket FROM bits GROUP BY 1, 2), "
        f"cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b "
        f"FROM buckets a JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket "
        f"AND a.vec_id < b.vec_id), "
        f"scored AS (SELECT cand.vec_a, cand.vec_b, "
        f"a.na AS na, b.na AS nb, {dot_sql('duckdb', 'a.vs', 'b.vs')} AS dot "
        f"FROM cand JOIN v a ON a.vec_id = cand.vec_a "
        f"JOIN v b ON b.vec_id = cand.vec_b) "
        f"SELECT vec_a, vec_b, {cos_key_sql()} AS cos_key FROM scored "
        f"WHERE {cos_key_sql()} >= {min_cos_ppm}"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — the compressed 100 TB path
#
# Jegou, Douze, Schmid (2011), "Product Quantization for Nearest
# Neighbor Search": split each vector into M subvectors, k-means each
# subspace into K centroids, store vectors as M one-byte codes, and
# rank candidates with an asymmetric-distance (ADC) lookup table —
# the query stays exact, candidates are reconstructed from the
# codebooks. A 64-dim float vector becomes 4 codes: 64x compression,
# which is what makes a 10^12-vector index fit a cluster at all.
#
# Numeric contract: subvector k-means runs on floor-scaled integers
# with the exact-rational centroid trick above, then codebook
# centroids are ROUNDED to integers (floor(S_d / n) — faithful to PQ,
# which stores quantized codebooks). From there every distance
# (encode-time vector-to-centroid, query-time ADC) is an exact
# integer sum, so the oracle replays bit-for-bit with no epsilon.

PQ_M = 8        # subspaces (production: 8-16 with K=256 codebooks;
PQ_SUB = DIM // PQ_M   # kept at K=16 here so the oracle's Lloyd
PQ_K = 16              # replay stays cheap at sf0.01)
PQ_ITERS = 2


def _pq_subvectors(emb: DataFrame, m_sub: int = PQ_M) -> DataFrame:
    """(vec_id, m, sv[DIM/m_sub]) — floor-scaled integer subvectors."""
    sub = DIM // m_sub
    v = emb.selectExpr("vec_id", f"{ivf_scaled_sql('spark')} AS vs")
    return v.selectExpr(
        "vec_id", f"explode(sequence(0, {m_sub - 1})) AS m", "vs"
    ).selectExpr("vec_id", "m", f"slice(vs, m * {sub} + 1, {sub}) AS sv")


def _pq_d2_sql(dialect: str, a: str, b: str, dim: int = 0) -> str:
    """Exact integer squared L2 between two bigint vectors."""
    d = dim or PQ_SUB
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
            f"cast(0 as bigint), (acc, x) -> acc + x)"
        )
    return (
        f"cast(list_sum(list_transform(range(1, {d} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) as bigint)"
    )


def _pq_lloyd(
    sv: DataFrame, n_codes: int = PQ_K, iters: int = PQ_ITERS,
    sub: int = PQ_SUB,
) -> DataFrame:
    """Fixed Lloyd rounds over an (vec_id, m, sv) subvector table;
    returns integer codebooks (m, cid, c[sub]). Seeded from the
    first ``n_codes`` vec_ids — deterministic, shared with the
    oracle at the module defaults; production scales pass K=256."""
    cents = sv.filter(F.col("vec_id") < n_codes).selectExpr(
        "m", "vec_id AS cid", "sv AS s", "cast(1 as bigint) AS n"
    )
    for _ in range(iters):
        scored = sv.join(F.broadcast(cents), "m").selectExpr(
            "vec_id", "m", "sv", "cid",
            f"{_sqdist_scaled_sql('spark', 'sv', 's', 'n', sub)} AS d",
        )
        win = Window.partitionBy("vec_id", "m").orderBy("d", "cid")
        assigned = (
            scored.withColumn("rk", F.row_number().over(win))
            .filter("rk = 1")
            .select("vec_id", "m", "sv", "cid")
        )
        cents = assigned.groupBy("m", "cid").agg(
            F.expr(_vec_sum_sql("spark", "sv", sub)).alias("s"),
            F.count("*").alias("n"),
        ).localCheckpoint(eager=True)
    return cents.selectExpr(
        "m", "cid",
        "transform(s, x -> cast(floor(cast(x as double) / n) as bigint)) AS c",
    )


def pq_codebooks(
    emb: DataFrame, n_codes: int = PQ_K, iters: int = PQ_ITERS,
    m_sub: int = PQ_M,
):
    """Train per-subspace codebooks; returns (subvectors_df,
    codebooks_df (m, cid, c[DIM/m_sub] integer centroid))."""
    sv = _pq_subvectors(emb, m_sub).localCheckpoint(eager=True)
    return sv, _pq_lloyd(sv, n_codes, iters, DIM // m_sub)


def pq_codes(sv: DataFrame, cb: DataFrame) -> DataFrame:
    """Encode: (vec_id, m, code) — argmin centroid per subspace.
    Map-only against the broadcast codebooks (the plan that encodes
    10^12 vectors without a shuffle)."""
    scored = sv.join(F.broadcast(cb), "m").selectExpr(
        "vec_id", "m", "cid", f"{_pq_d2_sql('spark', 'sv', 'c')} AS d"
    )
    win = Window.partitionBy("vec_id", "m").orderBy("d", "cid")
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter("rk = 1")
        .selectExpr("vec_id", "m", "cid AS code")
    )


def pq_topk(
    emb: DataFrame, k: int = 5, n_queries: int = N_QUERIES,
    n_codes: int = PQ_K, iters: int = PQ_ITERS, m_sub: int = PQ_M,
) -> DataFrame:
    """PQ-ADC top-k: (qid, rank, vec_id, adc) with adc the exact
    integer asymmetric distance. Query subvectors stay exact; the
    per-query lookup table (n_queries x PQ_M x PQ_K rows) broadcasts,
    codes join it map-side, and the only shuffle is the partial-agg
    sum over M=4 rows per (qid, vec_id)."""
    sv, cb = pq_codebooks(emb, n_codes, iters, m_sub)
    codes = pq_codes(sv, cb)
    q = sv.filter(F.col("vec_id") < n_queries).selectExpr(
        "vec_id AS qid", "m", "sv AS qsv"
    )
    lut = q.join(cb, "m").selectExpr(
        "qid", "m", "cid AS code", f"{_pq_d2_sql('spark', 'qsv', 'c')} AS d"
    )
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("d").alias("adc"))
    )
    win = Window.partitionBy("qid").orderBy("adc", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "adc")
    )


def oracle_pq_topk(k: int = 5, n_queries: int = N_QUERIES) -> str:
    """Replays training (materialized Lloyd CTE stages per CLAUDE.md's
    DuckDB-inlining rule), rounded codebooks, encoding and ADC."""
    vs = ivf_scaled_sql("duckdb")
    sub = (
        f"list_transform(range(1, {PQ_SUB} + 1), "
        f"i -> vs[m * {PQ_SUB} + i])"
    )
    d_rat = _sqdist_scaled_sql("duckdb", "s2.sv", "c.s", "c.n", PQ_SUB)
    ctes = [
        f"v AS MATERIALIZED (SELECT vec_id, {vs} AS vs FROM embeddings)",
        f"sv AS MATERIALIZED (SELECT vec_id, m, {sub} AS sv "
        f"FROM v, range(0, {PQ_M}) mm(m))",
        f"c0 AS MATERIALIZED (SELECT m, vec_id AS cid, sv AS s, "
        f"cast(1 as bigint) AS n FROM sv WHERE vec_id < {PQ_K})",
    ]
    prev = "c0"
    for it in range(PQ_ITERS):
        a, c = f"a{it}", f"c{it + 1}"
        ctes.append(
            f"{a} AS MATERIALIZED (SELECT vec_id, m, sv, cid FROM ("
            f"SELECT s2.vec_id, s2.m, s2.sv, c.cid, "
            f"row_number() OVER (PARTITION BY s2.vec_id, s2.m "
            f"ORDER BY {d_rat}, c.cid) AS rk "
            f"FROM sv s2 JOIN {prev} c ON c.m = s2.m) WHERE rk = 1)"
        )
        ctes.append(
            f"{c} AS MATERIALIZED (SELECT m, cid, "
            f"list(dsum ORDER BY dim) AS s, any_value(nn) AS n FROM ("
            f"SELECT m, cid, dim, cast(sum(sv[dim]) as bigint) AS dsum, "
            f"count(*) AS nn FROM {a}, range(1, {PQ_SUB} + 1) t(dim) "
            f"GROUP BY m, cid, dim) GROUP BY m, cid)"
        )
        prev = c
    ctes.append(
        f"cb AS MATERIALIZED (SELECT m, cid, "
        f"list_transform({prev}.s, x -> "
        f"cast(floor(cast(x as double) / n) as bigint)) AS c FROM {prev})"
    )
    enc_d = _pq_d2_sql("duckdb", "s2.sv", "cb.c")
    ctes.append(
        f"codes AS MATERIALIZED (SELECT vec_id, m, code FROM ("
        f"SELECT s2.vec_id, s2.m, cb.cid AS code, "
        f"row_number() OVER (PARTITION BY s2.vec_id, s2.m "
        f"ORDER BY {enc_d}, cb.cid) AS rk "
        f"FROM sv s2 JOIN cb ON cb.m = s2.m) WHERE rk = 1)"
    )
    lut_d = _pq_d2_sql("duckdb", "q.sv", "cb.c")
    ctes.append(
        f"lut AS MATERIALIZED (SELECT q.vec_id AS qid, q.m, "
        f"cb.cid AS code, {lut_d} AS d "
        f"FROM sv q JOIN cb ON cb.m = q.m WHERE q.vec_id < {n_queries})"
    )
    ctes.append(
        "scored AS (SELECT lut.qid, codes.vec_id, "
        "cast(sum(lut.d) as bigint) AS adc "
        "FROM codes JOIN lut ON lut.m = codes.m AND lut.code = codes.code "
        "AND codes.vec_id <> lut.qid GROUP BY 1, 2)"
    )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT qid, cast(rank as int) AS rank, vec_id, adc FROM ("
        f"SELECT qid, vec_id, adc, row_number() OVER ("
        f"PARTITION BY qid ORDER BY adc, vec_id) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# IVF-PQ — the composed production index (coarse inverted lists +
# residual product quantization, Jegou et al. 2011 §IV): probe the
# query's nearest coarse clusters, rank their members by ADC over
# RESIDUALS (vector minus its cluster's rounded centroid). Residuals
# against integer-rounded coarse centroids stay exact integers, so
# the whole composition keeps the bit-exact oracle property.


def ivfpq_topk(
    emb: DataFrame, k: int = 5, n_queries: int = N_QUERIES,
    probes: int = IVF_PROBES, n_clusters: int = IVF_K,
    n_codes: int = PQ_K, iters: int = PQ_ITERS,
) -> DataFrame:
    """(qid, rank, vec_id, adc): top-k by integer residual-ADC within
    the probed coarse clusters. Scale shape: coarse centroids and PQ
    codebooks broadcast; encode is map-only; the probe-side candidate
    join is an equi-join on cid; the ADC sum map-side combines.
    ``n_clusters``/``n_codes``/``iters`` are the production scale
    knobs (defaults match the sf0.01 oracle replay)."""
    assigned, cents = ivf_assignments(emb, n_clusters, iters)
    assigned = assigned.localCheckpoint(eager=True)
    ccent = cents.selectExpr(
        "cid",
        "transform(s, x -> cast(floor(cast(x as double) / n) as bigint)) AS cc",
    )
    res = assigned.join(F.broadcast(ccent), "cid").selectExpr(
        "vec_id", "cid", "zip_with(vs, cc, (a, b) -> a - b) AS rv"
    )
    rsv = res.selectExpr(
        "vec_id", "cid", f"explode(sequence(0, {PQ_M - 1})) AS m", "rv"
    ).selectExpr(
        "vec_id", "cid", "m",
        f"slice(rv, m * {PQ_SUB} + 1, {PQ_SUB}) AS sv",
    ).localCheckpoint(eager=True)
    cb = _pq_lloyd(rsv.select("vec_id", "m", "sv"), n_codes, iters)
    codes = pq_codes(rsv.select("vec_id", "m", "sv"), cb)
    # coarse probe (same rational-centroid distances as ann_ivf_topk)
    q = assigned.filter(F.col("vec_id") < n_queries).selectExpr(
        "vec_id AS qid", "vs AS qv"
    )
    qscored = q.crossJoin(F.broadcast(cents)).selectExpr(
        "qid", "cid", f"{_sqdist_scaled_sql('spark', 'qv', 's', 'n')} AS d"
    )
    win = Window.partitionBy("qid").orderBy("d", "cid")
    probe = (
        qscored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= probes)
        .select("qid", "cid")
    )
    # per-(query, probed-cluster) residual LUT
    qres = (
        probe.join(q, "qid")
        .join(F.broadcast(ccent), "cid")
        .selectExpr(
            "qid", "cid",
            f"explode(sequence(0, {PQ_M - 1})) AS m",
            "zip_with(qv, cc, (a, b) -> a - b) AS qr",
        )
        .selectExpr(
            "qid", "cid", "m",
            f"slice(qr, m * {PQ_SUB} + 1, {PQ_SUB}) AS qsv",
        )
    )
    cbr = cb.selectExpr("m", "cid AS code", "c")
    lut = qres.join(cbr, "m").selectExpr(
        "qid", "cid", "m", "code",
        f"{_pq_d2_sql('spark', 'qsv', 'c')} AS d",
    )
    cand = (
        probe.join(assigned.select("vec_id", "cid"), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "cid", "vec_id")
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["qid", "cid", "m", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.sum("d").alias("adc"))
    )
    rwin = Window.partitionBy("qid").orderBy("adc", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(rwin))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "adc")
    )


def oracle_ivfpq_topk(
    k: int = 5, n_queries: int = N_QUERIES, probes: int = IVF_PROBES
) -> str:
    """Replays the full composition: coarse Lloyd -> rounded coarse
    centroids -> integer residuals -> per-subspace PQ Lloyd -> encode
    -> probe -> residual LUT -> integer ADC. All stages MATERIALIZED."""
    vs = ivf_scaled_sql("duckdb")
    d = _sqdist_scaled_sql("duckdb", "v.vs", "c.s", "c.n")
    qd = _sqdist_scaled_sql("duckdb", "q.vs", "c.s", "c.n")
    ctes = [
        f"v AS MATERIALIZED (SELECT vec_id, {vs} AS vs FROM embeddings)",
        f"c0 AS MATERIALIZED (SELECT vec_id AS cid, vs AS s, "
        f"cast(1 as bigint) AS n FROM v WHERE vec_id < {IVF_K})",
    ]
    prev = "c0"
    for it in range(IVF_ITERS):
        a, c = f"a{it}", f"c{it + 1}"
        ctes.append(
            f"{a} AS MATERIALIZED (SELECT vec_id, vs, cid FROM ("
            f"SELECT v.vec_id, v.vs, c.cid, "
            f"row_number() OVER (PARTITION BY v.vec_id ORDER BY {d}, c.cid) AS rk "
            f"FROM v, {prev} c) WHERE rk = 1)"
        )
        ctes.append(
            f"{c} AS MATERIALIZED (SELECT cid, list(sv ORDER BY dim) AS s, "
            f"any_value(nn) AS n FROM ("
            f"SELECT cid, dim, cast(sum(vs[dim]) as bigint) AS sv, "
            f"count(*) AS nn "
            f"FROM {a}, range(1, {DIM} + 1) t(dim) GROUP BY cid, dim) "
            f"GROUP BY cid)"
        )
        prev = c
    final_a, final_c = f"a{IVF_ITERS - 1}", f"c{IVF_ITERS}"
    ctes.append(
        f"ccent AS MATERIALIZED (SELECT cid, list_transform(s, x -> "
        f"cast(floor(cast(x as double) / n) as bigint)) AS cc FROM {final_c})"
    )
    ctes.append(
        f"res AS MATERIALIZED (SELECT a.vec_id, a.cid, "
        f"list_transform(range(1, {DIM} + 1), i -> a.vs[i] - ccent.cc[i]) AS rv "
        f"FROM {final_a} a JOIN ccent ON ccent.cid = a.cid)"
    )
    ctes.append(
        f"rsv AS MATERIALIZED (SELECT vec_id, cid, m, "
        f"list_transform(range(1, {PQ_SUB} + 1), i -> rv[m * {PQ_SUB} + i]) AS sv "
        f"FROM res, range(0, {PQ_M}) mm(m))"
    )
    # per-subspace PQ Lloyd over residuals
    pd_ = _sqdist_scaled_sql("duckdb", "s2.sv", "c.s", "c.n", PQ_SUB)
    ctes.append(
        f"p0 AS MATERIALIZED (SELECT m, vec_id AS cid, sv AS s, "
        f"cast(1 as bigint) AS n FROM rsv WHERE vec_id < {PQ_K})"
    )
    prev = "p0"
    for it in range(PQ_ITERS):
        a, c = f"pa{it}", f"pc{it + 1}"
        ctes.append(
            f"{a} AS MATERIALIZED (SELECT vec_id, m, sv, cid FROM ("
            f"SELECT s2.vec_id, s2.m, s2.sv, c.cid, "
            f"row_number() OVER (PARTITION BY s2.vec_id, s2.m "
            f"ORDER BY {pd_}, c.cid) AS rk "
            f"FROM rsv s2 JOIN {prev} c ON c.m = s2.m) WHERE rk = 1)"
        )
        ctes.append(
            f"{c} AS MATERIALIZED (SELECT m, cid, "
            f"list(dsum ORDER BY dim) AS s, any_value(nn) AS n FROM ("
            f"SELECT m, cid, dim, cast(sum(sv[dim]) as bigint) AS dsum, "
            f"count(*) AS nn FROM {a}, range(1, {PQ_SUB} + 1) t(dim) "
            f"GROUP BY m, cid, dim) GROUP BY m, cid)"
        )
        prev = c
    ctes.append(
        f"cb AS MATERIALIZED (SELECT m, cid, "
        f"list_transform({prev}.s, x -> "
        f"cast(floor(cast(x as double) / n) as bigint)) AS c FROM {prev})"
    )
    enc_d = _pq_d2_sql("duckdb", "s2.sv", "cb.c")
    ctes.append(
        f"codes AS MATERIALIZED (SELECT vec_id, m, code FROM ("
        f"SELECT s2.vec_id, s2.m, cb.cid AS code, "
        f"row_number() OVER (PARTITION BY s2.vec_id, s2.m "
        f"ORDER BY {enc_d}, cb.cid) AS rk "
        f"FROM rsv s2 JOIN cb ON cb.m = s2.m) WHERE rk = 1)"
    )
    ctes.append(
        f"probe AS MATERIALIZED (SELECT qid, cid FROM ("
        f"SELECT q.vec_id AS qid, c.cid, "
        f"row_number() OVER (PARTITION BY q.vec_id ORDER BY {qd}, c.cid) AS rk "
        f"FROM v q, {final_c} c WHERE q.vec_id < {n_queries}) WHERE rk <= {probes})"
    )
    ctes.append(
        f"qres AS MATERIALIZED (SELECT probe.qid, probe.cid, m, "
        f"list_transform(range(1, {PQ_SUB} + 1), "
        f"i -> q.vs[m * {PQ_SUB} + i] - ccent.cc[m * {PQ_SUB} + i]) AS qsv "
        f"FROM probe JOIN v q ON q.vec_id = probe.qid "
        f"JOIN ccent ON ccent.cid = probe.cid, range(0, {PQ_M}) mm(m))"
    )
    lut_d = _pq_d2_sql("duckdb", "qres.qsv", "cb.c")
    ctes.append(
        f"lut AS MATERIALIZED (SELECT qid, qres.cid, qres.m, "
        f"cb.cid AS code, {lut_d} AS d "
        f"FROM qres JOIN cb ON cb.m = qres.m)"
    )
    ctes.append(
        f"cand AS MATERIALIZED (SELECT probe.qid, probe.cid, a.vec_id "
        f"FROM probe JOIN {final_a} a ON a.cid = probe.cid "
        f"AND a.vec_id <> probe.qid)"
    )
    ctes.append(
        "scored AS (SELECT cand.qid, cand.vec_id, "
        "cast(sum(lut.d) as bigint) AS adc "
        "FROM cand JOIN codes ON codes.vec_id = cand.vec_id "
        "JOIN lut ON lut.qid = cand.qid AND lut.cid = cand.cid "
        "AND lut.m = codes.m AND lut.code = codes.code "
        "GROUP BY 1, 2)"
    )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT qid, cast(rank as int) AS rank, vec_id, adc FROM ("
        f"SELECT qid, vec_id, adc, row_number() OVER ("
        f"PARTITION BY qid ORDER BY adc, vec_id) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# augmented Gram matrix — the one reduction PCA / whitening / linear
# probing needs at corpus scale: G = AᵀA where A is the vector matrix
# with a constant-1 column prepended, so G packs [[n, Σvᵀ], [Σv, VᵀV]]
# (count, component sums and second moments) in ONE pass. Classic
# distributed-ML partial-sum shape (the same map-side normal-equation
# pattern as gcp.py): each Arrow batch emits one 65x65 partial, the
# final agg merges d²/2-sized partials — NEVER a vector-level shuffle.
# Vectors are floor-scaled to integers (GRAM_SCALE) so the reduction
# is exact and engine-independent: at 1e4 scale a component product is
# <= 1e8, leaving room for ~1e10 vectors in int64.

GRAM_SCALE = 10_000


def embedding_gram(emb: DataFrame) -> DataFrame:
    """(j, k, gram) for j <= k over the 1-augmented scaled vectors.

    Scale: mapInPandas emits ONE (d+1)²-row partial per Arrow batch;
    the shuffle moves only partials (thousands of rows regardless of
    corpus size); the final groupBy is map-side combined."""
    import numpy as np
    import pandas as pd

    d_plus = DIM + 1
    iu = np.triu_indices(d_plus)

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.floor(
                np.stack(pdf["embedding"].values).astype(np.float64)
                * float(GRAM_SCALE)
            ).astype(np.int64)
            A = np.concatenate(
                [np.full((V.shape[0], 1), GRAM_SCALE, dtype=np.int64), V],
                axis=1,
            )
            G = A.T @ A
            yield pd.DataFrame(
                {"j": iu[0], "k": iu[1], "g": G[iu]}
            )

    partials = emb.select("embedding").mapInPandas(
        partial, schema="j long, k long, g long"
    )
    return partials.groupBy("j", "k").agg(
        F.sum("g").cast("bigint").alias("gram")
    )


def oracle_embedding_gram() -> str:
    lam = f"x -> cast(floor(cast(x as double) * {GRAM_SCALE}.0E0) as bigint)"
    return (
        f"WITH v AS (SELECT vec_id, list_prepend(cast({GRAM_SCALE} as "
        f"bigint), list_transform(embedding, {lam})) AS vs "
        f"FROM embeddings), "
        f"e AS (SELECT vec_id, unnest(vs) AS val, "
        f"unnest(range(0, {DIM + 1})) AS j FROM v) "
        f"SELECT a.j AS j, b.j AS k, "
        f"cast(sum(a.val * b.val) as bigint) AS gram "
        f"FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.j <= b.j "
        f"GROUP BY 1, 2"
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication via k-means + within-cluster
# cosine pruning (Abbas, Tirumala, Simig, Ganguli, Morcos 2023,
# "SemDeDup: Data-efficient learning at web-scale through semantic
# deduplication", arXiv:2303.09540). The trick that makes semantic
# dedup tractable at 10^12 items: an all-pairs cosine scan is O(n^2),
# but after k-means clustering near-duplicates land in the SAME
# cluster, so only within-cluster pairs are examined — K scales with
# the corpus (the paper uses K=50k on 100M items) to bound cluster
# size, and the pair stage is an equi-join on cluster id, never a
# cross join. Complements the pairwise `embedding_neardup` family:
# neardup REPORTS pairs; semdedup DECIDES which rows survive.


def semdedup(
    emb: DataFrame,
    n_clusters: int = IVF_K,
    iters: int = IVF_ITERS,
    min_cos_ppm: int = 350_000,
) -> DataFrame:
    """(vec_id, cid, kept): kept=0 iff some same-cluster vector with
    cosine >= threshold ranks higher under the keeper rule.

    Keeper rule (the paper's default, "keep examples far from the
    centroid"): within a near-duplicate pair the member FARTHER from
    the shared cluster centroid survives; ties break toward the larger
    vec_id. Because both members share the centroid (S, n), distances
    compare as the pure-integer numerators ||n*v - S||^2 — exact,
    order-free, and bit-replayable by the SQL oracle.

    Scale posture: Lloyd rounds come from ivf_assignments (K-row
    centroid broadcast, map-only scoring); the dedup stage is one
    equi-join on cid (cluster-size-bounded by choosing K ~ n/avg_sz)
    plus a K-row broadcast for the centroid keys. ``n_clusters`` /
    ``iters`` / ``min_cos_ppm`` are the run-scale knobs; module
    defaults match the sf0.01 oracle replay.
    """
    assigned, cents = ivf_assignments(emb, n_clusters, iters)
    num = _sqdist_num_sql("spark", "vs", "s", "n")
    keyed = assigned.join(F.broadcast(cents), "cid").selectExpr(
        "vec_id", "cid", f"{num} AS ckey"
    )
    v = _vectors(emb)
    # localCheckpoint before the self-join: a USING-list self-join on
    # one shared lazy plan can silently degrade to a per-key cross
    # join (see build notes); the checkpoint also truncates the Lloyd
    # lineage out of both join sides.
    items = (
        keyed.join(v, "vec_id")
        .select("vec_id", "cid", "ckey", "vs", "norm2")
        .localCheckpoint(eager=True)
    )
    b = items.selectExpr(
        "vec_id AS vec_b", "cid", "ckey AS ckey_b", "vs AS vs_b",
        "norm2 AS nb",
    )
    removed = (
        items.join(b, "cid")
        .where(F.col("vec_id") != F.col("vec_b"))
        .selectExpr(
            "vec_id", "ckey", "vec_b", "ckey_b", "norm2 AS na", "nb",
            f"{dot_sql('spark', 'vs', 'vs_b')} AS dot",
        )
        .where(F.expr(cos_key_sql()) >= min_cos_ppm)
        .where("ckey_b > ckey OR (ckey_b = ckey AND vec_b > vec_id)")
        .select("vec_id")
        .distinct()
    )
    return (
        items.select("vec_id", "cid")
        .join(removed.withColumn("rm", F.lit(1)), "vec_id", "left")
        .selectExpr("vec_id", "cid", "cast(rm IS NULL as int) AS kept")
    )


def oracle_semdedup(
    n_clusters: int = IVF_K,
    iters: int = IVF_ITERS,
    min_cos_ppm: int = 350_000,
) -> str:
    """Full DuckDB replay: the ivf_assignments Lloyd chain, then the
    within-cluster pair prune. ``items`` is MATERIALIZED — it is
    referenced three times and DuckDB 1.0 would otherwise re-inline
    the whole Lloyd chain per reference."""
    ctes, final_a, final_c = _oracle_ivf_ctes(n_clusters, iters)
    num = _sqdist_num_sql("duckdb", "a.vs", "c.s", "c.n")
    ctes.append(
        f"keyed AS (SELECT a.vec_id, a.cid, {num} AS ckey "
        f"FROM {final_a} a JOIN {final_c} c ON a.cid = c.cid)"
    )
    ctes.append(f"v6 AS ({_vectors_cte()})")
    ctes.append(
        "items AS MATERIALIZED (SELECT k.vec_id, k.cid, k.ckey, "
        "v6.vs, v6.na FROM keyed k JOIN v6 ON v6.vec_id = k.vec_id)"
    )
    dot = dot_sql("duckdb", "a.vs", "b.vs")
    ctes.append(
        f"p AS (SELECT a.vec_id AS vec_id, a.ckey AS ckey, "
        f"b.vec_id AS vec_b, b.ckey AS ckey_b, a.na AS na, b.na AS nb, "
        f"{dot} AS dot FROM items a JOIN items b "
        f"ON a.cid = b.cid AND a.vec_id <> b.vec_id)"
    )
    ctes.append(
        f"rem AS (SELECT DISTINCT vec_id FROM p "
        f"WHERE {cos_key_sql()} >= {min_cos_ppm} "
        f"AND (ckey_b > ckey OR (ckey_b = ckey AND vec_b > vec_id)))"
    )
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT items.vec_id, items.cid, "
        "cast(rem.vec_id IS NULL as int) AS kept "
        "FROM items LEFT JOIN rem ON rem.vec_id = items.vec_id"
    )


# ---------------------------------------------------------------------------
# contrastive hard-negative mining (FaceNet, Schroff et al. 2015;
# standard in CLIP-style training-data pipelines): for each anchor,
# the k most-similar vectors whose CLASS LABEL differs — the
# highest-loss negatives. Same broadcast + window shape as
# cosine_topk with the anti-label predicate fused into the join; at
# scale the anchor side is the tiny broadcast and the corpus is
# scanned once.

N_NEG_CLASSES = 7


def hard_negatives(
    emb: DataFrame, k: int = 5, n_queries: int = N_QUERIES,
    n_classes: int = N_NEG_CLASSES,
) -> DataFrame:
    """(qid, rank, vec_id, cos_key) — top-k nearest with a different
    label (label = vec_id % n_classes, the deterministic class)."""
    v = _vectors(emb).withColumn(
        "label", F.expr(f"vec_id % {n_classes}")
    )
    q = v.filter(F.col("vec_id") < n_queries).selectExpr(
        "vec_id AS qid", "vs AS qv", "norm2 AS na", "label AS qlabel"
    )
    scored = (
        v.join(F.broadcast(q), F.col("label") != F.col("qlabel"))
        .selectExpr(
            "qid", "vec_id", "na", "norm2 AS nb",
            f"{dot_sql('spark', 'qv', 'vs')} AS dot",
        )
        .selectExpr("qid", "vec_id", f"{cos_key_sql()} AS cos_key")
    )
    win = Window.partitionBy("qid").orderBy(F.desc("cos_key"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cos_key")
    )


def oracle_hard_negatives(
    k: int = 5, n_queries: int = N_QUERIES,
    n_classes: int = N_NEG_CLASSES,
) -> str:
    return (
        f"WITH v AS ({_vectors_cte()}), "
        f"scored AS (SELECT q.vec_id AS qid, c.vec_id, q.na AS na, "
        f"c.na AS nb, {dot_sql('duckdb', 'q.vs', 'c.vs')} AS dot "
        f"FROM v q JOIN v c ON q.vec_id < {n_queries} "
        f"AND c.vec_id % {n_classes} <> q.vec_id % {n_classes}), "
        f"keyed AS (SELECT qid, vec_id, {cos_key_sql()} AS cos_key, "
        f"row_number() OVER (PARTITION BY qid ORDER BY {cos_key_sql()} "
        f"DESC, vec_id) AS rank FROM scored) "
        f"SELECT qid, cast(rank as int) AS rank, vec_id, cos_key "
        f"FROM keyed WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (the FAISS ScalarQuantizer QT_8bit family,
# public faiss wiki / Guo et al.): per-dimension corpus min/max ->
# uint8 code c = (255*(v-min)) div range -> reconstruction
# recon = min + c*range/255. Everything here stays INTEGER: values
# are the 1e6-scaled ints, codes are exact integer division, and the
# reconstruction is kept x255 (min*255 + c*range) so the asymmetric
# dot is one pure-int64 partial sum — no float enters the plan on
# either engine. Completes the quantization family next to PQ / IVF /
# IVF-PQ / LSH.

SQ_DIM = 64
SQ_TOPK = 5


def sq8_topk(
    emb: DataFrame, k: int = SQ_TOPK, n_queries: int = N_QUERIES,
) -> DataFrame:
    """(qid, rank, vec_id, adc_key): asymmetric dot between exact
    queries and SQ8-reconstructed corpus codes (x255 scale)."""
    v = emb.selectExpr("vec_id", f"{scaled_vec_sql('spark')} AS vs")
    dims = v.select(
        "vec_id", F.posexplode("vs").alias("pos0", "val")
    ).selectExpr("vec_id", "pos0 + 1 AS pos", "val")
    stats = dims.groupBy("pos").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    recon = (
        dims.join(F.broadcast(stats), "pos")
        .selectExpr(
            "vec_id", "pos",
            "CASE WHEN mx = mn THEN mn * 255 ELSE mn * 255 + "
            "((255 * (val - mn)) div (mx - mn)) * (mx - mn) END AS recon255",
        )
    )
    q = dims.filter(F.col("vec_id") < n_queries).selectExpr(
        "vec_id AS qid", "pos", "val AS qval"
    )
    scored = (
        recon.join(F.broadcast(q), "pos")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum(F.expr("qval * recon255")).alias("adc_key"))
    )
    win = Window.partitionBy("qid").orderBy(F.desc("adc_key"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "adc_key")
    )


def oracle_sq8_topk(k: int = SQ_TOPK, n_queries: int = N_QUERIES) -> str:
    vs = scaled_vec_sql("duckdb")
    return (
        f"WITH v AS MATERIALIZED (SELECT vec_id, {vs} AS vs "
        f"FROM embeddings), "
        f"dims AS MATERIALIZED (SELECT vec_id, i AS pos, vs[i] AS val "
        f"FROM v, range(1, {SQ_DIM} + 1) t(i)), "
        f"stats AS MATERIALIZED (SELECT pos, min(val) AS mn, "
        f"max(val) AS mx FROM dims GROUP BY 1), "
        f"recon AS MATERIALIZED (SELECT vec_id, dims.pos, "
        f"CASE WHEN mx = mn THEN mn * 255 ELSE mn * 255 + "
        f"((255 * (val - mn)) // (mx - mn)) * (mx - mn) END AS recon255 "
        f"FROM dims JOIN stats ON stats.pos = dims.pos), "
        f"q AS (SELECT vec_id AS qid, pos, val AS qval FROM dims "
        f"WHERE vec_id < {n_queries}), "
        f"scored AS (SELECT qid, vec_id, "
        f"cast(sum(qval * recon255) as bigint) AS adc_key "
        f"FROM recon JOIN q ON q.pos = recon.pos "
        f"WHERE vec_id <> qid GROUP BY 1, 2), "
        f"ranked AS (SELECT qid, vec_id, adc_key, row_number() OVER ("
        f"PARTITION BY qid ORDER BY adc_key DESC, vec_id) AS rank "
        f"FROM scored) "
        f"SELECT qid, cast(rank as int) AS rank, vec_id, adc_key "
        f"FROM ranked WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# two-stage truncated-dimension rerank (Matryoshka-style coarse pass,
# Kusupati et al. 2022: rank on a dimension PREFIX, exact-rerank the
# shortlist). The coarse key reads only the first SQ_DIM/2 dims —
# at 10^12 vectors that halves the bytes the first pass touches; the
# exact pass sees SHORTLIST rows per query, not the corpus.

RERANK_PREFIX = 32
RERANK_SHORTLIST = 192  # recall-tuned: exact top-5 agreement on synth


def ann_rerank_topk(
    emb: DataFrame, k: int = SQ_TOPK, n_queries: int = N_QUERIES,
    prefix: int = RERANK_PREFIX, shortlist: int = RERANK_SHORTLIST,
) -> DataFrame:
    """(qid, rank, vec_id, cos_key): exact cosine over the
    prefix-dot shortlist."""
    v = _vectors(emb).withColumn(
        "vp", F.expr(f"slice(vs, 1, {prefix})")
    )
    q = v.filter(F.col("vec_id") < n_queries).selectExpr(
        "vec_id AS qid", "vs AS qv", "vp AS qp", "norm2 AS na"
    )
    coarse = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .selectExpr(
            "qid", "vec_id", "qv", "vs", "na", "norm2 AS nb",
            f"{dot_sql('spark', 'qp', 'vp')} AS ckey",
        )
    )
    wc = Window.partitionBy("qid").orderBy(F.desc("ckey"), "vec_id")
    short = coarse.withColumn("crank", F.row_number().over(wc)).filter(
        F.col("crank") <= shortlist
    )
    exact = short.selectExpr(
        "qid", "vec_id", "na", "nb",
        f"{dot_sql('spark', 'qv', 'vs')} AS dot",
    ).selectExpr("qid", "vec_id", f"{cos_key_sql()} AS cos_key")
    win = Window.partitionBy("qid").orderBy(F.desc("cos_key"), "vec_id")
    return (
        exact.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cos_key")
    )


def oracle_ann_rerank_topk(
    k: int = SQ_TOPK, n_queries: int = N_QUERIES,
    prefix: int = RERANK_PREFIX, shortlist: int = RERANK_SHORTLIST,
) -> str:
    return (
        f"WITH v AS MATERIALIZED (SELECT vec_id, vs, "
        f"vs[1:{prefix}] AS vp, {dot_sql('duckdb', 'vs', 'vs')} AS na "
        f"FROM (SELECT vec_id, {scaled_vec_sql('duckdb')} AS vs "
        f"FROM embeddings) t), "
        f"coarse AS MATERIALIZED (SELECT q.vec_id AS qid, c.vec_id, "
        f"q.na AS na, c.na AS nb, "
        f"{dot_sql('duckdb', 'q.vs', 'c.vs')} AS dot, "
        f"{dot_sql('duckdb', 'q.vp', 'c.vp')} AS ckey "
        f"FROM v q JOIN v c ON q.vec_id < {n_queries} "
        f"AND c.vec_id <> q.vec_id), "
        f"short AS (SELECT *, row_number() OVER (PARTITION BY qid "
        f"ORDER BY ckey DESC, vec_id) AS crank FROM coarse), "
        f"keyed AS (SELECT qid, vec_id, {cos_key_sql()} AS cos_key "
        f"FROM short WHERE crank <= {shortlist}), "
        f"ranked AS (SELECT qid, vec_id, cos_key, row_number() OVER ("
        f"PARTITION BY qid ORDER BY cos_key DESC, vec_id) AS rank "
        f"FROM keyed) "
        f"SELECT qid, cast(rank as int) AS rank, vec_id, cos_key "
        f"FROM ranked WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# PCA dominant component by integer power iteration on the EXACT
# centered scatter matrix (the classic distributed-PCA recipe: one
# pass of map-side Gram partials -> a d x d driver-side eigensolve ->
# a map-only projection; cf. Halko, Martinsson, Tropp 2011 §4 for why
# the d x d reduction is the only communication PCA needs). The
# scatter matrix comes from ``embedding_gram`` (exact int64 second
# moments), and every subsequent step — quantization, matrix-vector
# products, renormalization, sign fix, projection — is integer
# arithmetic with floor-division semantics shared between numpy and
# the SQL oracle, so the dominant axis and every per-vector score are
# bit-replayable by DuckDB from the raw table. Corpus-scale posture:
# the gram reduce moves (d+1)^2/2 partials per Arrow batch (never a
# vector shuffle), the iteration touches a d x d table only, and the
# projection is a map-only scan with the axis broadcast as a literal.
#
# Near-isotropic spectra (the synth embeddings sit at lambda1/lambda2
# ~ 1.07) would need ~90 plain power rounds, so the iteration first
# SQUARES the quantized scatter PCA_SQUARINGS times — B <- quant(B B)
# raises the eigengap to the 2^k power (lambda-ratio 0.93 -> 0.93^64
# ~ 0.01) — then runs PCA_ITERS matvec rounds. d x d x d integer
# products per squaring, trivial at d = 64 on driver and oracle both.

PCA_SQUARINGS = 6
PCA_ITERS = 3
PCA_NORM = 1_000_000


def _fdiv_sql(a: str, b: str) -> str:
    """Floor division (b > 0) in truncating-division dialects —
    matches numpy's // for int64."""
    return (
        f"(CASE WHEN ({a}) >= 0 THEN ({a}) // ({b}) "
        f"ELSE -(((-({a})) + ({b}) - 1) // ({b})) END)"
    )


def pca_pc1(
    emb: DataFrame,
    iters: int = PCA_ITERS,
    squarings: int = PCA_SQUARINGS,
) -> DataFrame:
    """(vec_id, pc1): each embedding's integer score along the
    dominant eigenvector of the exact centered scatter matrix.

    The gram collect is d^2-sized (4 KB at d=64) regardless of corpus
    size — the same driver-side reduction shape as a Lloyd centroid
    update; ``iters`` / ``squarings`` are the run-scale knobs."""
    import numpy as np

    g = embedding_gram(emb).toPandas()
    d = DIM
    G = np.zeros((d + 1, d + 1), dtype=np.int64)
    G[g["j"].to_numpy(), g["k"].to_numpy()] = g["gram"].to_numpy()
    n = int(G[0, 0]) // (GRAM_SCALE * GRAM_SCALE)
    s = G[0, 1:] // GRAM_SCALE  # exact: G[0,j] = GRAM_SCALE * sum vj
    Cu = np.triu(G[1:, 1:])
    C = Cu + Cu.T - np.diag(np.diag(Cu))
    C = n * C - np.outer(s, s)
    q = max(1, int(np.abs(C).max()) // PCA_NORM)
    cq = C // q  # numpy // floors — matches _fdiv_sql
    for _ in range(squarings):
        B = cq @ cq
        qb = max(1, int(np.abs(B).max()) // PCA_NORM)
        cq = B // qb
    v = np.full(d, PCA_NORM, dtype=np.int64)
    for _ in range(iters):
        w = cq @ v
        qw = max(1, int(np.abs(w).max()) // PCA_NORM)
        v = w // qw
    jmax = int(np.argmax(np.abs(v)))  # first max == (abs DESC, j ASC)
    if v[jmax] < 0:
        v = -v
    off = int(np.dot(v, s)) // n  # Python // floors — matches _fdiv_sql
    lits = ", ".join(f"{int(x)}L" for x in v)
    return emb.selectExpr(
        "vec_id",
        f"transform(embedding, x -> cast(floor(cast(x as double) * "
        f"{GRAM_SCALE}.0E0) as bigint)) AS v4",
    ).selectExpr(
        "vec_id",
        f"aggregate(zip_with(v4, array({lits}), (x, y) -> x * y), "
        f"cast(0 as bigint), (acc, x) -> acc + x) - ({off}) AS pc1",
    )


def oracle_pca_pc1(
    iters: int = PCA_ITERS, squarings: int = PCA_SQUARINGS
) -> str:
    """Full DuckDB replay from the raw embeddings table: gram ->
    centered scatter -> quantize -> ``squarings`` matrix-squaring
    rounds -> ``iters`` matvec/renorm rounds (MATERIALIZED — chained
    CTEs re-expand otherwise) -> sign fix -> map-only projection."""
    lam = f"x -> cast(floor(cast(x as double) * {GRAM_SCALE}.0E0) as bigint)"
    ctes = [
        f"va AS MATERIALIZED (SELECT vec_id, list_prepend(cast({GRAM_SCALE} "
        f"as bigint), list_transform(embedding, {lam})) AS vs FROM embeddings)",
        f"ea AS (SELECT vec_id, unnest(vs) AS val, "
        f"unnest(range(0, {DIM + 1})) AS j FROM va)",
        "g AS MATERIALIZED (SELECT a.j AS j, b.j AS k, "
        "cast(sum(a.val * b.val) as bigint) AS gram "
        "FROM ea a JOIN ea b ON a.vec_id = b.vec_id AND a.j <= b.j "
        "GROUP BY 1, 2)",
        f"nn AS (SELECT gram // {GRAM_SCALE * GRAM_SCALE} AS n FROM g "
        f"WHERE j = 0 AND k = 0)",
        f"sv AS (SELECT k - 1 AS j, gram // {GRAM_SCALE} AS s FROM g "
        f"WHERE j = 0 AND k >= 1)",
        # full symmetric centered scatter (j, k in 0..d-1)
        "ch AS (SELECT j - 1 AS j, k - 1 AS k, gram FROM g WHERE j >= 1)",
        "cf AS (SELECT j, k, gram FROM ch UNION ALL "
        "SELECT k, j, gram FROM ch WHERE j <> k)",
        "cs AS MATERIALIZED (SELECT cf.j, cf.k, "
        "(SELECT n FROM nn) * cf.gram - a.s * b.s AS val "
        "FROM cf JOIN sv a ON a.j = cf.j JOIN sv b ON b.j = cf.k)",
        f"qq AS (SELECT greatest(1, max(abs(val)) // {PCA_NORM}) AS q "
        f"FROM cs)",
        f"cq AS MATERIALIZED (SELECT j, k, "
        f"{_fdiv_sql('val', '(SELECT q FROM qq)')} AS val FROM cs)",
        f"v0 AS (SELECT cast(r.range as bigint) AS j, "
        f"cast({PCA_NORM} as bigint) AS val FROM range(0, {DIM}) r)",
    ]
    mat = "cq"
    for t in range(1, squarings + 1):
        ctes.append(
            f"b{t} AS MATERIALIZED (SELECT a.j AS j, b.k AS k, "
            f"cast(sum(a.val * b.val) as bigint) AS val "
            f"FROM {mat} a JOIN {mat} b ON a.k = b.j GROUP BY 1, 2)"
        )
        ctes.append(
            f"qb{t} AS (SELECT greatest(1, max(abs(val)) // {PCA_NORM}) "
            f"AS q FROM b{t})"
        )
        ctes.append(
            f"bq{t} AS MATERIALIZED (SELECT j, k, "
            f"{_fdiv_sql('val', f'(SELECT q FROM qb{t})')} AS val "
            f"FROM b{t})"
        )
        mat = f"bq{t}"
    prev = "v0"
    for t in range(1, iters + 1):
        ctes.append(
            f"w{t} AS MATERIALIZED (SELECT {mat}.j AS j, "
            f"cast(sum({mat}.val * {prev}.val) as bigint) AS val "
            f"FROM {mat} JOIN {prev} ON {prev}.j = {mat}.k GROUP BY 1)"
        )
        ctes.append(
            f"m{t} AS (SELECT greatest(1, max(abs(val)) // {PCA_NORM}) "
            f"AS q FROM w{t})"
        )
        ctes.append(
            f"v{t} AS MATERIALIZED (SELECT j, "
            f"{_fdiv_sql('val', f'(SELECT q FROM m{t})')} AS val FROM w{t})"
        )
        prev = f"v{t}"
    ctes += [
        f"sg AS (SELECT CASE WHEN val < 0 THEN -1 ELSE 1 END AS sgn "
        f"FROM {prev} ORDER BY abs(val) DESC, j LIMIT 1)",
        f"vf AS MATERIALIZED (SELECT j, val * (SELECT sgn FROM sg) AS val "
        f"FROM {prev})",
        "od AS (SELECT cast(sum(vf.val * sv.s) as bigint) AS vd "
        "FROM vf JOIN sv ON sv.j = vf.j)",
        f"ofs AS (SELECT {_fdiv_sql('vd', '(SELECT n FROM nn)')} AS off "
        f"FROM od)",
        "ax AS (SELECT list(val ORDER BY j) AS axis FROM vf)",
        f"e4 AS (SELECT vec_id, list_transform(embedding, {lam}) AS v4 "
        f"FROM embeddings)",
    ]
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT vec_id, cast(list_dot_product(v4, "
        "(SELECT axis FROM ax)) as bigint) - (SELECT off FROM ofs) AS pc1 "
        "FROM e4"
    )
