"""Exact distributed percentiles without a global sort — the 2-pass
histogram + order-statistic refinement (the classic exact-quantile
pattern for data that cannot be sorted end-to-end; cf. the
TeraSort sampling stage and Greenwald-Khanna's motivation, but EXACT).

Spark's built-ins don't fit a 10^12-row exact quantile: sorting is a
full-range shuffle, ``percentile_approx`` is approximate, and
``percentile`` (exact) buffers per-group values. Here:

- pass 1: one map-side-combined aggregation over coarse value buckets
  (bounded rows: <= domain/width buckets), driver builds the CDF and
  locates, for each requested percentile p, the bucket holding rank
  r = ceil(p * n / 100) and the residual rank within it;
- pass 2: ONE more scan filtered to just the hit buckets (predicate
  pushed to the parquet scan), grouped by exact value (distinct
  values only ever shuffle), a per-bucket cumulative sum picks the
  smallest value whose running count reaches the residual rank.

Total: two scans + two bounded shuffles, independent of n. The
definition is the discrete lower quantile: the r-th smallest value,
r = ceil(p*n/100) — bit-identical to the oracle's row_number formula.

Here over the documents table's ``n_chars`` (the token/length budget
column every corpus-curation cut starts from).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PCTS = (50, 90, 99)
BUCKET_W = 64  # pass-1 bucket width in value units


def exact_percentiles(
    spark: SparkSession,
    docs: DataFrame,
    pcts: tuple[int, ...] = PCTS,
    bucket_w: int = BUCKET_W,
    col: str = "n_chars",
) -> DataFrame:
    """(pct, value): exact discrete percentiles of ``col``."""
    v = docs.selectExpr(f"cast({col} as bigint) AS v")
    hist = (
        v.selectExpr(f"cast(floor(v / {bucket_w}.0E0) as bigint) AS b")
        .groupBy("b")
        .agg(F.count("*").alias("c"))
        .orderBy("b")
        .collect()  # bounded: <= domain/bucket_w rows
    )
    n = sum(r["c"] for r in hist)
    # locate each percentile's bucket + residual rank via the CDF
    specs = []  # (pct, bucket, residual_rank)
    for p in sorted(pcts):
        r = (p * n + 99) // 100  # ceil(p*n/100)
        cum = 0
        for row in hist:
            if cum + row["c"] >= r:
                specs.append((p, int(row["b"]), r - cum))
                break
            cum += row["c"]
    spec_df = spark.createDataFrame(specs, "pct int, b bigint, rr bigint")
    # pass 2: scan only the hit buckets; distinct values per bucket,
    # running count, smallest value reaching the residual rank
    hit = sorted({b for _, b, _ in specs})
    # plain range predicates on the raw column (not the derived bucket
    # expression) so the filter pushes down to the parquet scan
    ranges = " OR ".join(
        f"(v >= {b * bucket_w} AND v < {(b + 1) * bucket_w})" for b in hit
    )
    vals = (
        v.where(ranges)
        .selectExpr(f"cast(floor(v / {bucket_w}.0E0) as bigint) AS b", "v")
        .groupBy("b", "v")
        .agg(F.count("*").alias("c"))
    )
    from pyspark.sql import Window

    win = Window.partitionBy("b").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = vals.withColumn("cum", F.sum("c").over(win))
    return (
        ranked.join(F.broadcast(spec_df), "b")
        .where(F.col("cum") >= F.col("rr"))
        .groupBy("pct")
        .agg(F.min("v").alias("value"))
        .selectExpr("cast(pct as bigint) AS pct", "value")
        .orderBy("pct")
    )


def oracle_exact_percentiles(
    pcts: tuple[int, ...] = PCTS, col: str = "n_chars"
) -> str:
    """row_number replay of the same discrete-lower-quantile
    definition over the documents view."""
    parts = []
    for p in sorted(pcts):
        parts.append(
            f"SELECT cast({p} as bigint) AS pct, "
            f"(SELECT min(v) FROM "
            f"(SELECT cast({col} as bigint) AS v, "
            f"row_number() OVER (ORDER BY {col}) AS rn FROM documents) "
            f"WHERE rn >= cast(({p} * "
            f"(SELECT count(*) FROM documents) + 99) // 100 as bigint)"
            f") AS value"
        )
    return " UNION ALL ".join(parts) + " ORDER BY pct"
