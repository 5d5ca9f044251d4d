"""Bucketed cell tables — the co-located-join layout for 100 TB.

The engine's big joins all key on spatial cell ids (tile assignment,
PIP prefilter, overlay candidates). At cluster scale the win is to
PRE-SHUFFLE ONCE at write time: persist both sides bucketed by
``cell_id`` into the same bucket count, and every subsequent
cell-keyed join or aggregation reads co-located buckets with NO
exchange on either side (Spark's bucketed-scan path; the Iceberg
analog is a bucket partition transform on the same key).

This is the write-side complement of the read-side strategies the
operators already use (broadcast for small dims, salting for skew):
broadcast stops scaling when the dim side grows past executor memory;
bucketing is what replaces it for fact-fact cell joins.

Sandbox note: Spark bucketed tables require a catalog table
(``saveAsTable``) — the session's warehouse dir is used; tests point
it at a temp dir. The layout contract (hash(cell_id) % n_buckets,
sorted within buckets) is asserted by the shuffle-free-plan test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int, key: str = "cell_id"
) -> None:
    """Persist ``df`` bucketed + sorted by ``key`` (overwrites)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def cell_join_bucketed(
    spark: SparkSession, left_table: str, right_table: str,
    key: str = "cell_id",
) -> DataFrame:
    """Join two same-bucket-count tables on the bucket key. With
    bucketing enabled (default) the physical plan is a sort-merge
    join over co-located bucket scans — zero Exchange nodes."""
    return spark.table(left_table).join(spark.table(right_table), key)
