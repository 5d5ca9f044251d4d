"""Distributed pointer-jump plumbing: partition scaling + component
correctness at a non-default input partitioning."""

import numpy as np

from gdal_spark.graphsql import fixpoint_parts


def test_fixpoint_parts_tracks_input(spark):
    """The merge-round label tables inherit the input's parallelism
    (round-2 hardcoded coalesce(8); at 100x scale the label table must
    keep its partitions) with the sandbox floor of 8."""
    df = spark.range(1000)
    assert fixpoint_parts(df.repartition(40)) == 40
    assert fixpoint_parts(df.repartition(2)) == 8  # floor
    assert fixpoint_parts(df.coalesce(1)) == 8


def test_dedup_clusters_partition_invariant(spark):
    """Same clusters whatever the input partitioning — and the fold
    runs at >=input partitions (no hardcoded collapse)."""
    from gdal_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = (
        dedup.dedup_clusters(docs.repartition(4))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    wide = (
        dedup.dedup_clusters(docs.repartition(24))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (base.values == wide.values).all()
    assert len(base) > 0
