"""Bucketed co-located cell joins: write once pre-shuffled, join with
zero Exchange nodes (the 100 TB fact-fact layout)."""

import pytest

from gdal_spark import synth
from gdal_spark.operators import bucketed, cells


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    imgs = cells.assign_cells(
        synth.images_df(spark, 2048), 8, "mercator", engine="sql"
    ).select("image_id", "cell_id")
    sites = cells.assign_cells(
        synth.images_df(spark, 256), 8, "mercator", engine="sql"
    ).selectExpr("image_id AS site_id", "cell_id")
    bucketed.write_bucketed(imgs, "b_imgs", 8)
    bucketed.write_bucketed(sites, "b_sites", 8)
    yield "b_imgs", "b_sites"
    spark.sql("DROP TABLE IF EXISTS b_imgs")
    spark.sql("DROP TABLE IF EXISTS b_sites")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed.cell_join_bucketed(spark, lt, rt)
        s = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in s
        assert "Exchange" not in s  # co-located bucket scans
        # same join over the raw (unbucketed) frames must shuffle —
        # the bucketing, not the data size, removes the exchange
        raw = spark.table(lt).repartition(4).join(
            spark.table(rt).repartition(4), "cell_id"
        )
        s_raw = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in s_raw
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_rows_match_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    n_b = bucketed.cell_join_bucketed(spark, lt, rt).count()
    n_p = spark.table(lt).join(spark.table(rt), "cell_id").count()
    assert n_b == n_p > 0
