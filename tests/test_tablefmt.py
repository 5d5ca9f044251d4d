"""Snapshot-log table format (the Iceberg-semantics stand-in):
atomic commit, time travel, rollback, resume anti-join, per-partition
lineage, and the optimistic-concurrency retry."""

import json
import os

import pytest

from gdal_spark import synth, tablefmt


@pytest.fixture()
def log(tmp_path):
    return tablefmt.SnapshotLog(str(tmp_path / "tbl"))


def _batch(spark, k, b=8):
    return spark.sql(synth.images_cte(64, "spark")).where(
        f"i >= {k * b} AND i < {(k + 1) * b}"
    )


def test_append_time_travel_and_rollback(spark, log):
    for k in range(3):
        sid = log.append(_batch(spark, k), metrics={"batch": k})
        assert sid == k
    # current = all 3 batches
    assert tablefmt.read_as_of(spark, log).count() == 24
    # AS OF each snapshot
    for sid, want in ((0, 8), (1, 16), (2, 24)):
        assert tablefmt.read_as_of(spark, log, sid).count() == want
    # i-sets are exactly the committed batches
    got = sorted(
        r.i for r in tablefmt.read_as_of(spark, log, 1).select("i").collect()
    )
    assert got == list(range(16))
    # rollback: a NEW snapshot with snapshot-1's files; history intact
    rb = log.rollback(1)
    assert rb == 3
    assert tablefmt.read_as_of(spark, log).count() == 16
    assert tablefmt.read_as_of(spark, log, 2).count() == 24  # still readable
    assert log.snapshot(rb)["op"] == "rollback"


def test_resume_filter_skips_committed(spark, log):
    log.append(_batch(spark, 0))
    pending = spark.sql(synth.images_cte(64, "spark")).where("i < 16")
    todo = tablefmt.resume_filter(pending, spark, log, ["image_id"])
    ids = sorted(r.i for r in todo.select("i").collect())
    assert ids == list(range(8, 16))
    # empty log passes everything through
    fresh = tablefmt.SnapshotLog(log.root + "_fresh")
    assert tablefmt.resume_filter(pending, spark, fresh, ["image_id"]).count() == 16


def test_commit_metadata_lineage(spark, log):
    sid = log.append(_batch(spark, 0), metrics={"job": "unit"})
    meta = log.snapshot(sid)
    s = meta["summary"]
    assert s["added_rows"] == 8
    assert s["added_files"] >= 1
    assert sum(s["partition_rows"].values()) == 8
    assert s["job"] == "unit"
    assert meta["parent"] is None


def test_optimistic_commit_retry(spark, log):
    log.append(_batch(spark, 0))
    # another writer claims v1 out-of-band
    with open(os.path.join(log.meta, "v1.json"), "w") as fh:
        json.dump(
            {"snapshot_id": 1, "parent": 0, "op": "append",
             "files": log.files_as_of(0), "summary": {}},
            fh,
        )
    sid = log.commit(log.files_as_of(0), "append", {})
    assert sid == 2  # lost the race on v1, retried and won v2


def test_merge_upsert_cow_file_granular(spark, log):
    sel = ["i", "image_id", "w", "h"]
    for k in range(2):
        log.append(_batch(spark, k).select(*sel), metrics={"batch": k})
    before = set(log.files_as_of())
    # source: update keys of batch 1, insert batch 2
    source = (
        spark.sql(synth.images_cte(64, "spark"))
        .where("i >= 8 AND i < 24")
        .selectExpr("i", "image_id", "w + 7 AS w", "h")
    )
    sid = tablefmt.merge_upsert(spark, log, source, ["image_id"])
    after = set(log.files_as_of(sid))
    # files holding a matched key were rewritten -> gone; every other
    # pre-merge file (incl. empty part files) survives BY PATH
    touched = {
        f for f in before
        if spark.read.parquet(f).where("i >= 8 AND i < 24").count() > 0
    }
    b0 = before - touched
    assert touched and b0
    assert not touched & after
    assert b0 <= after
    tbl = tablefmt.read_as_of(spark, log, sid).toPandas()
    assert len(tbl) == 24 and tbl["image_id"].is_unique
    pdf = synth.images_pdf(64)
    exp_w = {
        r.image_id: (r.w + 7 if r.i >= 8 else r.w)
        for r in pdf.itertuples() if r.i < 24
    }
    got_w = dict(zip(tbl["image_id"], tbl["w"]))
    assert got_w == exp_w
    s = log.snapshot(sid)["summary"]
    assert s["op_files_kept"] == len(b0) and s["op_files_rewritten"] >= 1
    # merge into an EMPTY table is a plain insert
    fresh = tablefmt.SnapshotLog(log.root + "_fresh")
    tablefmt.merge_upsert(spark, fresh, source, ["image_id"])
    assert tablefmt.read_as_of(spark, fresh).count() == 16
