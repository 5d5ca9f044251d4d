"""Structured Streaming: the streaming windowed aggregation must equal
the batch aggregation on the same files (batch/stream unification)."""

from gdal_spark import streaming
from tests.conftest import SF_DIR


def test_stream_equals_batch(spark, tmp_path):
    import shutil

    # file stream sources need a directory — stage the table file
    src = str(tmp_path / "events_dir")
    (tmp_path / "events_dir").mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src + "/part-000.parquet")
    batch = spark.read.parquet(src)
    exp = (
        streaming.windowed_event_stats(batch)
        .select("win_start_us", "event_type", "n_events", "value_cents_sum")
        .toPandas()
        .sort_values(["win_start_us", "event_type"])
        .reset_index(drop=True)
    )

    sdf = streaming.stream_windowed_counts(
        spark, src, batch.schema, str(tmp_path / "ckpt")
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("win_counts")
        .toPandas()
        .sort_values(["win_start_us", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for col in ("win_start_us", "event_type", "n_events", "value_cents_sum"):
        assert list(got[col]) == list(exp[col]), col


def test_stateful_sessionize_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionization == the batch window
    sessionization on the same data (single AvailableNow pass)."""
    import shutil

    src = str(tmp_path / "ev_dir")
    (tmp_path / "ev_dir").mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src + "/part-000.parquet")
    batch = spark.read.parquet(src)
    # batch expectation (same semantics as ogrsql.q_sessionize)
    from pyspark.sql import Window, functions as F

    ev = batch.selectExpr(
        "user_id", "event_id", "unix_micros(cast(ts as timestamp)) AS us"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = 30 * 60 * 1_000_000
    flagged = ev.withColumn(
        "new_s",
        F.expr(
            f"CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) "
            f"IS NULL THEN 1 WHEN us - lag(us) OVER (PARTITION BY user_id "
            f"ORDER BY us, event_id) > {gap} THEN 1 ELSE 0 END"
        ),
    ).withColumn("session_idx", F.sum("new_s").over(w))
    exp = (
        flagged.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
        )
        .toPandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )

    from gdal_spark import streaming

    sdf = streaming.stream_sessionize(spark, src, batch.schema)
    q = (
        sdf.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("sessions").toPandas()
    # latest emission per (user, session) wins (open sessions update)
    got = (
        got.sort_values(["user_id", "session_idx", "n_events"])
        .groupby(["user_id", "session_idx"], as_index=False)
        .last()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for col in ("user_id", "session_idx", "n_events", "start_us", "end_us"):
        assert list(got[col].astype("int64")) == list(exp[col].astype("int64")), col


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data semantics: with a 10-minute watermark and APPEND
    output, an event arriving hours behind the stream's max timestamp
    lands in an already-finalized window and is dropped; an on-time
    event in a still-open window is not emitted until the watermark
    passes it."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "late_events"
    src.mkdir()
    base = dt.datetime(2026, 1, 1, 10, 0, 0)

    def write(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(src / name)

    # batch 1: two windows of on-time data, then an event far ahead
    # that advances the watermark beyond both
    write(
        "b1.parquet",
        [
            (1, base, 1, "click", 1.0, "{}"),
            (2, base + dt.timedelta(minutes=5), 1, "click", 1.0, "{}"),
            (3, base + dt.timedelta(hours=1, minutes=5), 2, "click", 1.0, "{}"),
            (4, base + dt.timedelta(hours=5), 3, "click", 1.0, "{}"),
        ],
    )

    schema = spark.read.parquet(str(src)).schema

    def run_round():
        stream = spark.readStream.schema(schema).parquet(str(src))
        win = stream.withColumn(
            "ts2", F.expr("cast(ts as timestamp)")
        ).withWatermark("ts2", "10 minutes")
        agg = win.groupBy(F.window("ts2", "1 hour").alias("w")).agg(
            F.count("*").alias("n"), F.sum("value").alias("v")
        )
        q = (
            agg.selectExpr("unix_micros(w.start) AS ws", "n", "v")
            .writeStream.format("parquet")
            .outputMode("append")  # append = only FINALIZED windows emit
            .trigger(availableNow=True)
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        q.awaitTermination(120)

    # round 1: watermark advances past the first two windows and they
    # finalize; round 2 (restarted from the persisted checkpoint) sees
    # a LATE event for the long-closed first window
    run_round()
    write("b2.parquet", [(5, base + dt.timedelta(minutes=1), 9, "click", 7.0, "{}")])
    run_round()
    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .toPandas()
        .sort_values("ws")
        .reset_index(drop=True)
    )
    first_ws = int(base.timestamp()) * 1_000_000
    row = got[got.ws == first_ws]
    # the first window finalized with its 2 on-time rows; the late
    # event (id 5, value 7.0) was dropped by the watermark
    assert len(row) == 1
    assert int(row.iloc[0]["n"]) == 2
    assert float(row.iloc[0]["v"]) == 2.0
    # the far-ahead window (hour 15:00) is NOT finalized -> absent
    ahead_ws = int((base + dt.timedelta(hours=5)).timestamp()) * 1_000_000
    assert (got.ws == ahead_ws).sum() == 0


def test_stream_dedup_equals_batch(spark, tmp_path):
    """Stateful streaming dedup == the batch dedup_events on the same
    data: min-merge state is order-independent, so one AvailableNow
    pass (any batch split) lands on the batch answer exactly."""
    import shutil

    from gdal_spark import streaming

    src = str(tmp_path / "ev_dd")
    (tmp_path / "ev_dd").mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src + "/part-000.parquet")
    batch = spark.read.parquet(src)
    bucket = 6 * 3_600_000_000  # 6h: sf0.001 is sparse, force collisions
    exp = (
        streaming.dedup_events(batch, bucket_us=bucket)
        .toPandas()
        .sort_values(["user_id", "event_type", "bucket_us"])
        .reset_index(drop=True)
    )
    assert (exp.n_dupes > 1).any()  # the bucket key actually dedups
    sdf = streaming.stream_dedup(spark, src, batch.schema, bucket_us=bucket)
    q = (
        sdf.writeStream.format("memory")
        .queryName("dedup_first")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_first").toPandas()
    got = (
        got.sort_values(["user_id", "event_type", "bucket_us", "n_dupes"])
        .groupby(["user_id", "event_type", "bucket_us"], as_index=False)
        .last()
        .sort_values(["user_id", "event_type", "bucket_us"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for col in ("first_us", "first_event_id", "n_dupes"):
        assert list(got[col].astype("int64")) == list(exp[col].astype("int64")), col


def test_stream_rollup_equals_batch(spark, tmp_path):
    """Incremental overview rollup: the streaming stateful twin must
    converge to the batch last-wins + parent-aggregate result, with
    the update log split across files in NON-seq order (max-merge
    order independence)."""
    n = 3000
    updates = spark.sql(streaming.rollup_updates_cte(n, "spark"))
    exp = (
        streaming.rollup_updates(updates)
        .toPandas()
        .sort_values(["ptx", "pty"])
        .reset_index(drop=True)
    )

    src = tmp_path / "updates_dir"
    src.mkdir()
    pdf = updates.toPandas()
    # adversarial split: newest updates land in the FIRST file
    chunks = [
        pdf[pdf.seq >= 2000],
        pdf[(pdf.seq >= 1000) & (pdf.seq < 2000)],
        pdf[pdf.seq < 1000],
    ]
    for k, c in enumerate(chunks):
        c.to_parquet(src / f"part-{k:03d}.parquet", index=False)

    sdf = streaming.stream_rollup(spark, str(src), updates.schema)
    q = (
        sdf.writeStream.format("memory")
        .queryName("rollup_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_roll"))
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    q.awaitTermination(120)
    got_all = spark.table("rollup_stream").toPandas()
    # keep-latest per parent (max max_seq emitted)
    got = (
        got_all.sort_values("max_seq")
        .groupby(["ptx", "pty"], as_index=False)
        .last()
        .sort_values(["ptx", "pty"])
        .reset_index(drop=True)[exp.columns.tolist()]
    )
    assert got.equals(exp), (got.head(), exp.head())
