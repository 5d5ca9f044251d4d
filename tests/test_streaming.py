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
