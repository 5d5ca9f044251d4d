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
