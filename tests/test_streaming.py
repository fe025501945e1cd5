"""Structured Streaming: the streaming declarations must agree with their
batch-equivalent (oracle-checked) queries when driven over the same bounded
input — plus the AvailableNow ingest path."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from geospatial_data_lake_spark.streaming import windows as sw
from geospatial_data_lake_spark.streaming.ingest import ingest_staging_stream
from geospatial_data_lake_spark.tables import tables


def _events_dir(spark, sf_dir, tmp_path) -> str:
    """Re-materialize events as micros-timestamp parquet (stream source)."""
    out = str(tmp_path / "events_stream")
    tables(spark, sf_dir).events.repartition(4).write.mode("overwrite").parquet(out)
    return out


def should_match_batch_tumbling_counts(spark, sf_dir, tmp_path):
    path = _events_dir(spark, sf_dir, tmp_path)
    stream = sw.read_event_stream(spark, path)
    query = sw.run_to_memory_sink(sw.tumbling_counts(stream), "tumbling_out")
    try:
        got = {
            (r.window_start, r.event_type): (r.n, round(r.total_value, 4))
            for r in spark.sql("SELECT * FROM tumbling_out").collect()
        }
    finally:
        query.stop()
    batch = (
        tables(spark, sf_dir)
        .events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    want = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 4))
        for r in batch.collect()
    }
    assert got == want


def should_ingest_available_now(spark, tmp_path):
    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "m1.json").write_text('{"dataset_id": "d1", "metadata_url": "u1"}')
    (staging / "m2.json").write_text('{"dataset_id": "d2", "metadata_url": "u2"}')
    seen: list[tuple[str, str]] = []

    def on_batch(df, epoch_id):
        seen.extend((r.dataset_id, r.metadata_url) for r in df.collect())

    q = ingest_staging_stream(
        spark, str(staging), on_batch, str(tmp_path / "chk")
    )
    q.awaitTermination(60)
    assert sorted(seen) == [("d1", "u1"), ("d2", "u2")]
    shutil.rmtree(tmp_path / "chk", ignore_errors=True)
