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


def should_dedup_duplicates_within_watermark(spark, tmp_path):
    import pandas as pd

    src = tmp_path / "dup_events"
    src.mkdir()
    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 1, 3, 2],  # 1 and 2 arrive twice
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 10:05", "2024-01-01 10:06",
                 "2024-01-01 10:10", "2024-01-01 10:07"]
            ),
            "user_id": [7, 7, 7, 8, 8],
            "event_type": ["a", "b", "a", "c", "b"],
            "value": [1.0, 2.0, 1.0, 3.0, 2.0],
            "props": ["{}"] * 5,
        }
    )
    spark.createDataFrame(rows, sw.EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(src), mode="overwrite"
    )
    stream = sw.read_event_stream(spark, str(src))
    query = sw.run_to_memory_sink(
        sw.dedup_within_watermark(stream), "dedup_out", output_mode="append"
    )
    try:
        got = sorted(
            r.event_id for r in spark.sql("SELECT * FROM dedup_out").collect()
        )
    finally:
        query.stop()
    assert got == [1, 2, 3]


def should_join_streams_within_interval(spark, tmp_path):
    import pandas as pd

    views = tmp_path / "views"
    clicks = tmp_path / "clicks"
    for d in (views, clicks):
        d.mkdir()
    view_rows = pd.DataFrame(
        {
            "event_id": [100, 101],
            "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 12:00"]),
            "user_id": [7, 7],
            "event_type": ["view", "view"],
            "value": [0.0, 0.0],
            "props": ["{}"] * 2,
        }
    )
    click_rows = pd.DataFrame(
        {
            # 200 follows view 100 within 1h; 201 is 2h after view 100
            # (outside the interval) and 30min after view 101 (inside)
            "event_id": [200, 201],
            "ts": pd.to_datetime(["2024-01-01 10:30", "2024-01-01 12:30"]),
            "user_id": [7, 7],
            "event_type": ["click", "click"],
            "value": [0.0, 0.0],
            "props": ["{}"] * 2,
        }
    )
    spark.createDataFrame(view_rows, sw.EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(views), mode="overwrite"
    )
    spark.createDataFrame(click_rows, sw.EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(clicks), mode="overwrite"
    )
    joined = sw.stream_stream_interval_join(
        sw.read_event_stream(spark, str(clicks)),
        sw.read_event_stream(spark, str(views)),
    )
    query = sw.run_to_memory_sink(joined, "attrib_out", output_mode="append")
    try:
        got = sorted(
            (r.click_id, r.view_id)
            for r in spark.sql("SELECT * FROM attrib_out").collect()
        )
    finally:
        query.stop()
    assert got == [(200, 100), (201, 101)]


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


def should_maintain_materialized_table_via_stream_upsert(spark, tmp_path):
    """Incremental materialization: a validation-result stream drives
    foreachBatch -> keyed parquet upsert. Late rows for an existing key
    REPLACE the stale row (update-in-place table maintenance); re-running
    after more data arrives must not duplicate earlier keys — the
    streaming analog of the reference's save() upserts."""
    import pandas as pd

    from geospatial_data_lake_spark.sources.sinks import upsert_parquet

    src = tmp_path / "vstream"
    src.mkdir()
    table = str(tmp_path / "status_table")
    chk = str(tmp_path / "chk")

    schema = "dataset_id string, version_id string, check string, url string, result string"

    def write_rows(fname, rows):
        pd.DataFrame(
            rows, columns=["dataset_id", "version_id", "check", "url", "result"]
        ).to_json(src / fname, orient="records", lines=True)

    def on_batch(df, epoch_id):
        upsert_parquet(
            df.sparkSession, table, df, key_cols=["dataset_id", "version_id", "check", "url"]
        )

    def drain():
        q = (
            spark.readStream.schema(schema).json(str(src))
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    write_rows("b1.json", [("d1", "v1", "json", "u1", "Passed"),
                           ("d1", "v1", "checksum", "u2", "Failed")])
    drain()
    # u2 re-checked and now passes; new url u3 appears
    write_rows("b2.json", [("d1", "v1", "checksum", "u2", "Passed"),
                           ("d1", "v1", "checksum", "u3", "Passed")])
    drain()

    final = {
        (r.check, r.url): r.result for r in spark.read.parquet(table).collect()
    }
    assert final == {
        ("json", "u1"): "Passed",
        ("checksum", "u2"): "Passed",  # replaced, not duplicated
        ("checksum", "u3"): "Passed",
    }
