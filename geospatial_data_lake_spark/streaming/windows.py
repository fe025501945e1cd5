"""Event-time windowed aggregations under Structured Streaming — T4.

The batch-equivalent declarations (oracle-checked) live in
operators/streaming_queries.py; these builders run the SAME aggregation
columns through ``readStream``, adding watermarks for state eviction.

Scale: windowed-aggregation state is partitioned by (window, keys) across
executors; the watermark bounds state size — without it an unbounded
stream accretes state forever. ``Trigger.AvailableNow`` processes a
backlog as a bounded stream with the same semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events directory (parquet parts arriving
    over time — T1's ingestion shape)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def tumbling_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1-hour tumbling windows with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (stateful sessionization)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id (at-least-once source -> effectively
    -once downstream). ``dropDuplicatesWithinWatermark`` keeps one state
    entry per key only until the watermark passes it, so state is bounded
    by the lateness horizon, not by stream history — the property that
    makes exact dedup viable on an unbounded 100 TB/day feed. (Plain
    ``dropDuplicates`` on a stream would accrete key state forever.)"""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_interval_join(
    clicks: DataFrame, views: DataFrame, max_delay: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: click events attributed to the view they
    followed within ``max_delay``. Both sides are watermarked and the join
    condition carries the time interval, so each side's buffered state is
    evicted once the other side's watermark passes the interval bound —
    the canonical bounded-state stream-stream join.
    """
    v = views.withWatermark("ts", max_delay).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = clicks.withWatermark("ts", max_delay).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_delay}")),
    ).select("c_user", "click_id", "view_id", "view_ts", "click_ts")


def run_to_memory_sink(agg: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a bounded stream to completion synchronously (test harness):
    memory sink + processAllAvailable."""
    query = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    query.processAllAvailable()
    return query
