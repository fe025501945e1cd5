"""Event-time windowed aggregations — SURVEY.md §2.9 (T4), batch form.

These are the *batch-equivalent* declarations of the streaming operators in
``streaming/``: Spark's ``window()`` / ``session_window()`` grouping columns
work identically in batch and Structured Streaming, so the oracle-checked
batch query here certifies the same aggregation logic the streaming tests
drive through ``readStream`` (streaming/windows.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


@register(
    "t01_tumbling_window",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(CAST(value AS DECIMAL(28,10))), 4) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("streaming", "T4"),
)
def t01_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (engine capability T4; the
    reference has no event-time semantics). Same window() column works under
    readStream + watermark — see streaming/windows.py."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("value").cast("decimal(28,10)")), 4).cast("double").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "t02_sliding_window",
    oracle="""
        WITH b AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS b30, event_type, value
            FROM events
        ),
        expanded AS (
            SELECT b30 AS ws, event_type, value FROM b
            UNION ALL
            SELECT b30 - INTERVAL '30 minutes', event_type, value FROM b
        )
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(CAST(value AS DECIMAL(28,10))), 4) AS DOUBLE) AS total_value
        FROM expanded
        GROUP BY 1, 2
    """,
    tags=("streaming", "T4"),
)
def t02_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30min slide): every event lands in two
    windows. Spark's window() enumerates them directly; the oracle expands
    via time_bucket + union."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("value").cast("decimal(28,10)")), 4).cast("double").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "t03_session_window",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(28,10))), 4) AS DOUBLE) AS session_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
    tags=("streaming", "T4", "session"),
)
def t03_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window with a 30-minute inactivity gap (engine capability T4).
    Spark's session_window() merges adjacent events server-side — the same
    column drives stateful streaming sessionization."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(28,10)")), 4).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "session_value",
        )
    )
