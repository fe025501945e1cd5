"""Time-series rollups over the ``events`` table: gap-filled resampling
with last-observation-carried-forward, and OHLC bar downsampling — the
"hypertable rollup" operators a continuous-aggregate surface serves (the
reference recomputes a status view on every read,
``backend/import_status/get.py:39-94``; a gap-filled per-entity series is
the same derive-a-dense-view-from-a-sparse-log pattern at time-series
complexity).

Scale notes (1000 executors, ~100 TB of events):

- Both queries shuffle ONLY on their natural keys (``user_id`` /
  ``event_type``): the bucket aggregation is partial-then-final, the
  gap-fill explode happens AFTER the per-user reduction (it amplifies
  the observation table, never the raw log), and ts01's only other
  exchange is the per-user lead window — no join anywhere.
- The spine is bounded by ``users x buckets``, independent of raw event
  volume: at 100 TB of events and hourly buckets the dense series is
  ~9k rows per user-year — the rollup SHRINKS the data, which is why
  continuous aggregates are materialized this way at scale.
- No driver-side state: the per-user min/max span stays distributed;
  ``F.sequence`` generates the dense bucket range executor-side.

Cross-engine determinism: bucket boundaries are ``date_trunc`` results
(micros on both sides — tables.py floor-truncates the parquet NANOS);
the per-bucket reading is selected by ``max_by(value, event_id)`` —
event_id is the unique ingest sequence, so the arg-max is tie-free and
engine-portable; carried readings are verbatim copies of parquet
doubles (no float arithmetic anywhere in either query)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


def _hourly_buckets(events: DataFrame) -> DataFrame:
    """Per (user, hour) last observation by ingest sequence — the cell
    table a streaming maintainer would keep incrementally (st06 does,
    via update-mode max_by merged into a lake table)."""
    ev = events.select("user_id", "ts", "value", "event_id")
    return ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.max_by("value", "event_id").alias("obs"))


def _locf_fill(b: DataFrame) -> DataFrame:
    """The gap-fill core over a (user_id, bucket, obs) cell table: each
    observation explodes the half-open interval to its successor bucket
    carrying its reading — LOCF by construction, join-free (see ts01).
    Returns (user_id, fill_bucket, reading, is_gap)."""
    w = Window.partitionBy("user_id").orderBy("bucket")
    nb = b.withColumn("nxt", F.lead("bucket").over(w))
    return nb.select(
        "user_id",
        F.col("obs").alias("reading"),
        "bucket",
        F.explode(
            F.sequence(
                "bucket",
                F.coalesce(
                    F.expr("nxt - INTERVAL 1 HOUR"), F.col("bucket")
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("fill_bucket"),
    ).select(
        "user_id",
        "fill_bucket",
        "reading",
        (F.col("fill_bucket") != F.col("bucket")).alias("is_gap"),
    )


@register(
    "ts01_gap_fill_locf",
    oracle="""
        WITH b AS (
            SELECT user_id, date_trunc('hour', ts) AS bucket,
                   max_by(value, event_id) AS obs
            FROM events GROUP BY user_id, bucket
        ),
        span AS (
            SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
            FROM b GROUP BY user_id
        ),
        spine AS (
            SELECT user_id,
                   unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
            FROM span
        ),
        f AS (
            SELECT s.user_id, s.bucket, b.obs, b.obs IS NULL AS is_gap
            FROM spine s
            LEFT JOIN b ON s.user_id = b.user_id AND s.bucket = b.bucket
        )
        SELECT user_id,
               strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
               last_value(obs IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS reading,
               is_gap
        FROM f
    """,
    tags=("timeseries", "events", "gapfill"),
)
def ts01_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled per-user series with last-observation-carried-
    forward: the sparse event log rolls up to one reading per (user,
    hour) — the bucket's last observation by ingest sequence — then a
    dense hourly spine (``F.sequence`` over each user's observed span,
    exploded executor-side) left-joins the readings and a running
    ``last(ignorenulls)`` window carries the prior reading across gap
    hours.  The spine's first bucket per user always holds that user's
    first observation, so no row is ever NULL.

    Plan shape — LOCF BY CONSTRUCTION, not by window-over-spine: each
    observation looks one observation ahead (``lead`` over the per-user
    bucket sequence) and explodes the half-open interval
    [its bucket, next bucket) into hourly rows that carry its reading
    verbatim.  Gap rows are born filled, so the dense-spine LEFT JOIN
    and the running last(ignorenulls) window of the declarative
    formulation (which the oracle keeps — the parity check proves the
    two formulations equivalent) disappear: two exchanges end-to-end
    (bucket agg, then the user_id lead window) instead of four plus a
    join.  The explode amplifies the per-user OBSERVATION table, never
    the raw log; output is users x buckets — calendar-bounded at any
    input scale."""
    t = tables(spark, sf_dir)
    filled = _locf_fill(_hourly_buckets(t.events))
    return filled.select(
        "user_id",
        F.date_format("fill_bucket", "yyyy-MM-dd HH:mm:ss").alias(
            "bucket_ts"
        ),
        "reading",
        "is_gap",
    )


@register(
    "ts02_ohlc_downsample",
    oracle="""
        SELECT event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket_day,
               min_by(value, event_id) AS open_value,
               max(value) AS high_value,
               min(value) AS low_value,
               max_by(value, event_id) AS close_value,
               CAST(count(*) AS BIGINT) AS volume
        FROM events
        GROUP BY event_type, bucket_day
    """,
    tags=("timeseries", "events", "downsample"),
)
def ts02_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event_type: open/close are the bucket's first/
    last observation by ingest sequence (``min_by``/``max_by`` on the
    unique event_id — tie-free, engine-portable), high/low are plain
    min/max, volume the row count.  Every statistic is an exact verbatim
    parquet double or an integer — no float summation, so the bar is
    bit-identical on any engine and any partitioning.

    Plan shape: one scan, one partial-then-final hash aggregation on
    (event_type, day) — the canonical map-side-combine rollup; output is
    types x days, calendar-bounded at any input scale."""
    t = tables(spark, sf_dir)
    ev = t.events.select("event_type", "ts", "value", "event_id")
    return ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "bucket_day"
        ),
    ).agg(
        F.min_by("value", "event_id").alias("open_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.max_by("value", "event_id").alias("close_value"),
        F.count(F.lit(1)).cast("bigint").alias("volume"),
    )


TS03_ORACLE = """
        WITH b AS (
            SELECT user_id, date_trunc('hour', ts) AS bucket,
                   max_by(value, event_id) AS obs
            FROM events GROUP BY user_id, bucket
        ),
        span AS (
            SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
            FROM b GROUP BY user_id
        ),
        spine AS (
            SELECT user_id,
                   unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
            FROM span
        ),
        f AS (
            SELECT s.user_id, s.bucket, b.obs, b.obs IS NULL AS is_gap
            FROM spine s
            LEFT JOIN b ON s.user_id = b.user_id AND s.bucket = b.bucket
        ),
        filled AS (
            SELECT user_id, bucket, is_gap,
                   last_value(obs IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS reading
            FROM f
        )
        SELECT user_id,
               strftime(CAST(bucket AS DATE), '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_hours,
               CAST(sum(CASE WHEN is_gap THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_filled,
               (CAST(sum(CAST(round(reading * 100, 0) AS BIGINT))
                     AS BIGINT) * 10000 // count(*)) / 1000000.0 AS twa
        FROM filled
        GROUP BY user_id, day
    """


@register(
    "ts03_time_weighted_avg",
    # The oracle replays the DECLARATIVE gap-fill (ts01's spine+LOCF
    # formulation) and aggregates it — so ts03's parity re-proves the
    # interval-explode/LOCF equivalence under composition.  Exactness:
    # the fixture's readings are cent-quantized doubles, so they sum as
    # exact integer cents and the mean is integer floor-division into
    # micro-units (the mx03 integer-DIV discipline) — engine-identical
    # at any corpus size, immune to the decimal->double rounding-
    # boundary drift a float division would reintroduce.
    oracle=TS03_ORACLE,
    tags=("timeseries", "events", "twap"),
)
def ts03_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily TIME-WEIGHTED average per user (the TimescaleDB
    ``time_weight``/TWAP primitive): the hourly LOCF series weights
    each reading by how long it was current (one row per hour it
    covered), so the daily mean over filled rows IS the
    time-weighted average — immune to irregular sampling, where a
    naive event-mean over-weights bursty periods.  Also reports how
    many of the day's hours were gap-filled (the staleness signal a
    monitoring surface alerts on).

    Plan shape: ts01's join-free LOCF core (bucket agg + lead window,
    two exchanges) followed by one partial-then-final aggregation on
    (user_id, day) — the rollup re-shrinks the dense series to
    users x days immediately, and the integer-cent sum keeps the mean
    exact under any partitioning (readings are cent-quantized; the
    mean is floor-divided into micro-units — the mx03 discipline)."""
    t = tables(spark, sf_dir)
    return _twa_daily(_locf_fill(_hourly_buckets(t.events)))


def _twa_daily(filled: DataFrame) -> DataFrame:
    """ts03's daily rollup over a filled LOCF series — shared with the
    streaming-maintained st06, which must reproduce it bit-for-bit."""
    return (
        filled.groupBy(
            "user_id",
            F.date_format(F.to_date("fill_bucket"), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum(F.col("is_gap").cast("int")).cast("bigint").alias(
                "n_filled"
            ),
            F.sum(
                F.round(F.col("reading") * 100, 0).cast("bigint")
            ).alias("cents"),
        )
        .select(
            "user_id",
            "day",
            "n_hours",
            "n_filled",
            (
                F.expr("(cents * 10000L) DIV n_hours") / F.lit(1000000.0)
            ).alias("twa"),
        )
    )
