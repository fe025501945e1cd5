"""Skew-mitigation primitives.

AQE's skew-join splitting handles storage-level skew, but a groupBy whose
key distribution is power-law (one URL, one dataset, one n-gram dominating)
still funnels each hot key through a single reduce task — the map-side
partial agg helps only when upstream partitions are many. ``two_stage_agg``
makes the mitigation explicit and plan-stable: stage 1 aggregates on
(key, salt) spreading each hot key over ``n_salts`` tasks; stage 2 merges
the per-salt partials. Works for any associative aggregate; the classic
salting pattern every large pipeline eventually needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-stage aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Equivalent to
    ``df.groupBy(keys).agg(...)`` but immune to hot-key reduce skew.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (
                F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(F.col(src))
            ).alias(out)
            for out, (src, fn) in aggs.items()
        ]
    )
    merge_cols: list[Column] = [
        _MERGE[fn](F.col(out)).alias(out) for out, (_, fn) in aggs.items()
    ]
    return stage1.groupBy(*keys).agg(*merge_cols)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted skew join: spread a hot probe key over ``n_salts`` tasks.

    The probe side gets a random salt per row; the build side replicates
    each row across ALL salts (explode of a literal range — build-side
    cost × n_salts, the standard trade); the join key becomes
    (keys..., salt), so one hot key's probe rows hash to n_salts
    different reduce tasks instead of one.  Output is row-identical to
    the unsalted join for ``inner`` and ``left`` joins (the salt never
    filters anything — every probe salt finds its replicated build row).

    AQE's skew-join splitting covers sort-merge joins adaptively; this
    explicit form is for when the plan must be stable (broadcast is too
    big, AQE disabled, or a downstream stage keys on the same columns
    and re-skews).  The salt uses ``rand`` — join RESULTS never depend
    on salt values, so nondeterministic salting is semantically safe.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_probe = probe.withColumn(
        "__salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    replicated_build = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_probe.join(replicated_build, [*keys, "__salt"], how)
    return out.drop("__salt")


# -- registered queries: the primitives under external correctness rows ------


@register(
    "sk01_salted_hotkey_agg",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(28,10))), 4) AS DOUBLE)
                   AS total_value,
               max(value) AS max_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("skew", "aggregate", "A1-analog"),
)
def sk01_salted_hotkey_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type totals over the events log via ``two_stage_agg``
    — the salted two-stage aggregation, row-identical to a plain
    groupBy (the oracle IS the plain groupBy).

    Scale shape: event_type has ~5 live values over the whole log, so a
    direct groupBy funnels billions of rows per key through 5 reduce
    tasks at 100 TB.  Stage 1 aggregates on (event_type, salt),
    spreading each hot key over 16 tasks; stage 2 merges 16 tiny
    partials per key.  The sum runs in exact decimal (order-independent
    addition — the salted partial order cannot drift a double
    accumulation; see functions/decimals.py), published as double."""
    from geospatial_data_lake_spark.functions.decimals import METRIC, dec

    t = tables(spark, sf_dir)
    agg = two_stage_agg(
        t.events.withColumn("value_dec", dec("value", METRIC)),
        ["event_type"],
        {
            "n_events": ("event_id", "count"),
            "total_value": ("value_dec", "sum"),
            "max_value": ("value", "max"),
        },
    )
    return agg.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.col("total_value"), 4).cast("double").alias("total_value"),
        "max_value",
    ).orderBy("event_type")


@register(
    "sk02_salted_dim_join",
    oracle="""
        WITH dim AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS type_n
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, d.type_n
        FROM events e JOIN dim d USING (event_type)
        WHERE e.event_id < 500
        ORDER BY e.event_id
    """,
    tags=("skew", "join", "J1-analog"),
)
def sk02_salted_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events joined to a per-type dimension via ``salted_join`` —
    row-identical to the plain inner join (the oracle IS the plain
    join), but each hot event_type's probe rows spread over 16 reduce
    tasks instead of one.

    This is the explicit-salt variant for when broadcast is impossible
    (a build side past the broadcast threshold) and the plan must not
    depend on AQE's runtime skew split; the build side pays a 16×
    replication, the standard trade.  The event_id filter is scan-side
    (pushed to parquet) and only bounds the checked output."""
    t = tables(spark, sf_dir)
    dim = t.events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("type_n")
    )
    probe = t.events.select("event_id", "event_type").filter(
        F.col("event_id") < 500
    )
    return salted_join(probe, dim, ["event_type"]).select(
        "event_id", "event_type", "type_n"
    ).orderBy("event_id")
