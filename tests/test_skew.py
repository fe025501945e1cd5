"""Salted two-stage aggregation must equal the direct groupBy on a
power-law key distribution, for every supported merge function."""

from __future__ import annotations

from pyspark.sql import functions as F

from geospatial_data_lake_spark.operators.skew import two_stage_agg


def should_match_direct_aggregation_on_skewed_keys(spark):
    # 90% of rows share one key — the hot-key shape salting exists for
    df = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
        ).alias("key"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    got = {
        r.key: (r.n, r.total, r.lo, r.hi)
        for r in two_stage_agg(
            df,
            ["key"],
            {"n": ("v", "count"), "total": ("v", "sum"), "lo": ("v", "min"), "hi": ("v", "max")},
        ).collect()
    }
    want = {
        r.key: (r.n, r.total, r.lo, r.hi)
        for r in df.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        gn, gt, gl, gh = got[k]
        wn, wt, wl, wh = want[k]
        assert (gn, gl, gh) == (wn, wl, wh), k
        assert abs(gt - wt) < 1e-6 * max(1.0, abs(wt)), k


def should_match_direct_join_when_salted(spark):
    """salted_join == plain join, row-for-row, on a 90%-hot-key probe —
    for inner and left (including unmatched probe keys surviving left)."""
    from geospatial_data_lake_spark.operators.skew import salted_join

    probe = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("key"),
        F.col("id").alias("pid"),
    )
    # build misses some probe keys (k40..k49) so left join has null rows
    build = spark.createDataFrame(
        [("hot", 0)] + [(f"k{i}", i) for i in range(40)], "key string, bval int"
    )
    for how in ("inner", "left"):
        got = salted_join(probe, build, ["key"], n_salts=8, how=how)
        want = probe.join(build, ["key"], how)
        assert got.count() == want.count(), how
        assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty(), how


def should_spread_hot_key_across_salt_partitions(spark):
    """The point of the salt: in the shuffle-join regime (both sides too
    big to broadcast — forced here by disabling auto-broadcast, since
    tiny test data would otherwise broadcast and dodge the skew
    entirely), the hot key's rows must land in >1 post-shuffle
    partition when joined on (key, salt), where the unsalted join
    funnels them through exactly one."""
    from geospatial_data_lake_spark.operators.skew import salted_join

    # key must be data-driven (a literal key constant-folds the join
    # into a cartesian product and dodges the hash shuffle entirely)
    probe = spark.range(5_000).select(
        F.when(F.col("id") % 100 < 99, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id").cast("string")))
        .alias("key"),
        F.col("id").alias("pid"),
    )
    build = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i) for i in range(5_000)], "key string, bval int"
    )

    def n_parts(df):
        # distinct shuffle partitions holding the HOT key's output rows
        return (
            df.filter(F.col("key") == "hot")
            .withColumn("p", F.spark_partition_id())
            .select("p")
            .distinct()
            .count()
        )

    # Force the regime the primitive targets: no broadcast (both sides
    # "big") and no AQE skew splitting (which would rescue the baseline —
    # nice demonstration that AQE handles this adaptively; the explicit
    # salt is for when the plan must be stable).
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
        # AQE would coalesce this test's tiny post-shuffle output into one
        # partition and mask the spread we're asserting on
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {}
    for k, v in overrides.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        assert n_parts(probe.join(build, ["key"])) == 1  # the funnel
        salted = salted_join(probe, build, ["key"], n_salts=8)
        assert n_parts(salted) > 1, "hot key still funneled through one task"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
