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
