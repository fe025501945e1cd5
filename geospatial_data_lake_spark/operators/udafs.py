"""Custom aggregates (SURVEY.md §2.10 X4) as Arrow-vectorized pandas UDAFs.

The reference's only custom aggregate is the streaming multihash fold
(ref: backend/check_files_checksums/utils.py:101-106, covered by
s06_content_digest / plans/checksums.py). This module adds the
training-pipeline custom aggregate a relational engine can't express
natively: a vector centroid over an embedding column — the kernel of IVF
index training, per-class prototypes, and drift monitoring.

Scale notes: a GROUPED_AGG pandas UDF has NO partial-aggregation phase —
Spark shuffles every input row to its group's task and runs the kernel
once per group (ArrowAggregatePython, pinned to a single exchange in
tests/test_plan_shapes.py). That is the honest cost of arbitrary Python
aggregation; it is acceptable when groups are few and rows are modest
(per-class prototypes). When the reduction is expressible relationally —
a centroid is per-dimension avg — the codegen path (posexplode + avg,
x04's oracle shape) regains map-side partial aggregation and should be
preferred at full scale; x04 keeps the UDAF form because X4's point is
the extension mechanism itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


@register(
    "x04_centroid_udaf",
    oracle="""
        WITH e AS (
            SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        flat AS (
            SELECT label, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x
            FROM e
        )
        SELECT label, dim, round(avg(x), 4) AS centroid_val
        FROM flat
        GROUP BY label, dim
    """,
    tags=("udaf", "X4", "embedding"),
)
def x04_centroid_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid via a GROUPED_AGG pandas UDF returning
    an array, exploded to (label, dim, value) rows for the oracle compare.
    The UDAF is the point: an array-valued custom aggregate Spark SQL has
    no builtin for, running as partial+final agg with Arrow transfer."""

    @F.pandas_udf("array<double>")
    def centroid(v: pd.Series) -> list:
        return np.stack(v.to_numpy()).mean(axis=0).tolist()

    t = tables(spark, sf_dir)
    cents = (
        t.embeddings.select("label", F.col("embedding").cast("array<double>").alias("v"))
        .groupBy("label")
        .agg(centroid("v").alias("c"))
    )
    return cents.select(
        "label", F.posexplode("c").alias("dim", "raw")
    ).select("label", "dim", F.round("raw", 4).alias("centroid_val"))


@register(
    "a14_sketch_percentiles",
    oracle=None,  # t-digest style sketch — approximate by design; bounds unit-tested
    tags=("agg", "sketch", "scale-path"),
)
def a14_sketch_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (approx_percentile): the scale path for
    a10's exact percentiles. Exact percentiles need a full sort per group;
    the sketch folds in one pass with bounded state (accuracy 1/10000),
    merges associatively across partitions, and is the only viable plan
    when a group holds billions of rows."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias("pcts")
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("pcts", 1), 2).alias("p50"),
            F.round(F.element_at("pcts", 2), 2).alias("p95"),
            F.round(F.element_at("pcts", 3), 2).alias("p99"),
        )
    )


@register(
    "a15_hll_sketch_partitioned",
    oracle=None,  # sketch bytes are impl-specific; estimate bounds unit-tested
    tags=("agg", "sketch", "hll", "scale-path"),
)
def a15_hll_sketch_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count state: per-group HLL sketches built with
    hll_sketch_agg, merged across groups with hll_union_agg, estimates
    read with hll_sketch_estimate. The storable/mergeable sketch column —
    not just a scalar approx count — is what lets a 100 TB pipeline keep
    per-partition distinct-counts as data and roll them up later without
    rescanning (e.g. distinct tokens per shard -> corpus-wide estimate)."""
    t = tables(spark, sf_dir)
    per_source = t.documents.groupBy("source").agg(
        F.hll_sketch_agg(F.md5("text"), 14).alias("sketch"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    rollup = per_source.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_all")
    )
    return per_source.select(
        "source",
        "n_docs",
        F.hll_sketch_estimate("sketch").alias("est_distinct_docs"),
    ).crossJoin(F.broadcast(rollup))
