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
    # Bounded-comparison oracle (sketch values are engine-specific): the
    # query publishes per-group row counts plus booleans asserting the
    # sketch landed within 0.5% of the exact interpolated percentile
    # (computed Spark-side). The GK sketch at accuracy 10000 has rank
    # error <= 1e-4 — orders of magnitude inside the bound — and is
    # deterministic, so the booleans are stable. The exact percentile
    # VALUES themselves are a10's (driver-green) gate; publishing them
    # here would only re-test cross-engine interpolation ulp-drift.
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               TRUE AS p50_within_bound,
               TRUE AS p95_within_bound,
               TRUE AS p99_within_bound
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "sketch", "scale-path"),
)
def a14_sketch_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (approx_percentile): the scale path for
    a10's exact percentiles. Exact percentiles need a full sort per group;
    the sketch folds in one pass with bounded state (accuracy 1/10000),
    merges associatively across partitions, and is the only viable plan
    when a group holds billions of rows. Correctness gate: group sizes +
    sketch-within-0.5%-of-exact booleans (see oracle comment)."""
    t = tables(spark, sf_dir)
    # r15 (guide §5.1): ONE exact-percentile aggregate evaluating all
    # three points from a single per-group value buffer — the pre-r15
    # shape ran three separate F.percentile aggregates, each building
    # (and sorting) its own copy of the full group buffer.  Spark's
    # Percentile evaluates every requested point from the same sorted
    # counts map with the same interpolation, so the three values are
    # bit-identical to the three single-point calls.
    agg = t.lineitem.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias("pcts"),
        F.percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))
        ).alias("epcts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    within = lambda i: (  # noqa: E731
        F.abs(F.element_at("pcts", i) - F.element_at("epcts", i))
        <= F.abs(F.element_at("epcts", i)) * 0.005
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        within(1).alias("p50_within_bound"),
        within(2).alias("p95_within_bound"),
        within(3).alias("p99_within_bound"),
    )


@register(
    "a15_hll_sketch_partitioned",
    # Bounded-comparison oracle: exact distinct counts (and the exact
    # corpus-wide rollup) from DuckDB, plus booleans asserting the HLL
    # estimates landed within 3% (lgK=14 -> rsd ~0.8%; Datasketches HLL
    # is deterministic). Sketch BYTES stay engine-specific and unpublished.
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS exact_distinct_docs,
               TRUE AS within_bound,
               (SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) FROM documents)
                   AS exact_all,
               TRUE AS rollup_within_bound
        FROM documents
        GROUP BY source
    """,
    tags=("agg", "sketch", "hll", "scale-path"),
)
def a15_hll_sketch_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count state: per-group HLL sketches built with
    hll_sketch_agg, merged across groups with hll_union_agg, estimates
    read with hll_sketch_estimate. The storable/mergeable sketch column —
    not just a scalar approx count — is what lets a 100 TB pipeline keep
    per-partition distinct-counts as data and roll them up later without
    rescanning (e.g. distinct tokens per shard -> corpus-wide estimate).
    Correctness gate: exact distinct counts + estimate-within-3% booleans
    (see oracle comment)."""
    t = tables(spark, sf_dir)
    per_source = t.documents.groupBy("source").agg(
        F.hll_sketch_agg(F.md5("text"), 14).alias("sketch"),
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("exact_distinct_docs"),
    )
    rollup = per_source.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_all"),
        F.sum("exact_distinct_docs").alias("sum_per_source"),
    )
    exact_all = t.documents.agg(
        F.countDistinct(F.md5("text")).cast("bigint").alias("exact_all")
    )
    within = lambda est, ex: F.abs(est - F.col(ex)) <= F.col(ex) * 0.03  # noqa: E731
    return (
        per_source.select(
            "source",
            "n_docs",
            F.col("exact_distinct_docs").cast("bigint").alias("exact_distinct_docs"),
            within(F.hll_sketch_estimate("sketch"), "exact_distinct_docs").alias(
                "within_bound"
            ),
        )
        .crossJoin(F.broadcast(rollup.select("est_all")))
        .crossJoin(F.broadcast(exact_all))
        .select(
            "source",
            "n_docs",
            "exact_distinct_docs",
            "within_bound",
            "exact_all",
            within(F.col("est_all"), "exact_all").alias("rollup_within_bound"),
        )
    )


_RANK_SCHEMA = (
    "doc_id bigint, lang string, n_chars bigint, lang_rank bigint,"
    " lang_n bigint"
)


def _rank_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: dense ordering of one language's documents
    by length (doc_id tie-break), plus the group size.  The rank/size
    division happens OUTSIDE the kernel with F.round — Python's round()
    is banker's rounding while SQL rounds half away from zero, so
    fractional outputs must never be rounded Python-side."""
    out = pdf.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    out["lang_rank"] = range(1, len(out) + 1)
    out["lang_n"] = len(out)
    return out


@register(
    "x05_group_rank_normalize",
    oracle="""
        SELECT doc_id, lang, n_chars,
               CAST(row_number() OVER (PARTITION BY lang
                    ORDER BY n_chars, doc_id) AS BIGINT) AS lang_rank,
               CAST(round(row_number() OVER (PARTITION BY lang
                          ORDER BY n_chars, doc_id) * 1.0
                          / count(*) OVER (PARTITION BY lang), 4)
                    AS DOUBLE) AS lang_pct
        FROM documents
        ORDER BY doc_id
    """,
    tags=("extension", "applyInPandas", "grouped-map"),
)
def x05_group_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map extension point: per-language rank normalization of
    document lengths through ``applyInPandas`` — each language's rows
    arrive as ONE pandas frame, the kernel orders and scores them, and
    the result is the window-function answer (the oracle IS the window
    form).  Integer ranks + one rational division keep the comparison
    exact across engines.

    This completes the Python-extension API surface alongside
    mapInPandas (mm02-06), GROUPED_AGG (x04), and
    applyInPandasWithState (T3).  Scale shape: one shuffle on the
    group key, one Arrow batch per group — correct when groups fit an
    executor (languages do); when a group may not, the window-function
    form IS the fallback and plans identically to w03."""
    t = tables(spark, sf_dir)
    ranked = (
        t.documents.select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(_rank_normalize, schema=_RANK_SCHEMA)
    )
    return ranked.select(
        "doc_id",
        "lang",
        "n_chars",
        "lang_rank",
        F.round(F.col("lang_rank") / F.col("lang_n"), 4).alias("lang_pct"),
    ).orderBy("doc_id")


class _SegmentSplit:
    """Python UDTF kernel: explode a document into fixed 20-token
    segments — one input row yields ceil(n_tokens/20) output rows."""

    def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
        toks = (text or "").split(" ")
        for s in range((len(toks) + 19) // 20):
            seg = toks[s * 20 : s * 20 + 20]
            yield doc_id, s, len(seg), seg[0]


@register(
    "x06_udtf_segment_split",
    oracle="""
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        segs AS (
            SELECT doc_id, t,
                   unnest(range(0, CAST(ceil(len(t) / 20.0) AS INT)))
                       AS seg
            FROM tk
        )
        SELECT doc_id, CAST(seg AS BIGINT) AS seg_idx,
               CAST(least(20, len(t) - seg * 20) AS BIGINT) AS n_tokens,
               t[seg * 20 + 1] AS head
        FROM segs
        ORDER BY doc_id, seg_idx
    """,
    tags=("extension", "udtf", "text"),
)
def x06_udtf_segment_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating Python UDTF (SURVEY.md §2.10 UDTF surface, the
    engine-level analog of the reference's one-URL -> N-documents
    traversal X3): each document row LATERAL-expands into fixed
    20-token segments (index, length, head token) through a registered
    ``@udtf`` class — the last Python-extension mechanism the engine
    exposes, alongside scalar pandas UDFs (p08), mapInPandas (mm0x),
    GROUPED_AGG (x04), applyInPandas (x05), and
    applyInPandasWithState (T3).

    Scale shape: a UDTF is row-at-a-time Python — the honest cost of
    arbitrary table generation (same caveat as x04's docstring).  It
    partitions embarrassingly (no shuffle: LATERAL rides the scan), but
    when the expansion is expressible relationally — this one is
    posexplode over ``sequence()`` — the codegen path (the oracle's
    shape) is preferred in the hot path; x06 keeps the UDTF form
    because the extension MECHANISM is the row being demonstrated."""
    from pyspark.sql.functions import udtf

    seg_split = udtf(
        _SegmentSplit,
        returnType="doc_id bigint, seg_idx bigint, n_tokens bigint, head string",
    )
    spark.udtf.register("x06_segment_split", seg_split)
    t = tables(spark, sf_dir)
    t.documents.select("doc_id", "text").createOrReplaceTempView("x06_docs")
    return spark.sql(
        """
        SELECT s.doc_id, s.seg_idx, s.n_tokens, s.head
        FROM x06_docs d, LATERAL x06_segment_split(d.doc_id, d.text) s
        ORDER BY s.doc_id, s.seg_idx
        """
    )


def _arrow_batch_norms(batches):
    """mapInArrow kernel: L2 norms straight off the Arrow buffers — no
    pandas materialization, no per-row Python.  Per-row reduction is
    ``np.add.reduceat`` over the flattened child values (STRICTLY
    sequential left-to-right adds, which is what lets the DuckDB
    oracle's scalar list_reduce fold reproduce the doubles bitwise)."""
    import numpy as np
    import pyarrow as pa

    for b in batches:
        emb = b.column("embedding")
        offs = np.asarray(emb.offsets)
        vals = np.asarray(emb.values, dtype=np.float64)[offs[0] : offs[-1]]
        rel = (offs - offs[0]).astype(np.int64)
        # sentinel-padded reduceat: empty vectors point their segment at
        # the appended 0.0, so they fold to 0.0 instead of crashing /
        # stealing the next row's first element (reduceat's behavior on
        # equal/decreasing indices); x + 0.0 is exact, so non-empty
        # sums are bit-identical to the unpadded fold
        sq = np.append(vals * vals, 0.0)
        starts = rel[:-1].copy()
        starts[rel[1:] == rel[:-1]] = len(sq) - 1
        sums = (
            np.add.reduceat(sq, starts)
            if len(starts)
            else np.zeros(0, dtype=np.float64)
        )
        yield pa.RecordBatch.from_arrays(
            [
                b.column("vec_id"),
                pa.array((rel[1:] - rel[:-1]).astype(np.int32), pa.int32()),
                pa.array(np.round(np.sqrt(sums), 6), pa.float64()),
            ],
            names=["vec_id", "n_dims", "l2_norm"],
        )


@register(
    "x07_arrow_batch_norms",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS n_dims,
               round(sqrt(list_reduce(list_prepend(0.0,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> x * x)),
                   (acc, x) -> acc + x)), 6) AS l2_norm
        FROM embeddings
        ORDER BY vec_id
    """,
    tags=("extension", "arrow", "embeddings"),
)
def x07_arrow_batch_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` batch transform (the remaining Python-extension
    surface after scalar pandas UDFs p08, mapInPandas mm0x, GROUPED_AGG
    x04, applyInPandas x05, applyInPandasWithState T3, and UDTF x06):
    embedding L2 norms computed directly on the Arrow record batches —
    numpy over the list array's value buffer, zero pandas conversion
    and zero per-row Python, the lowest-overhead way to put custom
    vector math in a Spark pipeline when codegen can't express it.

    Scale shape: embarrassingly parallel — rides the scan, no shuffle;
    per-batch cost is two vectorized numpy passes over the flattened
    values buffer.  (This particular norm IS codegen-expressible —
    ss01 does it with unrolled expressions; x07 demonstrates the
    MECHANISM for kernels that are not, e.g. BLAS matmuls against a
    broadcast codebook.)  Determinism: float64 squares summed strictly
    left-to-right per row (np.add.reduceat), mirrored by the oracle's
    sequential list_reduce fold."""
    t = tables(spark, sf_dir)
    return (
        t.embeddings.select("vec_id", "embedding")
        .mapInArrow(
            _arrow_batch_norms,
            schema="vec_id bigint, n_dims int, l2_norm double",
        )
        .orderBy("vec_id")
    )
