"""Aggregation operators — SURVEY.md §2.4 (A1-A8).

Everything here is a Catalyst hash aggregate: partial (map-side) aggregation
happens before the shuffle automatically, so at 100 TB the shuffle carries
one row per (partition x group), not per input row. No Python in any hot
path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


@register(
    "a01_count_per_group",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "A1"),
)
def a01_count_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/grouped COUNT (ref: asset count per version,
    backend/content_iterator/task.py:54-59) plus exact distinct."""
    t = tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "a02_existence_probe",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_orders_with_returns
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
        )
    """,
    tags=("agg", "A2", "O2"),
)
def a02_existence_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence probe (ref: validation success = count(Failed, limit=1)==0,
    backend/validation_summary/task.py:33-38). The semi join stops at the
    first match per key — the declarative analog of limit=1."""
    t = tables(spark, sf_dir)
    returned = t.lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        t.orders.join(returned, t.orders.o_orderkey == returned.l_orderkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_orders_with_returns"))
    )


@register(
    "a03_uniqueness_check",
    oracle="""
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 15
    """,
    tags=("agg", "A3"),
)
def a03_uniqueness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness / duplicate detection by count (ref: title-uniqueness GSI
    count, backend/datasets/create.py:33)."""
    t = tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 15)
    )


@register(
    "a04_grouped_collect",
    oracle="""
        SELECT l_orderkey,
               CAST(count(*) AS BIGINT) AS n_items,
               string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber)
                   AS items
        FROM lineitem
        GROUP BY l_orderkey
    """,
    tags=("agg", "A4"),
)
def a04_grouped_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped collect for manifest building (ref: all asset rows per
    (dataset, version) into one manifest, backend/import_dataset/task.py:93-107).
    collect_list + array_sort gives deterministic order; stringified for
    cross-engine hashing."""
    t = tables(spark, sf_dir)
    return t.lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list("l_linenumber")), lambda x: x.cast("string")
            ),
        ).alias("items"),
    )


@register(
    "a06_grouped_bool",
    oracle="""
        SELECT l_returnflag,
               bool_and(l_quantity > 0) AS all_positive_qty,
               bool_or(l_discount > 0.09) AS any_high_discount,
               bool_and(l_shipdate < TIMESTAMP '2002-01-01') AS all_shipped_before_2002
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "A6"),
)
def a06_grouped_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped boolean aggregation (ref: per-version outcome = all checks
    passed, backend/validation_summary/task.py:33-40)."""
    t = tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_high_discount"),
        F.bool_and(F.col("l_shipdate") < "2002-01-01").alias("all_shipped_before_2002"),
    )


@register(
    "a07_error_report",
    oracle="""
        WITH vr AS (
            SELECT 'CHECK#' || event_type || '#URL#s3://events/' ||
                       CAST(user_id AS VARCHAR) AS sk,
                   CASE WHEN value < 0.1 THEN 'Failed' ELSE 'Passed' END AS result
            FROM events
        )
        SELECT split_part(sk, '#', 2) AS check_name,
               CAST(count(*) AS BIGINT) AS n_failed
        FROM vr
        WHERE result = 'Failed'
        GROUP BY check_name
    """,
    tags=("agg", "A7", "F4"),
)
def a07_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-report aggregation with composite-key parse (ref: gather Failed
    rows, split sk into check/url, backend/import_status/get.py:116-137;
    key format backend/validation_results_model.py:92). Build + split the
    composite key entirely with JVM string expressions."""
    t = tables(spark, sf_dir)
    vr = t.events.select(
        F.concat(
            F.lit("CHECK#"),
            F.col("event_type"),
            F.lit("#URL#s3://events/"),
            F.col("user_id").cast("string"),
        ).alias("sk"),
        F.when(F.col("value") < 0.1, "Failed").otherwise("Passed").alias("result"),
    )
    return (
        vr.filter(F.col("result") == "Failed")
        .select(F.split(F.col("sk"), "#").getItem(1).alias("check_name"))
        .groupBy("check_name")
        .agg(F.count(F.lit(1)).alias("n_failed"))
    )


@register(
    "a08_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("agg", "A8"),
)
def a08_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation (capability-parity A8: multi-group
    catalog stats the reference lacks natively). Partial aggregation still
    applies — rollup adds grouping sets, not extra scans."""
    t = tables(spark, sf_dir)
    return t.lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "a08b_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "A8"),
)
def a08b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation over order status x priority (capability-parity A8)."""
    t = tables(spark, sf_dir)
    return t.orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total"),
    )


@register(
    "a09_approx_distinct",
    oracle="""
        SELECT l_returnflag,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
               TRUE AS parts_within_bound,
               TRUE AS orders_within_bound
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "A8", "approx"),
)
def a09_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) per group — the 100 TB path for
    distinct counts (exact countDistinct shuffles every distinct value; the
    sketch is mergeable and constant-size).

    Oracle strategy (bounded comparison): the engine-specific sketch
    estimate can never hash-match an exact count, so the query publishes
    the *exact* per-group counts plus booleans asserting the sketch landed
    within 5x its configured 1% rsd of them. DuckDB computes the exact
    counts and literal TRUEs — the hash gate then verifies both the exact
    values and that the sketch error bound held. HLL++ is deterministic
    (hash-based, no RNG), so the booleans are stable run to run."""
    t = tables(spark, sf_dir)
    # The sketch and exact aggregations run as SEPARATE jobs joined on
    # the (tiny) group key: mixing distinct aggregates with HLL sketches
    # in one agg makes Spark plan an Expand that re-evaluates every
    # sketch update per distinct-duplicated row — measured 19 s at sf0.1
    # where the two independent aggregations total <5 s.
    sketches = t.lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
    )
    exact = t.lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    approx = exact.join(F.broadcast(sketches), "l_returnflag")
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.col(e) * 0.05
    )
    return approx.select(
        "l_returnflag",
        F.col("exact_parts").cast("bigint").alias("exact_parts"),
        F.col("exact_orders").cast("bigint").alias("exact_orders"),
        within("approx_parts", "exact_parts").alias("parts_within_bound"),
        within("approx_orders", "exact_orders").alias("orders_within_bound"),
    )


@register(
    "a10_percentiles",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 2) AS median_qty,
               round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "A8", "percentile"),
)
def a10_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (capability-parity;
    approx_percentile is the sketch path at scale — kept exact here so the
    oracle can verify)."""
    t = tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 2).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", 0.9), 2).alias("p90_price"),
    )
