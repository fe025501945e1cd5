"""Window-function operators — SURVEY.md §2.5 (W1-W4).

Each window partitions by a real entity key (customer, user, flag) — never a
single global partition, which would serialize at scale. W2's global batch
numbering is done per-partition-key for exactly that reason (the reference's
content_iterator batches per dataset-version, not globally:
backend/content_iterator/task.py:61-67)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


@register(
    "w01_ordinal_assignment",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) - 1 AS BIGINT) AS item_index
        FROM orders
    """,
    tags=("window", "W1"),
)
def w01_ordinal_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal assignment within group (ref: enumerate() item indexes,
    backend/check_stac_metadata/utils.py:84-97). Deterministic tiebreak on
    the unique key."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        (F.row_number().over(w) - 1).cast("bigint").alias("item_index"),
    )


@register(
    "w02_batch_assignment",
    oracle="""
        WITH numbered AS (
            SELECT l_returnflag,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_orderkey, l_linenumber
                   ) - 1 AS rn
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(rn // 1000 AS BIGINT) AS batch_id,
               CAST(count(*) AS BIGINT) AS batch_size
        FROM numbered
        GROUP BY l_returnflag, batch_id
    """,
    tags=("window", "W2"),
)
def w02_batch_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch/bucket assignment (ref: 10,000-item iteration windows
    {first_item, next_item}, backend/content_iterator/task.py:61-67).
    The entire content_iterator state machine collapses to one window
    expression + groupBy."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber")
    return (
        t.lineitem.select(
            "l_returnflag",
            F.floor((F.row_number().over(w) - 1) / 1000).alias("batch_id"),
        )
        .groupBy("l_returnflag", "batch_id")
        .agg(F.count(F.lit(1)).alias("batch_size"))
    )


@register(
    "w03_rank_per_group",
    oracle="""
        SELECT * FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   CAST(rank() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey
                   ) AS BIGINT) AS rnk,
                   CAST(dense_rank() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey
                   ) AS BIGINT) AS drnk
            FROM customer
        ) WHERE rnk <= 3
    """,
    tags=("window", "W3"),
)
def w03_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking / latest-per-key (capability-parity W3; needed for the as-of
    J9 'current version at time t' pattern). rank<=K prunes with a
    WindowGroupLimit at scale (Spark pushes the top-K into the sort)."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        t.customer.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "w04_lag_running_sum",
    oracle="""
        SELECT event_id, user_id,
               round(value, 4) AS value_r,
               round(lag(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ), 4) AS prev_value,
               CAST(round(sum(CAST(value AS DECIMAL(28,10))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 4) AS DOUBLE) AS running_total
        FROM events
    """,
    tags=("window", "W4"),
)
def w04_lag_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag + running aggregate with an explicit row frame
    (capability-parity W4)."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t.events.select(
        "event_id",
        "user_id",
        F.round(F.col("value"), 4).alias("value_r"),
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        # decimal running sum: DuckDB's segment-tree window aggregation adds
        # in a different order than Spark's sequential frame — exact decimal
        # addition makes both order-independent (see functions/decimals.py)
        F.round(F.sum(F.col("value").cast("decimal(28,10)")).over(wf), 4)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "w05_range_frame",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ), 2) AS DOUBLE) AS spend_30d
        FROM orders
    """,
    tags=("window", "W4"),
)
def w05_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time — trailing 30-day spend per customer
    (capability-parity W4: rangeBetween with interval bounds). Expressed in
    Spark SQL (identical Catalyst plan to the DataFrame API)."""
    t = tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ), 2) AS DOUBLE) AS spend_30d
        FROM orders
        """
    )
