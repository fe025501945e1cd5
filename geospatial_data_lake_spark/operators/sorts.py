"""Sort / limit / top-k operators — SURVEY.md §2.6 (O1-O4).

Top-k uses TakeOrderedAndProject: each partition keeps only k rows, the
driver merges k*partitions rows — no global sort at any scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


@register(
    "o01_ordered_iteration",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_orderkey <= 20
        ORDER BY l_orderkey, l_linenumber
    """,
    tags=("sort", "O1"),
)
def o01_ordered_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-ordered manifest iteration (ref: DynamoDB query returns sk-ordered
    rows, backend/import_dataset/task.py:93-98) — Spark must declare the
    order explicitly."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_orderkey") <= 20)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "o02_exists_shortcircuit",
    oracle="""
        SELECT (count(*) > 0) AS any_big_order,
               (count(*) FILTER (WHERE o_totalprice > 10000000) > 0) AS any_huge_order
        FROM orders
        WHERE o_totalprice > 400000
    """,
    tags=("sort", "O2", "A2"),
)
def o02_exists_shortcircuit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT-1 existence probe (ref: limit=1 / MaxKeys=1 probes,
    backend/validation_summary/task.py:37, backend/datasets/delete.py:38-39).
    Declarative count>0 — Catalyst still prunes columns; the imperative
    .limit(1).isEmpty() variant is used in plans/ where a boolean gates
    driver control flow."""
    t = tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 400000)
    return big.agg(
        (F.count(F.lit(1)) > 0).alias("any_big_order"),
        (
            F.count(F.when(F.col("o_totalprice") > 10000000, 1)) > 0
        ).alias("any_huge_order"),
    )


@register(
    "o03_top1_latest",
    oracle="""
        SELECT o_orderkey, o_custkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        FROM orders
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 1
    """,
    tags=("sort", "O3"),
)
def o03_top1_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-by-sortable-id top-1 (ref: lexicographically sortable ULIDs
    give 'latest version', backend/datasets_model.py:13-23). Deterministic
    tiebreak on the unique key."""
    t = tables(spark, sf_dir)
    return (
        t.orders.select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("orderdate").desc(), F.col("o_orderkey").desc())
        .limit(1)
    )


@register(
    "o04_topk",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    tags=("sort", "O4"),
)
def o04_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General top-k (capability-parity O4) via TakeOrderedAndProject."""
    t = tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
