"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H-Q1-shaped pricing summary) on
  sf0.001.
- ``queries()``: every declared operator from SURVEY.md §2 plus the
  training-data extensions, from the package registry.
- ``oracle_sql()``: the DuckDB oracle for EVERY registered query —
  no rows-only entries, no waivers.  (ss02/ss03 were rows-only through
  r11: their numpy-matmul
  projections had SQL-unreplayable summation order; both now project
  via literal-coefficient index-order folds, so the full LSH/IVF
  pipelines replay.  Their ss02b/ss03b audit companions remain as
  supporting evidence.)
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from geospatial_data_lake_spark import load_all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: pricing-summary aggregation (TPC-H Q1 shape) over
    sf0.001 lineitem."""
    from geospatial_data_lake_spark.functions.decimals import dec, dec_revenue, dsum, one

    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    return (
        lineitem.filter(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(dec_revenue()).alias("sum_disc_price"),
            dsum(dec_revenue() * (one() + dec("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(
                F.sum(dec("l_extendedprice")).cast("double")
                / F.count("l_extendedprice"),
                4,
            )
            .cast("double")
            .alias("avg_price"),
            F.round(F.sum(dec("l_discount")).cast("double") / F.count("l_discount"), 4)
            .cast("double")
            .alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all_queries().items()
        if spec.oracle is not None
    }
