"""Fixture-table loader.

The synthetic star schema (TESTDATA.md): region, nation, customer, supplier,
part, orders, lineitem, events, documents, embeddings — one parquet each
under an sf directory.

Scale design: each table is read with an explicit ``spark.read.parquet``
scan so Catalyst predicate pushdown / column pruning reach the parquet
reader.  At 100 TB the same loader points at partitioned table roots; no
query in this engine assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Tables:
    """Lazy accessor: ``Tables(spark, sf_dir).lineitem`` returns the
    DataFrame for that table, loading (and caching the handle) on first
    access."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in TABLE_NAMES:
            raise AttributeError(f"unknown fixture table: {name}")
        if name not in self._cache:
            path = os.path.join(self._sf_dir, f"{name}.parquet")
            if name == "events":
                # events.ts is TIMESTAMP(NANOS), which Spark's vectorized
                # reader rejects; read the raw int64 and floor-truncate to
                # micros (identical to DuckDB's nanos->micros semantics).
                self._spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                df = self._spark.read.parquet(path)
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                ).select("event_id", "ts", "user_id", "event_type", "value", "props")
            else:
                df = self._spark.read.parquet(path)
            self._cache[name] = df
        return self._cache[name]

    def register_views(self, *names: str) -> None:
        """Create temp views (for queries expressed in Spark SQL)."""
        for name in names or TABLE_NAMES:
            getattr(self, name).createOrReplaceTempView(name)


def tables(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark, sf_dir)
