"""Declared-query registry.

Every operator from SURVEY.md §2 (plus the training-data-pipeline extensions)
is registered here as a named query: a callable ``(spark, sf_dir) ->
DataFrame`` optionally paired with an ANSI-SQL oracle string that DuckDB can
run over the same parquet tables.  The driver (and our own tests) execute
both sides and compare row counts, schemas, and order-insensitive value
hashes.

Cross-engine determinism rules every registered query follows:

- timestamps are formatted to strings (`yyyy-MM-dd HH:mm:ss`) — avoids
  session-timezone and precision ambiguity between Spark and DuckDB;
- computed floats (sums/averages/ratios) are ``round()``-ed identically on
  both sides; column values read straight from parquet are left exact;
- counts / integer sums are cast to BIGINT on both sides;
- arrays are stringified (``concat_ws`` / ``array_to_string``) before output;
- every computed column is aliased to the same name on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None for rows-only ops
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query. ``oracle=None`` marks a genuinely
    non-SQL-expressible op (the driver records a weaker rows-only check)."""

    def decorator(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return decorator


_LOADED = False


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every operator module so its ``@register`` calls populate
    REGISTRY, then return it."""
    global _LOADED
    if not _LOADED:
        # Imports are side-effecting registrations.
        from geospatial_data_lake_spark.operators import (  # noqa: F401
            aggregates,
            dedup,
            extended,
            filters,
            geo,
            joins,
            multimodal,
            scans,
            setops,
            similarity,
            sorts,
            streaming_queries,
            textops,
            tpch_suite,
            udafs,
            windows,
        )
        from geospatial_data_lake_spark.functions import scalars  # noqa: F401

        _LOADED = True
    return REGISTRY
