"""Data-layout utilities for scan efficiency at scale.

The reference gets its point-read performance from DynamoDB key/GSI
indexes (ref: backend/datasets_model.py:27-40,46-50). The columnar analog
is *layout*: partition columns prune whole directories, and Z-ordering
within files tightens parquet row-group min/max ranges so multi-column
predicates skip row groups. At 100 TB the difference between a laid-out
and an unordered table is the difference between reading gigabytes and
reading everything.

``zorder_key`` computes a Morton (bit-interleaved) code over N columns as
a pure Catalyst expression — no UDF — so ``df.repartitionByRange(zkey)
.sortWithinPartitions(zkey).write...`` produces files whose per-column
min/max ranges are hyper-rectangles, giving balanced skipping across all
keyed columns (a lexicographic sort favors only the leading column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 21  # bits per dimension; 3 cols x 21 bits fits a long


def _rank_to_unit(c: Column, lo: Column, hi: Column) -> Column:
    """Normalize a numeric column to [0, 2^_BITS) given min/max bounds."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    unit = (c.cast("double") - lo) / span
    return F.least(
        F.floor(unit * (1 << _BITS)).cast("long"), F.lit((1 << _BITS) - 1)
    )


def zorder_key_from_bounds(
    cols: list[str], bounds: dict[str, tuple[float, float]]
) -> Column:
    """Morton code over up to 3 numeric columns with CALLER-SUPPLIED
    (lo, hi) bounds per column — the deterministic core ``zorder_key``
    and ``ManifestTable.optimize(strategy="zorder")`` both build on
    (given literal bounds the expression is pure, so it can be
    re-evaluated for bucket routing and in-file sorting without
    materializing a key column).  Bit interleaving is unrolled into a
    flat codegen expression: bit i of each normalized column lands at
    position i*len(cols)+j of the key."""
    if not 1 <= len(cols) <= 3:
        raise ValueError("zorder key supports 1-3 columns")
    key = F.lit(0).cast("long")
    n = len(cols)
    for j, c in enumerate(cols):
        lo, hi = bounds[c]
        # an all-NULL (or empty-frame) column has no bounds: any finite
        # span works — its NULL rows rank NULL and route to bucket 0
        lo = 0.0 if lo is None else lo
        hi = 1.0 if hi is None else hi
        ranked = _rank_to_unit(F.col(c), F.lit(float(lo)), F.lit(float(hi)))
        for i in range(_BITS):
            bit = F.shiftright(ranked, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit.cast("long"), i * n + j)
            )
    return key


def zorder_key(df: DataFrame, cols: list[str]) -> Column:
    """Morton code over up to 3 numeric columns, bounds taken from the
    frame itself (one tiny agg job)."""
    if not 1 <= len(cols) <= 3:
        raise ValueError("zorder_key supports 1-3 columns")
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    return zorder_key_from_bounds(
        cols, {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
    )


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16
) -> None:
    """Write ``df`` as parquet laid out by Z-order over ``cols``:
    range-partitioned on the Morton key (files = disjoint key ranges)
    and sorted within each file (row groups = tight sub-ranges)."""
    zkey = zorder_key(df, cols)
    (
        df.withColumn("__z", zkey)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table: rows
    hash-partitioned into ``n_buckets`` files by ``bucket_cols`` at WRITE
    time. Two tables bucketed the same way join WITHOUT any exchange —
    the shuffle is paid once at ingest instead of on every query, the
    single biggest recurring-join optimization for fact-fact joins at
    100 TB (verified shuffle-free in tests/test_layout.py). Sorted
    buckets additionally let sort-merge join skip its sort."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
