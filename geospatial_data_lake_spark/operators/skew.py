"""Skew-mitigation primitives.

AQE's skew-join splitting handles storage-level skew, but a groupBy whose
key distribution is power-law (one URL, one dataset, one n-gram dominating)
still funnels each hot key through a single reduce task — the map-side
partial agg helps only when upstream partitions are many. ``two_stage_agg``
makes the mitigation explicit and plan-stable: stage 1 aggregates on
(key, salt) spreading each hot key over ``n_salts`` tasks; stage 2 merges
the per-salt partials. Works for any associative aggregate; the classic
salting pattern every large pipeline eventually needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-stage aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Equivalent to
    ``df.groupBy(keys).agg(...)`` but immune to hot-key reduce skew.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (
                F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(F.col(src))
            ).alias(out)
            for out, (src, fn) in aggs.items()
        ]
    )
    merge_cols: list[Column] = [
        _MERGE[fn](F.col(out)).alias(out) for out, (_, fn) in aggs.items()
    ]
    return stage1.groupBy(*keys).agg(*merge_cols)
