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


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted skew join: spread a hot probe key over ``n_salts`` tasks.

    The probe side gets a random salt per row; the build side replicates
    each row across ALL salts (explode of a literal range — build-side
    cost × n_salts, the standard trade); the join key becomes
    (keys..., salt), so one hot key's probe rows hash to n_salts
    different reduce tasks instead of one.  Output is row-identical to
    the unsalted join for ``inner`` and ``left`` joins (the salt never
    filters anything — every probe salt finds its replicated build row).

    AQE's skew-join splitting covers sort-merge joins adaptively; this
    explicit form is for when the plan must be stable (broadcast is too
    big, AQE disabled, or a downstream stage keys on the same columns
    and re-skews).  The salt uses ``rand`` — join RESULTS never depend
    on salt values, so nondeterministic salting is semantically safe.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_probe = probe.withColumn(
        "__salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    replicated_build = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_probe.join(replicated_build, [*keys, "__salt"], how)
    return out.drop("__salt")
