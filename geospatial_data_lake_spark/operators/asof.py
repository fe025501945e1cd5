"""As-of join — SURVEY.md J9.

Spark has no native ASOF JOIN; the scalable composition is the union+window
trick: tag both sides, union, sort within each key partition by (ts,
side-tiebreak), and carry the last right-side row forward with
``last(..., ignorenulls=True)``. One shuffle on the join key, no
broadcast-nested-loop blowup, works at any size (the per-key partition is
processed by a single window — salt the key if one entity dominates).

Semantics: for each left row, the right row with the greatest ``right_ts``
strictly less than ``left_ts`` within the same key group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """Return ``left`` with, for each row, the latest preceding right-side
    values (NULL when no right row precedes it).

    ``strict=True`` means right_ts < left_ts (a right row at exactly the
    same timestamp is *not* matched) — ordering places left rows before
    right rows at equal timestamps.
    """
    value_aliases = [f"__asof_{c}" for c in right_value_cols]
    left_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__is_left", F.lit(1)
    )
    for col, alias in zip(right_value_cols, value_aliases):
        left_tagged = left_tagged.withColumn(alias, F.lit(None).cast(right.schema[col].dataType))
    right_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(a) for c, a in zip(right_value_cols, value_aliases)],
    )
    for col in left.columns:
        if col not in on and col not in (left_ts,):
            right_tagged = right_tagged.withColumn(col, F.lit(None).cast(left.schema[col].dataType))

    unioned = left_tagged.unionByName(right_tagged, allowMissingColumns=True)

    # At equal __ts: left first (so a strictly-simultaneous right row is not
    # yet visible to last()); non-strict mode orders right first.
    side_order = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned
    for col, alias in zip(right_value_cols, value_aliases):
        carried = carried.withColumn(
            f"asof_{col}", F.last(F.col(alias), ignorenulls=True).over(w)
        )
    return (
        carried.filter(F.col("__is_left") == 1)
        .drop("__ts", "__is_left", *value_aliases)
    )
