"""As-of join — SURVEY.md J9.

Spark has no native ASOF JOIN; the scalable composition is the union+window
trick: tag both sides, union, sort within each key partition by (ts,
side-tiebreak, right-row tiebreak), and carry the last right-side row
forward with ``last(..., ignorenulls=True)``. One shuffle on the join key,
no broadcast-nested-loop blowup, works at any size (the per-key partition
is processed by a single window — salt the key if one entity dominates).

Semantics: for each left row, the right row with the greatest ``right_ts``
strictly less than ``left_ts`` within the same key group; ties on
``right_ts`` are broken by the greatest ``right_order`` value, and the
matched right row is carried *atomically* (one struct), so NULLs in
individual right columns can never splice values from two different right
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    strict: bool = True,
    right_order: str | None = None,
) -> DataFrame:
    """Return ``left`` with, for each row, the latest preceding right-side
    values (NULL when no right row precedes it).

    ``strict=True`` means right_ts < left_ts (a right row at exactly the
    same timestamp is *not* matched) — ordering places left rows before
    right rows at equal timestamps.

    ``right_order`` names a right-side column used as a deterministic
    tie-break among right rows sharing (key, right_ts): the row with the
    *greatest* value wins (mirroring ``ORDER BY ts DESC, id DESC LIMIT 1``
    lookup semantics). Without it, ties resolve arbitrarily — pass a
    unique id whenever the right timestamp is not unique per key.

    The matched right row travels as one struct, so all ``asof_*`` output
    columns always come from the same right row even when some of its
    fields are NULL.
    """
    struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )
    left_tagged = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__is_left", F.lit(1))
        .withColumn("__tie", F.lit(None).cast("long"))
        .withColumn("__asof_row", F.lit(None).cast(struct_type))
    )
    tie_col = (
        F.col(right_order).cast("long") if right_order is not None else F.lit(0)
    )
    right_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        tie_col.alias("__tie"),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("__asof_row"),
    )
    for col in left.columns:
        if col not in on and col not in (left_ts,):
            right_tagged = right_tagged.withColumn(
                col, F.lit(None).cast(left.schema[col].dataType)
            )

    unioned = left_tagged.unionByName(right_tagged, allowMissingColumns=True)

    # At equal __ts: left first (so a strictly-simultaneous right row is not
    # yet visible to last()); non-strict mode orders right first. Among
    # right rows at the same __ts, __tie ascending puts the greatest
    # right_order value last, so last() picks it deterministically.
    side_order = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), side_order, F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__asof_carried", F.last(F.col("__asof_row"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_left") == 1)
    for col in right_value_cols:
        out = out.withColumn(f"asof_{col}", F.col("__asof_carried").getField(col))
    return out.drop("__ts", "__is_left", "__tie", "__asof_row", "__asof_carried")
