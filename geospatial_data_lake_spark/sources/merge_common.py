"""MERGE semantics shared by both table engines.

`sources/versioned.py` (full-snapshot catalog tables) and
`sources/manifest_table.py` (manifest-based fact tables) implement the
same SQL MERGE/DELETE contract over different storage layouts; the
pieces that define that contract live here once, so the two engines
cannot drift apart:

- key matching is NULL-SAFE (a plain equi-join never matches
  NULL = NULL, so an old NULL-keyed row would survive alongside its
  replacement);
- DELETE removes only rows where the predicate is TRUE — rows where it
  evaluates to NULL survive (hence coalesce, not a bare NOT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_safe_key_join(
    left: DataFrame, updates: DataFrame, key_cols: list[str], how: str
) -> DataFrame:
    """left_anti / left_semi of ``left`` against the update keys with
    null-safe equality; the key side broadcasts (MERGE batches are
    small relative to the table)."""
    keys = updates.select(*key_cols).alias("__u")
    lhs = left.alias("__l")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & F.col(f"__l.{k}").eqNullSafe(F.col(f"__u.{k}"))
    return lhs.join(keys.hint("broadcast"), cond, how)


def keep_unmatched(df: DataFrame, condition: Column) -> DataFrame:
    """SQL DELETE survivor set: drop TRUE-predicate rows only."""
    return df.filter(~F.coalesce(condition, F.lit(False)))
