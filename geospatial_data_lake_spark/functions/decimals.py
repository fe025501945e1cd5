"""Cross-engine deterministic money aggregation.

Summing doubles is order-dependent: Spark's partial aggregation adds in a
different order than DuckDB's, so two exactly-correct engines can disagree
in the last ulp — and ``round(sum(double), 2)`` then flips a half-cent
boundary (observed: j02 at sf0.01, 5 of 1,290 groups off by ±0.01).

Fix: sum in **decimal**.  Decimal addition is exact, hence
order-independent, so both engines produce bit-identical sums no matter
how the partial aggregates are scheduled.  The input cast
``double -> decimal`` is itself deterministic and was verified identical
between Spark and DuckDB on every money/value column of the fixture data
at sf0.01 and sf0.1 (zero mismatches; see round-2 notes).

Conventions (mirror these in the oracle SQL):

- money columns (prices, discounts, taxes): ``DECIMAL(18,4)``;
- metric columns (``events.value``): ``DECIMAL(28,10)`` (more fractional
  digits in the raw data);
- final output: ``round(sum(dec), s)`` **cast back to double** so the
  published schema keeps the reference's double-typed money columns.
  Oracle twin: ``CAST(round(sum(CAST(x AS DECIMAL(18,4))), s) AS DOUBLE)``.
- averages: decimal sum divided as doubles —
  ``round(CAST(sum(dec) AS DOUBLE) / count(x), s)`` on both sides
  (DuckDB's ``avg(DECIMAL)`` returns double via a different path, so the
  explicit sum/count form is the only portable spelling).

At 100 TB scale decimal aggregation stays whole-stage-codegen'd JVM work
(Spark's Decimal uses a long for <= 18 digits); the cost over double sums
is noise compared to the shuffle, and partial aggregation still applies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,4)"
METRIC = "decimal(28,10)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    """Cast a double column to the exact decimal type used for summing."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def one(typ: str = MONEY) -> Column:
    return F.lit(1).cast(typ)


def dec_revenue() -> Column:
    """``l_extendedprice * (1 - l_discount)`` in exact decimal — the TPC-H
    revenue term. Oracle twin:
    ``CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))``."""
    return dec("l_extendedprice") * (one() - dec("l_discount"))


def dsum(expr: Column | str, scale: int = 2, typ: str = MONEY) -> Column:
    """Order-independent rounded sum, published as double."""
    c = F.col(expr).cast(typ) if isinstance(expr, str) else expr
    return F.round(F.sum(c), scale).cast("double")


def davg(col: str, scale: int = 4, typ: str = MONEY) -> Column:
    """Order-independent rounded average, published as double: exact
    decimal sum cast to double, divided by the non-null count."""
    return F.round(
        F.sum(dec(col, typ)).cast("double") / F.count(F.col(col)), scale
    ).cast("double")


# Oracle SQL fragments (DuckDB spellings of the same conventions).
SQL_REVENUE = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"


def sql_dsum(inner: str, alias: str, scale: int = 2) -> str:
    return f"CAST(round(sum({inner}), {scale}) AS DOUBLE) AS {alias}"
