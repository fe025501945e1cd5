"""Every registered query with an oracle must match DuckDB — the local
mirror of the driver's t2 correctness gate (at sf0.001 for speed; the
driver runs sf0.01)."""

from __future__ import annotations

import pytest

from geospatial_data_lake_spark import load_all_queries
from tests.oracle import compare

QUERIES = load_all_queries()


@pytest.mark.parametrize(
    "name", [n for n, s in sorted(QUERIES.items()) if s.oracle is not None]
)
def should_match_oracle(name, spark, sf_dir):
    spec = QUERIES[name]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


@pytest.mark.parametrize(
    "name", [n for n, s in sorted(QUERIES.items()) if s.oracle is None]
)
def should_run_rows_only_queries(name, spark, sf_dir):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def should_fail_on_hugeint_typed_oracle(spark, sf_dir):
    """Regression for r5's pk01: an oracle whose column types HUGEINT
    (DuckDB's SUM/window-sum output) must fail the local gate even when
    every VALUE matches — the driver's hash is typed and r5 proved the
    stringly-canonicalized compare alone is blind to this bug class."""
    df = spark.range(3).selectExpr("CAST(id AS BIGINT) AS total")
    hugeint_oracle = (
        "SELECT SUM(v) AS total FROM (VALUES (0),(1),(2)) t(v) GROUP BY v"
    )
    with pytest.raises(AssertionError, match="HUGEINT"):
        compare(df, hugeint_oracle, sf_dir)
    fixed_oracle = (
        "SELECT CAST(SUM(v) AS BIGINT) AS total "
        "FROM (VALUES (0),(1),(2)) t(v) GROUP BY v"
    )
    compare(df, fixed_oracle, sf_dir)


def should_fail_on_float_vs_integer_oracle(spark, sf_dir):
    """A DOUBLE-typed oracle column against a Spark BIGINT column must
    fail the typed gate even when values canonicalize identically."""
    df = spark.range(2).selectExpr("CAST(id AS BIGINT) AS v")
    with pytest.raises(AssertionError, match="type-class"):
        compare(df, "SELECT CAST(v AS DOUBLE) AS v FROM (VALUES (0),(1)) t(v)", sf_dir)
