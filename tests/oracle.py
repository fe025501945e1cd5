"""DuckDB-oracle comparison harness — mirrors the driver's t2 gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and values
(order-insensitive, tolerant only to float representation)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

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


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize values to strings for order-insensitive compare
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            # full shortest-roundtrip repr: bit-identical doubles or bust.
            # (%.6g previously masked 7th-digit drift the driver's hash
            # caught — the decimal-sum convention makes exact match the bar.)
            return repr(v)
        if isinstance(v, bool):
            return str(bool(v))
        return str(v)

    out = df.apply(lambda col: col.map(canon))
    return out.sort_values(by=list(out.columns), ignore_index=True)


# DuckDB logical type classes acceptable for each Spark simpleString type.
# The driver's value hash is TYPED: an oracle column that comes back HUGEINT
# (DuckDB's type for SUM(BIGINT) and integer window sums) hashes differently
# from Spark's BIGINT even when every value is identical — r5's pk01 failed
# exactly this way while the stringly-canonicalized local gate passed.  So
# the local mirror now fails on type-class mismatches before values are
# even compared.
_INTEGRAL_DUCK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
_SPARK_TO_DUCK: dict[str, set[str]] = {
    "tinyint": _INTEGRAL_DUCK,
    "smallint": _INTEGRAL_DUCK,
    "int": _INTEGRAL_DUCK,
    "bigint": _INTEGRAL_DUCK,
    # DECIMAL fetches to float64 in pandas, so it is hash-compatible with
    # a Spark double (unlike HUGEINT, which pandas-converts differently
    # from int64)
    "float": {"FLOAT", "DOUBLE", "DECIMAL"},
    "double": {"FLOAT", "DOUBLE", "DECIMAL"},
    "boolean": {"BOOLEAN"},
    "string": {"VARCHAR"},
    "date": {"DATE"},
}


def check_types(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Fail if any oracle column's DuckDB logical type is outside the
    class of the matching Spark column's type (HUGEINT vs BIGINT, DOUBLE
    vs BIGINT, ...).  Decimal/timestamp/nested Spark columns are skipped:
    the registry's determinism rules already string-format those."""
    con = duckdb_connection(sf_dir)
    try:
        rel = con.sql(oracle_sql)
        duck_types = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
    finally:
        con.close()
    spark_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    problems = []
    for col, stype in spark_types.items():
        dtype = duck_types.get(col)
        if dtype is None:
            continue  # column-set mismatch is reported by compare()
        if dtype in ("HUGEINT", "UHUGEINT"):
            problems.append(f"{col}: oracle={dtype} (never hash-compatible)")
            continue
        allowed = _SPARK_TO_DUCK.get(stype)
        if allowed is not None and dtype.split("(")[0] not in allowed:
            problems.append(f"{col}: spark={stype} oracle={dtype}")
    assert not problems, "oracle/spark type-class mismatch: " + "; ".join(problems)


def _coerce_fast(df: pd.DataFrame) -> pd.DataFrame | None:
    """Dtype-normalize for the vectorized fast path; None = not eligible
    (unusual dtypes fall back to the authoritative canon compare)."""
    out = {}
    for c in df.columns:
        col = df[c]
        kind = col.dtype.kind
        try:
            if kind in "iu":
                out[c] = col.astype("int64")
            elif kind == "f":
                out[c] = col.astype("float64")
            elif kind == "b":
                out[c] = col.astype("bool")
            elif kind == "O" or str(col.dtype) == "string":
                out[c] = col.astype("string")
            else:
                return None  # datetimes/categoricals etc.: canon path
        except (TypeError, ValueError):
            return None
    return pd.DataFrame(out) if out else pd.DataFrame(index=df.index)


def _fast_equal(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> bool:
    """Vectorized order-insensitive equality — column sort + row sort +
    DataFrame.equals.  STRICTER than the canon compare (no int/float
    unification), so a True here implies the canon compare would pass;
    any False or ineligibility falls through to canon.  Exists because
    the per-value Python canon costs minutes on million-row outputs
    (the sf0.1 sweep's dominant cost) where this takes seconds."""
    s = _coerce_fast(spark_pdf.reindex(sorted(spark_pdf.columns), axis=1))
    o = _coerce_fast(oracle_pdf.reindex(sorted(oracle_pdf.columns), axis=1))
    if s is None or o is None or list(s.dtypes) != list(o.dtypes):
        return False
    try:
        s = s.sort_values(by=list(s.columns), ignore_index=True)
        o = o.sort_values(by=list(o.columns), ignore_index=True)
    except TypeError:
        return False  # unorderable mixed objects: canon path
    return s.equals(o)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    check_types(spark_df, oracle_sql, sf_dir)
    spark_pdf = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()

    if len(spark_pdf) == len(oracle_pdf) and sorted(spark_pdf.columns) == sorted(
        oracle_pdf.columns
    ) and _fast_equal(spark_pdf, oracle_pdf):
        return

    assert len(spark_pdf) == len(oracle_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"columns mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    mismatched = (s != o).any(axis=1)
    if mismatched.any():
        idx = mismatched[mismatched].index[:5]
        raise AssertionError(
            "value mismatch, first diffs:\n"
            f"spark:\n{s.loc[idx]}\noracle:\n{o.loc[idx]}"
        )
