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


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    spark_pdf = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()

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
