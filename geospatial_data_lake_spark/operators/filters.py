"""Projection / predicate operators — SURVEY.md §2.2 (P1-P8).

All predicates are Catalyst expressions (JVM, codegen'd, pushed down);
the only Python is P8's JSON-Schema validator, a vectorized pandas UDF
(the reference's per-row jsonschema.validate —
backend/check_stac_metadata/utils.py:104-116)."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


@register(
    "p01_projection_rename",
    oracle="""
        SELECT c_custkey AS id, c_name AS title, c_acctbal AS balance
        FROM customer WHERE c_acctbal < 0
    """,
    tags=("filter", "P1"),
)
def p01_projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with column rename (ref: as_dict() pk->id rewrite,
    backend/datasets_model.py:57-66)."""
    t = tables(spark, sf_dir)
    return t.customer.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("title"),
        F.col("c_acctbal").alias("balance"),
    )


@register(
    "p04_regex_predicate",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE regexp_matches(p_name, '^(red|blue) [a-z]+$')
    """,
    tags=("filter", "P4", "F14"),
)
def p04_regex_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate (ref: title pattern ^[A-Za-z0-9_-]+$,
    backend/datasets/create.py:11-12). rlike evaluates in the JVM."""
    t = tables(spark, sf_dir)
    return t.part.filter(F.col("p_name").rlike("^(red|blue) [a-z]+$")).select(
        "p_partkey", "p_name"
    )


@register(
    "p05_null_predicate",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(nullif(l_tax, 0.0)) AS BIGINT) AS n_taxed,
               CAST(sum(CASE WHEN nullif(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_untaxed
        FROM lineitem
    """,
    tags=("filter", "P5"),
)
def p05_null_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null / existence predicate (ref: multihash null <=> METADATA row,
    backend/processing_assets_model.py:21). The fixture has no native nulls,
    so nullif() synthesizes them; count() skipping nulls and an IS NULL
    predicate both exercised."""
    t = tables(spark, sf_dir)
    taxed = F.nullif(F.col("l_tax"), F.lit(0.0))
    return t.lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(taxed).alias("n_taxed"),
        F.sum(F.when(taxed.isNull(), 1).otherwise(0)).cast("bigint").alias("n_untaxed"),
    )


@register(
    "p06_range_predicate",
    oracle="""
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20 AND CAST(l_orderkey % 10 AS BIGINT) = 0
        GROUP BY l_returnflag
    """,
    tags=("filter", "P6", "F13"),
)
def p06_range_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric range + modulo predicate (ref: iteration_size in [1,10000],
    next_item multipleOf, backend/content_iterator/task.py:17-27,44)."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            F.col("l_quantity").between(10, 20) & ((F.col("l_orderkey") % 10) == 0)
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "p07_conjunctive_predicate",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderstatus = 'O'
          AND o_orderpriority LIKE '1%'
          AND o_totalprice > 100000
    """,
    tags=("filter", "P7", "P2", "P3"),
)
def p07_conjunctive_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction of equality, prefix, and range predicates (ref:
    count(hash_key=..., range_key_condition=...),
    backend/content_iterator/task.py:54-59)."""
    t = tables(spark, sf_dir)
    return t.orders.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_orderpriority").startswith("1")
        & (F.col("o_totalprice") > 100000)
    ).select("o_orderkey", "o_totalprice")


_PROPS_FIELD = T.StructType(
    [
        T.StructField("valid", T.BooleanType()),
    ]
)


@F.pandas_udf(T.BooleanType())
def _props_schema_valid(props: pd.Series) -> pd.Series:
    """Vectorized JSON-Schema-style predicate: parses as an object carrying
    an integer field 'k' >= 0. Mirrors the reference's jsonschema.validate
    dispatch (backend/check_stac_metadata/utils.py:104-116) as an
    Arrow-batched kernel — no per-row Python round trips."""

    def check(s: object) -> bool:
        if not isinstance(s, str):
            return False
        try:
            doc = json.loads(s)
        except ValueError:
            return False
        return isinstance(doc, dict) and isinstance(doc.get("k"), int) and doc["k"] >= 0

    return props.map(check)


@register(
    "p08_schema_validity_predicate",
    oracle="""
        SELECT
            (props IS NOT NULL AND json_valid(props)
             AND json_type(json_extract(props, '$.k')) IN ('BIGINT', 'UBIGINT')
             AND CAST(json_extract(props, '$.k') AS BIGINT) >= 0) AS valid,
            CAST(count(*) AS BIGINT) AS n
        FROM events
        GROUP BY 1
    """,
    tags=("filter", "P8", "X1"),
)
def p08_schema_validity_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-validity predicate routing rows to pass/fail (ref:
    jsonschema.validate per doc, backend/check_stac_metadata/utils.py:104-116).
    Python is unavoidable (JSON Schema), so it runs as a pandas UDF."""
    t = tables(spark, sf_dir)
    return (
        t.events.select(_props_schema_valid(F.col("props")).alias("valid"))
        .groupBy("valid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
