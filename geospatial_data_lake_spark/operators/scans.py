"""Scan / source operators — SURVEY.md §2.1 (S1-S6, S11).

Reference behaviors re-expressed Spark-first:

- S1 point lookup  (`backend/datasets/get.py:42-44`): a DynamoDB
  ``Model.get`` becomes a predicate-pushdown point read — the filter reaches
  the parquet scan (``PushedFilters``) so only matching row groups are read.
  At 100 TB with the table Z-ordered / partitioned on the key this is a
  single-file point query, not a scan.
- S2 filtered scan  (`backend/datasets/list.py:14-16`)
- S3 secondary-index scan (`backend/datasets/get.py:73`): no index needed —
  min/max column statistics in parquet footers give data skipping.
- S4 prefix/range scan on sort key (`backend/import_dataset/task.py:93-98`)
- S5 JSON field source (`backend/check_stac_metadata/utils.py:132-152`)
- S6 binary content digest (`backend/check_files_checksums/utils.py:87-103`)
- S11 parquet scan with projection+filter pushdown (capability-parity row)
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


@register(
    "s01_point_lookup",
    oracle="""
        SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM customer WHERE c_custkey = 42
    """,
    tags=("scan", "S1"),
)
def s01_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point get by primary key (ref: backend/datasets/get.py:42-44).

    Scale: filter is pushed into the parquet scan; with key-ordered files
    this touches one row group via min/max stats."""
    t = tables(spark, sf_dir)
    return t.customer.filter(F.col("c_custkey") == 42).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )


@register(
    "s02_filtered_scan",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderpriority
        FROM orders WHERE o_orderpriority LIKE '1%'
    """,
    tags=("scan", "S2", "P3"),
)
def s02_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan with string-prefix filter (ref: backend/datasets/list.py:14-16,
    startswith scan). StartsWith is pushed to parquet as a range predicate."""
    t = tables(spark, sf_dir)
    return t.orders.filter(F.col("o_orderpriority").startswith("1")).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )


@register(
    "s03_secondary_index_scan",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    tags=("scan", "S3"),
)
def s03_secondary_index_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary-index equality lookup (ref GSI query backend/datasets/get.py:73).
    Columnar stats replace the GSI: equality filter on a non-key column still
    prunes row groups."""
    t = tables(spark, sf_dir)
    return t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )


@register(
    "s04_prefix_range_scan",
    oracle="""
        SELECT event_id, user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        FROM events
        WHERE user_id = 7 AND event_type LIKE 'c%'
    """,
    tags=("scan", "S4", "P7"),
)
def s04_prefix_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key prefix scan (ref: query(pk, sk.startswith(...)),
    backend/import_dataset/task.py:93-98). Conjunction of an equality and a
    prefix predicate, both pushed down."""
    t = tables(spark, sf_dir)
    return (
        t.events.filter((F.col("user_id") == 7) & F.col("event_type").startswith("c"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


@register(
    "s05_json_field_source",
    oracle="""
        SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
        FROM events WHERE json_extract(props, '$.k') IS NOT NULL
    """,
    tags=("scan", "S5", "F9"),
)
def s05_json_field_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON document field extraction (ref: json.load of S3 objects,
    backend/check_stac_metadata/utils.py:132-152; field access utils.py:103).
    ``get_json_object`` is JVM-side — no Python in the hot path."""
    t = tables(spark, sf_dir)
    return (
        t.events.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        )
        .filter(F.col("k_val").isNotNull())
    )


@register(
    "s06_content_digest",
    oracle="""
        SELECT doc_id, strlen(text) AS n_bytes, sha256(text) AS digest
        FROM documents
    """,
    tags=("scan", "S6", "F6", "A5"),
)
def s06_content_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-content digest (ref: streamed sha256 multihash check,
    backend/check_files_checksums/utils.py:83-106). Text bytes stand in for
    blob content; sha2 runs JVM-side per row. The chunked variant for
    oversized blobs lives in plans/checksums.py."""
    t = tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.sha2(F.col("text").cast("binary"), 256).alias("digest"),
    )


@register(
    "s11_pruned_scan",
    oracle="""
        SELECT l_orderkey, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1998-02-01'
    """,
    tags=("scan", "S11"),
)
def s11_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with projection + filter pushdown (capability-parity:
    the reference's storage engine is DynamoDB; ours is parquet). ReadSchema
    carries only the two projected columns; the shipdate range prunes row
    groups (and at scale, date-partitioned directories)."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-02-01")
        ).select("l_orderkey", "l_extendedprice")
    )


_ORC_DIRS: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" = (
    weakref.WeakKeyDictionary()
)


@register(
    "s12_orc_roundtrip",
    oracle="""
        SELECT p_partkey, p_name, p_brand, p_retailprice
        FROM part
        WHERE p_size >= 40
        ORDER BY p_partkey
    """,
    tags=("scan", "orc", "format"),
)
def s12_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-format interchange: the part table written to ORC (one
    partitioned write), read back through Spark's native ORC source
    with a pushed filter and pruned projection — results must be
    byte-identical to the parquet-sourced oracle.  Proves the engine is
    not parquet-bound: every operator runs unchanged over any
    DataSource V2 format, and ORC carries the same footer min/max
    stats, so the p_size predicate still skips stripes at scale."""
    import os
    import tempfile

    cache = _ORC_DIRS.setdefault(spark, {})
    if sf_dir not in cache:
        out = os.path.join(tempfile.mkdtemp(prefix="gdl_orc_"), "part")
        tables(spark, sf_dir).part.write.orc(out)
        cache[sf_dir] = out
    return (
        spark.read.orc(cache[sf_dir])
        .filter(F.col("p_size") >= 40)
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    )
