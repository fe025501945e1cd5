"""Scalar-function catalog — SURVEY.md §2.8 (F1-F14).

Every function here is a JVM-side Catalyst expression (whole-stage codegen);
regexes are shared verbatim with the DuckDB oracle so semantics align
byte-for-byte. The reference performs all of these per record in Python
(citations on each query)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


@register(
    "f01_url_parse",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   's3://bucket-' || source || '/data/' || CAST(doc_id AS VARCHAR)
                       || '/part-' || CAST(doc_id AS VARCHAR) || '.json' AS url
            FROM documents
        )
        SELECT doc_id, url,
               regexp_extract(url, '^s3://([^/]+)/(.+)$', 1) AS bucket,
               regexp_extract(url, '^s3://([^/]+)/(.+)$', 2) AS key,
               regexp_extract(url, '([^/]+)$', 1) AS basename,
               regexp_replace(url, '/[^/]*$', '') AS dirname
        FROM u
    """,
    tags=("scalar", "F1", "F3"),
)
def f01_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parse -> bucket/key/basename/dirname (ref: urlparse().netloc /
    .path[1:] at backend/check_stac_metadata/task.py:21-24; basename/dirname
    at backend/import_dataset/task.py:104)."""
    t = tables(spark, sf_dir)
    url = F.concat(
        F.lit("s3://bucket-"),
        F.col("source"),
        F.lit("/data/"),
        F.col("doc_id").cast("string"),
        F.lit("/part-"),
        F.col("doc_id").cast("string"),
        F.lit(".json"),
    )
    df = t.documents.select("doc_id", url.alias("url"))
    return df.select(
        "doc_id",
        "url",
        F.regexp_extract("url", r"^s3://([^/]+)/(.+)$", 1).alias("bucket"),
        F.regexp_extract("url", r"^s3://([^/]+)/(.+)$", 2).alias("key"),
        F.regexp_extract("url", r"([^/]+)$", 1).alias("basename"),
        F.regexp_replace("url", r"/[^/]*$", "").alias("dirname"),
    )


@register(
    "f02_href_resolve",
    oracle="""
        WITH h AS (
            SELECT doc_id,
                   's3://staging/' || source AS parent_dir,
                   CASE WHEN doc_id % 3 = 0
                        THEN 's3://absolute/already/item-' || CAST(doc_id AS VARCHAR) || '.json'
                        ELSE 'relative/item-' || CAST(doc_id AS VARCHAR) || '.json'
                   END AS href
            FROM documents
        )
        SELECT doc_id, href,
               CASE WHEN href LIKE 's3://%' THEN href
                    ELSE parent_dir || '/' || href END AS resolved
        FROM h
    """,
    tags=("scalar", "F2"),
)
def f02_href_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative->absolute href resolution (ref: prefix relative hrefs with
    dirname(parent_url), backend/check_stac_metadata/utils.py:43-48)."""
    t = tables(spark, sf_dir)
    h = t.documents.select(
        "doc_id",
        F.concat(F.lit("s3://staging/"), F.col("source")).alias("parent_dir"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("s3://absolute/already/item-"),
                F.col("doc_id").cast("string"),
                F.lit(".json"),
            ),
        )
        .otherwise(
            F.concat(F.lit("relative/item-"), F.col("doc_id").cast("string"), F.lit(".json"))
        )
        .alias("href"),
    )
    return h.select(
        "doc_id",
        "href",
        F.when(F.col("href").startswith("s3://"), F.col("href"))
        .otherwise(F.concat(F.col("parent_dir"), F.lit("/"), F.col("href")))
        .alias("resolved"),
    )


@register(
    "f04_composite_key_roundtrip",
    oracle="""
        WITH k AS (
            SELECT o_orderkey,
                   'DATASET#' || CAST(o_custkey AS VARCHAR) || '#VERSION#'
                       || CAST(o_orderkey AS VARCHAR) AS pk
            FROM orders
        )
        SELECT o_orderkey, pk,
               split_part(pk, '#', 2) AS dataset_id,
               split_part(pk, '#', 4) AS version_id
        FROM k
    """,
    tags=("scalar", "F4"),
)
def f04_composite_key_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key build + split round trip (ref: f"DATASET#{id}#VERSION#{v}"
    at backend/check_stac_metadata/task.py:50; sk.split("#") at
    backend/import_status/get.py:127)."""
    t = tables(spark, sf_dir)
    k = t.orders.select(
        "o_orderkey",
        F.concat_ws(
            "#",
            F.lit("DATASET"),
            F.col("o_custkey").cast("string"),
            F.lit("VERSION"),
            F.col("o_orderkey").cast("string"),
        ).alias("pk"),
    )
    parts = F.split(F.col("pk"), "#")
    return k.select(
        "o_orderkey",
        "pk",
        parts.getItem(1).alias("dataset_id"),
        parts.getItem(3).alias("version_id"),
    )


@register(
    "f05_multihash_decode",
    oracle="""
        WITH mh AS (
            SELECT doc_id, '1220' || sha256(text) AS multihash FROM documents
        )
        SELECT doc_id, multihash,
               CASE substr(multihash, 1, 2)
                    WHEN '12' THEN 18 WHEN '13' THEN 19 ELSE -1 END AS hash_fn_code,
               CAST(strlen(multihash) / 2 - 2 AS BIGINT) AS digest_bytes,
               substr(multihash, 5) AS digest_hex
        FROM mh
    """,
    tags=("scalar", "F5", "F6"),
)
def f05_multihash_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multihash prefix decode (ref: int(hex[:2],16) selects the hash fn,
    bytes.fromhex for the digest, backend/check_files_checksums/utils.py:98-105).
    sha2-256 code 0x12 = 18, length 0x20 = 32 bytes."""
    t = tables(spark, sf_dir)
    mh = t.documents.select(
        "doc_id",
        F.concat(F.lit("1220"), F.sha2(F.col("text").cast("binary"), 256)).alias(
            "multihash"
        ),
    )
    prefix = F.substring("multihash", 1, 2)
    return mh.select(
        "doc_id",
        "multihash",
        F.when(prefix == "12", 18).when(prefix == "13", 19).otherwise(-1).alias(
            "hash_fn_code"
        ),
        (F.length("multihash") / 2 - 2).cast("bigint").alias("digest_bytes"),
        F.expr("substring(multihash, 5)").alias("digest_hex"),
    )


@register(
    "f07_datetime_functions",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS d,
               CAST(date_part('year',  o_orderdate) AS BIGINT) AS y,
               CAST(date_part('month', o_orderdate) AS BIGINT) AS m,
               CAST(date_part('dow',   o_orderdate) AS BIGINT) AS dow,
               CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
                   AS days_since_epoch_start,
               strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m
        FROM orders
        WHERE o_orderkey % 10 = 0
    """,
    tags=("scalar", "F7"),
)
def f07_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp formatting / parts / arithmetic (ref: datetime.now, ISO
    format, strftime for ULID prefixes — backend/clock.py:4-5,
    backend/datasets_model.py:22). DuckDB dow: Sunday=0; Spark dayofweek:
    Sunday=1 — aligned by subtracting 1."""
    t = tables(spark, sf_dir)
    return t.orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).cast("bigint").alias(
            "days_since_epoch_start"
        ),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus3m"),
    )


@register(
    "f08_version_id_mint",
    oracle="""
        SELECT event_id,
               strftime(ts, '%Y-%m-%dT%H-%M-%S') || '_' ||
                   substr(md5(CAST(event_id AS VARCHAR)), 1, 16) AS version_id
        FROM events
        WHERE event_id % 20 = 0
    """,
    tags=("scalar", "F8"),
)
def f08_version_id_mint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sortable version-id minting (ref: ULID from timestamp, human-readable
    formatting, backend/datasets_model.py:13-23,
    backend/dataset_versions/create.py:58-59). Timestamp prefix keeps ids
    lexicographically time-ordered; md5 suffix stands in for the randomness
    component (deterministic here for oracle parity)."""
    t = tables(spark, sf_dir)
    return t.events.filter(F.col("event_id") % 20 == 0).select(
        "event_id",
        F.concat(
            F.date_format("ts", "yyyy-MM-dd'T'HH-mm-ss"),
            F.lit("_"),
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 16),
        ).alias("version_id"),
    )


@register(
    "f12_case_mapping",
    oracle="""
        SELECT o_orderkey,
               CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finished'
                    WHEN 'P' THEN 'Partial' ELSE 'Unknown' END AS status_label,
               upper(o_orderpriority) AS prio_upper,
               lower(o_orderpriority) AS prio_lower,
               lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded_key
        FROM orders
        WHERE o_orderkey % 7 = 0
    """,
    tags=("scalar", "F12"),
)
def f12_case_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum mapping + string casing/padding (ref: status .title() and
    success->outcome mapping, backend/import_status/get.py:32-36,88)."""
    t = tables(spark, sf_dir)
    return t.orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "Open")
        .when(F.col("o_orderstatus") == "F", "Finished")
        .when(F.col("o_orderstatus") == "P", "Partial")
        .otherwise("Unknown")
        .alias("status_label"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.lower("o_orderpriority").alias("prio_lower"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded_key"),
    )


@register(
    "f13_rolling_hash",
    oracle="""
        WITH s AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        w AS (
            SELECT doc_id, toks[pos] AS word, pos
            FROM s, generate_series(1, 8) g(pos)
            WHERE pos <= len(toks)
        )
        SELECT doc_id,
               CAST(sum(ascii(word) * CAST(power(31, 8 - pos) AS BIGINT)) AS BIGINT)
                   AS fingerprint
        FROM w
        GROUP BY doc_id
    """,
    tags=("scalar", "F13", "fingerprint"),
)
def f13_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint over the first 8 tokens
    (training-data op: cheap document fingerprinting; arithmetic parity for
    F13). posexplode keeps the position for the 31^(8-pos) weights."""
    t = tables(spark, sf_dir)
    words = t.documents.select(
        "doc_id", F.posexplode(F.slice(F.split("text", " "), 1, 8)).alias("pos0", "word")
    )
    return (
        words.select(
            "doc_id",
            (
                F.ascii("word")
                * F.pow(F.lit(31.0), F.lit(8.0) - (F.col("pos0") + 1)).cast("bigint")
            ).alias("term"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term").cast("bigint").alias("fingerprint"))
    )
