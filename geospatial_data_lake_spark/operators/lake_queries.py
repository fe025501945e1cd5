"""Registered queries driving the manifest-table lake engine end-to-end.

The versioned-storage subsystems (sources/manifest_table.py,
sources/versioned.py) are protocol-tested locally but — being stateful
engines rather than pure queries — never had an external correctness
row.  These queries close that gap: each one materializes a fresh
ManifestTable from the fixture data, drives a real commit sequence
(append -> MERGE -> partition-pruned delete), and returns a read whose
expected content is plain SQL over the same fixture, so the driver's
DuckDB gate checks the whole write/read path — manifest publishing,
single-job partitioned commits, NULL-safe partition routing, stats
pruning, snapshot isolation, and time travel — not just the operators.

Each invocation builds into a fresh private temp directory (a registered
query must be re-runnable; the table is a few fixture-MB and the dirs
are OS-temp, reaped with the machine).  Ref analog: the dataset-version
lifecycle create->update->read, backend/dataset_versions/create.py:58-75.
"""

from __future__ import annotations

import json
import weakref

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.operators.quality import CHI2_TAIL_SQL as _CHI2_TAIL
from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.sources.manifest_table import ManifestTable
from geospatial_data_lake_spark.tables import session_tmpdir, tables

_COLS = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]

# one build per (session, fixture): vs01 and vs02 read different versions
# of the SAME immutable history, so they can share a table — every
# version is snapshot-isolated by construction
_BUILT: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """orders -> manifest table, through the full commit sequence:
    blind append of the base data, a MERGE doubling every 100th order's
    price, and a partition-pruned delete of 'F'-status orders ending in
    3.  Partitioned by o_orderpriority (5 partitions), keyed by
    o_orderkey — keys do NOT subsume the partition spec, so the upsert
    exercises the key-location probe path."""
    cache = _BUILT.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    base = t.orders.select(*_COLS)
    mt = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_q_"),
        key_cols=["o_orderkey"],
        partition_by=["o_orderpriority"],
        stats_cols=["o_totalprice"],  # vs20 answers MIN/MAX from these
    )
    mt.append(base)  # v1
    mt.upsert(  # v2: MERGE — update rows win on key collision
        base.filter(F.col("o_orderkey") % 100 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
    )
    mt.delete_where(  # v3: TRUE-predicate rows only
        (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 10 == 3)
    )
    cache[sf_dir] = mt
    return mt


@register(
    "vs01_manifest_merge_roundtrip",
    oracle="""
        WITH merged AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderpriority
            FROM orders
        )
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM merged
        WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
          AND o_orderpriority = '1-URGENT'
    """,
    tags=("lake", "manifest", "merge", "S8-analog"),
)
def vs01_manifest_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """append + MERGE + delete into a manifest table, read back with a
    stats-pruned partition filter — the result must equal the same
    mutations replayed as plain SQL over the fixture.

    The ``where`` read plans only the files whose recorded min/max
    overlap o_orderpriority = '1-URGENT' (one partition of five) and
    re-applies the predicate, so correctness never depends on the
    stats; the doubled price is exact in binary floating point (×2), so
    the comparison is bit-strict."""
    mt = _build_lake(spark, sf_dir)
    return mt.read(where={"o_orderpriority": "1-URGENT"}).select(*_COLS)


@register(
    "vs02_manifest_time_travel",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderpriority = '5-LOW'
    """,
    tags=("lake", "manifest", "time-travel"),
)
def vs02_manifest_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``VERSION AS OF 1`` after two further mutating commits: the
    snapshot read resolves version 1's immutable file list, so the
    MERGE (v2) and DELETE (v3) must be invisible — the result is the
    original append, i.e. the fixture itself.  The ``where`` also
    proves stats pruning against a HISTORICAL manifest, not just the
    head version."""
    mt = _build_lake(spark, sf_dir)
    return mt.read(version=1, where={"o_orderpriority": "5-LOW"}).select(*_COLS)


@register(
    "vs03_manifest_change_feed",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               o_totalprice * 2 AS o_totalprice, o_orderpriority,
               'update_postimage' AS _change_type
        FROM orders
        WHERE o_orderkey % 100 = 0 AND o_totalprice <> 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
               'delete' AS _change_type
        FROM orders
        WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 3
    """,
    tags=("lake", "manifest", "cdc", "change-feed"),
)
def vs03_manifest_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``table_changes`` analog over the lake build: changes(1, 3) must
    contain exactly the MERGE's doubled-price rows as update_postimage
    and the DELETE's rows as pre-image deletes — nothing for the rows
    both commits left alone, even though their partitions were
    rewritten.  (%100 == 0 and status-F/%10 == 3 are disjoint key sets,
    so update/delete classifications never collide.)

    Scale shape: the feed reads only partitions whose manifest file
    lists differ between the two versions — O(changed partitions) —
    then one null-safe full-outer key join classifies rows; unchanged
    carried-through rows are filtered by value comparison, never
    shuffled twice."""
    mt = _build_lake(spark, sf_dir)
    return mt.changes(1, 3)


@register(
    "vs04_clustered_pruned_read",
    oracle="""
        WITH merged AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderpriority
            FROM orders
        )
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM merged
        WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
          AND o_orderkey BETWEEN 1000 AND 2000
    """,
    tags=("lake", "manifest", "optimize", "clustering"),
)
def vs04_clustered_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``OPTIMIZE`` + data skipping: after clustering the lake build by
    o_orderkey (range-bucketed sorted files, 8 per partition), a key
    range read must plan only the buckets whose min/max overlap — and
    return exactly the same rows plain SQL computes over the fixture.

    Scale shape: the clustered read touches O(matching buckets) files
    instead of O(partition); at 100 TB with 100k partitions × 8
    buckets a 1%-of-keyspace range scan plans ~1% of the files.  The
    external row pins both the rewrite's content preservation and the
    stats-pruned read path."""
    mt = _build_lake(spark, sf_dir)
    if mt.current_version() == 3:  # cluster once per build
        mt.optimize(sort_by=["o_orderkey"], target_files=8)
    return mt.read(where={"o_orderkey": (1000, 2000)}).select(*_COLS)


@register(
    "vs06_incremental_view_maintenance",
    oracle="""
        WITH merged AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderpriority
            FROM orders
        )
        SELECT o_orderpriority,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 4)
                    AS DOUBLE) AS sum_price,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM merged
        WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("lake", "cdc", "incremental", "materialized-view"),
)
def vs06_incremental_view_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental materialized-view maintenance from the change feed:
    a per-priority (sum, count) aggregate computed at v1 is advanced to
    v3 using ONLY ``changes(1, 3, preimage=True)`` — inserts and update
    post-images add, deletes and update pre-images subtract — and must
    equal the direct aggregate over the final state (the oracle).

    Sums run in exact decimal, so the incremental path is bit-identical
    to recomputation (double addition would drift by accumulation
    order).  Scale shape: the refresh reads O(changed partitions) of
    the feed plus the old aggregate — never rescans the 100 TB base
    table; this is the streaming-CDC pattern every derived table in a
    lakehouse uses."""
    from geospatial_data_lake_spark.functions.decimals import dec

    mt = _build_lake(spark, sf_dir)
    prio = "o_orderpriority"
    base = (
        mt.read(version=1)
        .groupBy(prio)
        .agg(
            F.sum(dec("o_totalprice")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        mt.changes(1, 3, preimage=True)
        .select(
            prio,
            (dec("o_totalprice") * sign.cast("decimal(18,4)")).alias("dp"),
            sign.cast("long").alias("dn"),
        )
        .groupBy(prio)
        .agg(F.sum("dp").alias("ds"), F.sum("dn").alias("dn"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        base.join(delta, prio, "full_outer")
        .select(
            prio,
            F.round(
                F.coalesce(F.col("s"), zero) + F.coalesce(F.col("ds"), zero),
                4,
            )
            .cast("double")
            .alias("sum_price"),
            (
                F.coalesce(F.col("n"), F.lit(0))
                + F.coalesce(F.col("dn"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_orders"),
        )
        .filter(F.col("n_orders") > 0)
        .orderBy(prio)
    )


_REPLACED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


@register(
    "vs07_replace_where",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderpriority <> '3-MEDIUM'
        UNION ALL
        SELECT o_orderkey, o_orderstatus,
               o_totalprice * 3 AS o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderpriority = '3-MEDIUM' AND o_orderkey % 2 = 0
    """,
    tags=("lake", "manifest", "replace-where", "S9-analog"),
)
def vs07_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INSERT OVERWRITE`` by predicate (Delta replaceWhere): the
    '3-MEDIUM' slice is atomically rebuilt from a reprocessed batch
    (even keys only, tripled price) while every other priority carries
    by file reference — the read-back must equal the slice-replaced
    fixture.  The ×3 is exact in binary floating point, so the check
    is bit-strict.

    Scale shape: the commit rewrites O(slice partitions) in one job; a
    daily-reprocess on a 100 TB table touches one day's partitions and
    a manifest document, never the table."""
    cache = _REPLACED.setdefault(spark, {})
    if sf_dir not in cache:
        t = tables(spark, sf_dir)
        base = t.orders.select(*_COLS)
        mt = ManifestTable(
            spark,
            session_tmpdir(spark, "gdl_lake_rw_"),
            key_cols=["o_orderkey"],
            partition_by=["o_orderpriority"],
        )
        mt.append(base)
        mt.overwrite_where(
            base.filter(
                (F.col("o_orderpriority") == "3-MEDIUM")
                & (F.col("o_orderkey") % 2 == 0)
            ).withColumn("o_totalprice", F.col("o_totalprice") * 3),
            F.col("o_orderpriority") == "3-MEDIUM",
        )
        cache[sf_dir] = mt
    return cache[sf_dir].read().select(*_COLS)


_BLOOMED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_bloomed_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """customer -> manifest table via four interleaved APPENDs with a
    bloom index on c_custkey: every file's key min/max spans the whole
    keyspace (append order is round-robin by ``c_custkey % 4``), so
    ONLY the blooms can discriminate a point read between files."""
    cache = _BLOOMED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    base = t.customer.select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    mt = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_bf_"),
        key_cols=["c_custkey"],
        partition_by=["c_mktsegment"],
        bloom_cols=["c_custkey"],
    )
    for b in range(4):
        mt.append(base.filter(F.col("c_custkey") % 4 == b))
    cache[sf_dir] = mt
    return mt


@register(
    "vs05_bloom_point_read",
    oracle="""
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM customer
        WHERE c_custkey IN (7, 114, 1001)
    """,
    tags=("lake", "manifest", "bloom", "S1-analog"),
)
def vs05_bloom_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Needle-in-haystack point reads against a bloom-indexed lake
    table: each probed key lives in exactly one of four interleaved
    append files whose min/max ALL overlap, so min/max stats cannot
    prune — the per-file bloom bitsets must.  The union of three point
    reads must equal the fixture rows.

    Scale shape: a key lookup on an append-heavy unclustered 100 TB
    table plans only files whose bloom admits the key — O(true
    matches + false positives) files instead of O(table); the
    re-applied predicate keeps exactness regardless of bloom
    saturation."""
    mt = _build_bloomed_lake(spark, sf_dir)
    out = None
    for k in (7, 114, 1001):
        part = mt.read(where={"c_custkey": k})
        out = part if out is None else out.unionByName(part)
    return out


_STREAMED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_streamed_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """events -> manifest table THROUGH the streaming MERGE sink: the
    fixture is re-materialized as a file-source stream, drained with
    availableNow into ``stream_upsert`` (foreachBatch -> idempotent
    txn-stamped upsert), keyed by event_id, partitioned by event_type."""
    from geospatial_data_lake_spark.streaming.lake_sink import stream_upsert

    cache = _STREAMED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    root = session_tmpdir(spark, "gdl_lake_st_")
    src = os.path.join(root, "src")
    t.events.select(
        "event_id", "user_id", "event_type", "ts", "value"
    ).repartition(4).write.parquet(src)
    mt = ManifestTable(
        spark,
        os.path.join(root, "table"),
        key_cols=["event_id"],
        partition_by=["event_type"],
    )
    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string, ts timestamp, value double"
    ).parquet(src)
    q = stream_upsert(
        stream, mt, os.path.join(root, "ckpt"), app_id="st01"
    )
    q.awaitTermination()
    cache[sf_dir] = mt
    return mt


@register(
    "st01_stream_lake_merge",
    oracle="""
        SELECT event_id, user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               value
        FROM events
        WHERE event_type = 'click'
        ORDER BY event_id
    """,
    tags=("lake", "streaming", "merge", "T1-analog"),
)
def st01_stream_lake_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming MERGE into the lake: the events fixture
    arrives as a file-source stream, each micro-batch upserted
    exactly-once (txn-stamped foreachBatch), then a stats-pruned
    partition read must return the fixture verbatim — the external
    check covers the stream source, the idempotent sink, the manifest
    commit, and the pruned read in one row.

    Scale shape: each micro-batch costs O(batch) — one partitioned
    write job + a manifest document — independent of table size; the
    read plans only files whose stats overlap event_type = 'click'."""
    mt = _build_streamed_lake(spark, sf_dir)
    return (
        mt.read(where={"event_type": "click"})
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value",
        )
        .orderBy("event_id")
    )


@register(
    "vs08_version_drift",
    oracle="""
        WITH v1c AS (
            SELECT o_orderstatus AS k, CAST(count(*) AS BIGINT) AS o1
            FROM orders GROUP BY 1
        ),
        v3c AS (
            SELECT o_orderstatus AS k, CAST(count(*) AS BIGINT) AS o2
            FROM orders
            WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
            GROUP BY 1
        ),
        c AS (
            SELECT coalesce(v1c.o1, 0) AS o1, coalesce(v3c.o2, 0) AS o2
            FROM v1c FULL JOIN v3c ON v1c.k = v3c.k
        ),
    """
    + _CHI2_TAIL,
    tags=("lake", "manifest", "time-travel", "quality", "drift"),
)
def vs08_version_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift between two TABLE VERSIONS: the chi-square homogeneity
    statistic (dq04's machinery) over the order-status distribution of
    version 1 vs the head — time travel as the baseline source for a
    drift monitor, the composition a lake makes possible ("did the last
    n commits shift the data?") without any saved snapshot of the old
    distribution.

    Scale shape: each side is a metadata-resolved snapshot scan folded
    to a CATEGORY-sized count table (partial agg); the full-outer join
    and chi-square arithmetic run on those few rows.  The MERGE's price
    doubling is invisible to the status distribution by design — only
    v3's pruned DELETE moves it, so a nonzero chi2 here isolates
    exactly the deleting commit."""
    from geospatial_data_lake_spark.operators.quality import chi2_from_counts

    mt = _build_lake(spark, sf_dir)
    v1c = (
        mt.read(version=1)
        .groupBy(F.col("o_orderstatus").alias("k"))
        .agg(F.count(F.lit(1)).alias("o1"))
    )
    v3c = (
        mt.read()
        .groupBy(F.col("o_orderstatus").alias("k"))
        .agg(F.count(F.lit(1)).alias("o2"))
    )
    c = (
        v1c.join(v3c, "k", "full_outer")
        .select(
            F.coalesce("o1", F.lit(0)).alias("o1"),
            F.coalesce("o2", F.lit(0)).alias("o2"),
        )
    )
    return chi2_from_counts(c)


_DEDUP_STREAMED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_dedup_streamed_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """documents -> dedup-gated streaming ingest: the corpus arrives as
    a 4-file file-source stream (one micro-batch per file,
    ``maxFilesPerTrigger=1``), each batch fingerprint-deduplicated
    within itself and against the table before its novel docs are
    appended.  Files are bucketed BY FINGERPRINT, so every duplicate
    group is wholly contained in one micro-batch and the final table
    state is independent of micro-batch arrival order — which is what
    lets a declarative SQL oracle check a streaming pipeline.  (The
    cross-batch rejection path, inherently order-dependent, is pinned
    by the planted-duplicate replay test in test_lake_sink.py.)"""
    from geospatial_data_lake_spark.streaming.lake_sink import (
        stream_dedup_ingest,
    )

    cache = _DEDUP_STREAMED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    root = session_tmpdir(spark, "gdl_lake_st2_")
    src = os.path.join(root, "src")
    docs = t.documents.select("doc_id", "text", "lang", "source", "n_chars")
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    )
    bucket = F.conv(F.substring(fp, 1, 1), 16, 10).cast("int") % 4
    for b in range(4):
        docs.filter(bucket == b).coalesce(1).write.mode("append").parquet(src)
    mt = ManifestTable(
        spark,
        os.path.join(root, "table"),
        key_cols=["fp"],
        partition_by=["pb"],
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_dedup_ingest(
        stream, mt, os.path.join(root, "ckpt"), app_id="st02"
    )
    q.awaitTermination()
    cache[sf_dir] = mt
    return mt


@register(
    "st02_stream_dedup_ingest",
    oracle="""
        WITH fp AS (
            SELECT doc_id, lang, source, n_chars,
                   md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                       AS fp
            FROM documents
        ),
        r AS (
            SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
                       AS rn
            FROM fp
        )
        SELECT doc_id, fp, lang, source, n_chars
        FROM r WHERE rn = 1
        ORDER BY doc_id
    """,
    tags=("lake", "streaming", "dedup", "pipeline"),
)
def st02_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup-gated corpus ingest: documents stream in as
    micro-batches, each batch is canonical-fingerprint deduplicated
    (dd02's token-set md5) within itself and against the already-
    ingested corpus, and only novel docs reach the lake table — the
    admission pipeline in front of every training corpus, externally
    checked as one row: the expected table content is exactly "first
    doc_id per fingerprint" over the fixture.

    Scale shape: see stream_dedup_ingest — per-batch cost is one
    batch-sized shuffle + a partition-pruned corpus probe + an O(batch)
    txn-stamped append; nothing scales with table size except the
    probe's touched partitions."""
    mt = _build_dedup_streamed_lake(spark, sf_dir)
    return (
        mt.read()
        .select("doc_id", "fp", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


_RESTORED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_restored_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """The rollback + governed-write lifecycle: append the base slice
    (v1), corrupt it with a bad MERGE (v2), RESTORE to v1 (v3), then
    ADD a CHECK constraint (v4) that a subsequent poisoned append must
    bounce off (no commit), and land one conforming append (v5).  The
    head must equal base + conforming rows — sensitive to restore
    correctness (the bad MERGE's update must be gone), constraint
    enforcement (the poisoned batch must be absent), and append."""
    from geospatial_data_lake_spark.plans.catalog import ValidationError

    cache = _RESTORED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    base = t.orders.select(*_COLS).filter(F.col("o_orderkey") % 3 == 0)
    extra = t.orders.select(*_COLS).filter(F.col("o_orderkey") % 3 == 1)
    mt = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_rs_"),
        key_cols=["o_orderkey"],
        partition_by=["o_orderpriority"],
    )
    mt.append(base)  # v1
    mt.upsert(  # v2: the "bad deploy" — zeroes every 9th order's price
        base.filter(F.col("o_orderkey") % 9 == 0).withColumn(
            "o_totalprice", F.lit(0.0)
        )
    )
    if mt.restore(1) != 3:  # not assert: survives python -O
        raise RuntimeError("restore did not commit as v3")
    mt.add_constraint("price_positive", "o_totalprice > 0")  # v4
    try:
        mt.append(extra.withColumn("o_totalprice", -F.col("o_totalprice")))
        raise AssertionError("poisoned batch must not commit")
    except ValidationError:
        pass
    mt.append(extra)  # v5: conforming
    cache[sf_dir] = mt
    return mt


@register(
    "vs09_restore_constrained_lifecycle",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderkey % 3 IN (0, 1)
    """,
    tags=("lake", "manifest", "restore", "constraints"),
)
def vs09_restore_constrained_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RESTORE + CHECK constraints driven end-to-end (see
    _build_restored_lake): the head state after a bad MERGE, a
    metadata-only rollback, a constraint ADD, a rejected poisoned
    append, and a conforming append must equal exactly base + extra
    fixture rows — any failure of restore (zeroed prices survive),
    enforcement (negative prices appear), or append (extra missing)
    breaks the hash.

    Scale note: the rollback re-points file lists by reference (one
    manifest write for any table size) and constraint enforcement adds
    ONE aggregation pass over each incoming batch — never a scan of
    the table."""
    mt = _build_restored_lake(spark, sf_dir)
    return mt.read().select(*_COLS)


_EQDEL: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_eqdelete_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """Merge-on-read lifecycle: append the fixture (v1), EQUALITY-
    DELETE every 7th order by key file — no partition rewrite (v2),
    then re-append every 21st order (all previously deleted) at price
    1.0 (v3).  The head must show the survivors PLUS the re-appended
    rows — sensitive to the anti-join read path AND the applies-to
    sequence rule (a delete must not tombstone later appends)."""
    cache = _EQDEL.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    base = t.orders.select(*_COLS)
    mt = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_ed_"),
        key_cols=["o_orderkey"],
        partition_by=["o_orderpriority"],
    )
    mt.append(base)  # v1
    files_v1 = mt.partition_files()
    mt.delete_where_eq(F.col("o_orderkey") % 7 == 0)  # v2: key files only
    if mt.partition_files() != files_v1:  # not assert: survives -O
        raise RuntimeError("eq-delete rewrote data files")
    mt.append(  # v3: resurrect a deleted slice with a marker price
        base.filter(F.col("o_orderkey") % 21 == 0).withColumn(
            "o_totalprice", F.lit(1.0)
        )
    )
    cache[sf_dir] = mt
    return mt


@register(
    "vs10_equality_delete_feed",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 7 <> 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, 1.0 AS o_totalprice,
               o_orderpriority
        FROM orders WHERE o_orderkey % 21 = 0
    """,
    tags=("lake", "manifest", "equality-delete", "merge-on-read"),
)
def vs10_equality_delete_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-delete (merge-on-read) lifecycle driven end-to-end (see
    _build_eqdelete_lake): O(matched keys) deletes with untouched data
    files, reads that anti-join the pending key files, and the
    sequence rule keeping later appends alive — all in one hash-gated
    head read.

    Scale note: this is the GDPR-at-100-TB shape — erasing a few keys
    per partition across years of history costs one key-file write and
    a manifest, not a rewrite of every touched partition; ``compact``
    materializes lazily on the maintenance schedule."""
    mt = _build_eqdelete_lake(spark, sf_dir)
    return mt.read().select(*_COLS)


_HIDDEN: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_hidden_partitioned_lake(
    spark: SparkSession, sf_dir: str
) -> ManifestTable:
    """events -> lake table with HIDDEN day partitioning: the writer
    never supplies the derived day column (the table derives
    day(ts) itself), and readers filter on raw ``ts``."""
    cache = _HIDDEN.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    mt = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_hp_"),
        key_cols=["event_id"],
        partition_by=["ts_day"],
        partition_transforms={"ts_day": ("day", "ts")},
    )
    mt.append(t.events.select("event_id", "user_id", "event_type", "ts", "value"))
    cache[sf_dir] = mt
    return mt


@register(
    "vs11_hidden_partition_pruned_read",
    oracle="""
        SELECT event_id, user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts <= TIMESTAMP '2024-01-09 23:59:59'
        ORDER BY event_id
    """,
    tags=("lake", "manifest", "hidden-partitioning", "S4-analog"),
)
def vs11_hidden_partition_pruned_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hidden partitioning driven end-to-end: the events log lands in a
    day(ts)-partitioned lake table WITHOUT the writer naming the
    partition column, and a raw-``ts`` range read must (a) plan only
    the two overlapping day partitions — the predicate maps through
    the monotone transform to derived-column bounds — and (b) return
    exactly the fixture's rows in that range.

    Scale note: this is the Iceberg ergonomics contract — no
    ``WHERE ts_day = ...`` double-predicate for users, no unpartitioned
    full scans when they forget it; at 100 TB a two-day slice of a
    multi-year log plans 2/~1000 partitions."""
    mt = _build_hidden_partitioned_lake(spark, sf_dir)
    lo, hi = "2024-01-08 00:00:00", "2024-01-09 23:59:59"
    planned = mt.planned_files(where={"ts": (lo, hi)})
    total = sum(len(v) for v in mt.partition_files().values())
    if len(planned) >= total:  # not assert: must survive python -O
        raise RuntimeError(
            f"hidden-partition pruning disengaged: planned {len(planned)}"
            f"/{total} files for a two-day slice"
        )
    return (
        mt.read(where={"ts": (lo, hi)})
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value",
        )
        .orderBy("event_id")
    )


# -- st03: streaming hourly-cell maintenance + volume monitor -----------------

_VOLUME_STREAMED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_volume_streamed_cells(spark, sf_dir: str) -> ManifestTable:
    """events -> streaming hourly-cell materialization: the event log
    arrives as a 4-file stream (one micro-batch per file, split by
    event_id hash — deliberately NOT time-ordered), a stateful tumbling
    1-hour windowed count runs in UPDATE mode, and each micro-batch's
    changed cells MERGE into a lake table keyed (event_type, hour).
    Update-mode emission + keyed upsert is what makes the final table
    equal the batch hourly counts for ANY arrival order — the property
    that lets a declarative SQL oracle check a streaming monitor."""
    cache = _VOLUME_STREAMED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    from geospatial_data_lake_spark.streaming.lake_sink import stream_upsert

    t = tables(spark, sf_dir)
    root = session_tmpdir(spark, "gdl_lake_st3_")
    src = os.path.join(root, "src")
    ev = t.events.select("event_id", "ts", "event_type")
    for b in range(4):
        ev.filter(F.pmod(F.xxhash64("event_id"), 4) == b).coalesce(
            1
        ).write.mode("append").parquet(src)
    mt = ManifestTable(
        spark,
        os.path.join(root, "table"),
        key_cols=["event_type", "hour"],
        partition_by=["event_type"],
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cells = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "event_type",
            F.date_format("w.start", "yyyy-MM-dd HH").alias("hour"),
            "cnt",
        )
    )
    q = stream_upsert(
        cells,
        mt,
        os.path.join(root, "ckpt"),
        app_id="st03",
        output_mode="update",
    )
    q.awaitTermination()
    cache[sf_dir] = mt
    return mt


from geospatial_data_lake_spark.operators.quality import (  # noqa: E402
    DQ07_ORACLE as _DQ07_ORACLE,
)


@register(
    "st03_stream_volume_monitor",
    # Same oracle as dq07, shared verbatim — the streaming cell
    # maintenance must land on exactly the batch hourly counts, and the
    # monitor's scoring on top is the identical deterministic
    # integer-baseline arithmetic.
    oracle=_DQ07_ORACLE,
    tags=("lake", "streaming", "quality", "anomaly"),
)
def st03_stream_volume_monitor(spark, sf_dir: str):
    """The dq07 volume monitor fed by STREAMING state: hourly cells are
    maintained by a stateful update-mode windowed count merged into a
    lake table per micro-batch (exactly-once via txn-stamped upserts),
    and the rolling z-score scoring runs over the streamed cells — the
    production deployment shape, where the monitor reads continuously
    maintained aggregates instead of rescanning the raw log.  The
    external check is end-to-end: stream -> state -> merge -> monitor
    must reproduce dq07's batch answer bit-for-bit.

    Scale shape: streaming state is one (type, hour) cell per group —
    watermark-evictable in a continuous deployment, DRIVEN by
    test_lake_sink's long-horizon replay (peak state stays a fraction
    of the cell space while the merged table still matches the batch
    answer); each micro-batch
    merges only the cells it changed (O(touched partitions)); the
    scoring window runs on the cell table, corpus-size-independent."""
    from geospatial_data_lake_spark.operators.quality import score_volume_cells

    mt = _build_volume_streamed_cells(spark, sf_dir)
    return score_volume_cells(mt.read().select("event_type", "hour", "cnt"))



# -- vs12: tagged snapshot protected across retention GC ----------------------

_TAGGED_LAKE: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_tagged_lake(spark, sf_dir: str) -> ManifestTable:
    """A small keyed table under AGGRESSIVE retention (keep_versions=2):
    v1 appends the base slice and is tagged; four further MERGE commits
    then push v1 far outside the retention window, so by the time the
    query reads, every untagged early version is GC'd — the tag is the
    only thing keeping the snapshot alive."""
    cache = _TAGGED_LAKE.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    root = session_tmpdir(spark, "gdl_lake_vs12_")
    mt = ManifestTable(
        spark,
        root,
        key_cols=["o_orderkey"],
        partition_by=["o_orderstatus"],
        keep_versions=2,
    )
    base = t.orders.filter(F.col("o_orderkey") % 50 == 0).select(*_COLS)
    mt.append(base)
    mt.tag("train-corpus")  # pins v1
    for i in range(2, 6):
        mt.upsert(
            base.withColumn("o_totalprice", F.col("o_totalprice") * i)
        )
    cache[sf_dir] = mt
    return mt


@register(
    "vs12_tagged_snapshot_read",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderkey % 50 = 0
    """,
    tags=("lake", "manifest", "tags", "time-travel"),
)
def vs12_tagged_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read an Iceberg-style NAMED TAG through retention pressure: the
    table keeps only 2 versions and has committed 4 MERGEs since the
    tag, so every untagged early snapshot is GC'd — yet
    ``read(version="train-corpus")`` must return the exact tagged state
    (the untouched base slice), proving both the named-ref resolution
    path and the GC protection that lets a training run cite the
    precise corpus it consumed long after the rolling window moved on.
    Scale shape: a tag is one ref file; protection costs GC exactly the
    tagged manifest's file set — O(1) metadata, no data copies."""
    mt = _build_tagged_lake(spark, sf_dir)
    return mt.read(version="train-corpus").select(*_COLS)


# -- vs13: write-audit-publish lifecycle --------------------------------------

_WAP_LAKE: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_wap_lake(spark, sf_dir: str) -> ManifestTable:
    """Full WAP cycle against a live table: base append (v1); a FAILED
    audit cycle first (staged MERGE poisons prices negative, the audit
    query catches it, abort — the parent must never see it); then a
    clean cycle (staged MERGE doubles the %100 keys' prices + staged
    append of a disjoint slice, audit passes, publish) — the parent
    jumps base -> audited state in ONE commit."""
    cache = _WAP_LAKE.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    root = session_tmpdir(spark, "gdl_lake_vs13_")
    mt = ManifestTable(
        spark,
        root,
        key_cols=["o_orderkey"],
        partition_by=["o_orderstatus"],
    )
    base = t.orders.filter(F.col("o_orderkey") % 3 == 0).select(*_COLS)
    mt.append(base)

    # cycle 1: poisoned MERGE caught by the audit -> abort
    bad = mt.begin_staged()
    bad.table.upsert(
        base.filter(F.col("o_orderkey") % 100 == 0).withColumn(
            "o_totalprice", -F.col("o_totalprice")
        )
    )
    n_bad = bad.table.read().filter(F.col("o_totalprice") < 0).count()
    if n_bad == 0:  # the audit must SEE the staged poison (python -O safe)
        raise RuntimeError("WAP audit failed to observe staged poison rows")
    mt.abort_staged(bad)  # ...and the parent never does

    # cycle 2: clean MERGE + append, audit passes, publish
    staged = mt.begin_staged()
    staged.table.upsert(
        base.filter(F.col("o_orderkey") % 100 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
    )
    staged.table.append(
        t.orders.filter(
            (F.col("o_orderkey") % 3 != 0) & (F.col("o_orderkey") % 7 == 0)
        ).select(*_COLS)
    )
    if staged.table.read().filter(F.col("o_totalprice") < 0).count() != 0:
        raise RuntimeError("WAP audit found poison in the clean cycle")
    mt.publish_staged(staged)
    cache[sf_dir] = mt
    return mt


@register(
    "vs13_wap_publish",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice,
               o_orderpriority
        FROM orders
        WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderkey % 3 <> 0 AND o_orderkey % 7 = 0
    """,
    tags=("lake", "manifest", "wap", "staging"),
)
def vs13_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH, externally hash-gated end-to-end: a
    poisoned staged MERGE is caught by its audit and aborted (the
    parent never sees it — checked by the final state), then a clean
    staged MERGE + append is audited and fast-forward-published as ONE
    metadata-only parent commit.  The head must equal exactly
    base-with-doubled-%100-prices plus the appended disjoint slice —
    any leak from the aborted cycle, lost staged commit, or data
    rewrite during publish breaks the hash.

    Scale shape: staging shares the parent's data directory, so
    publish/abort never move data — publish is one manifest commit
    regardless of staged volume; the audit runs ordinary reads against
    the staged snapshot (here a constraint-style scan)."""
    mt = _build_wap_lake(spark, sf_dir)
    return mt.read().select(*_COLS)


# -- vs14: named-branch divergence read ---------------------------------------

_BRANCHED_LAKE: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_branched_lake(spark, sf_dir: str) -> ManifestTable:
    """A live table plus a NAMED BRANCH diverging from it: base append
    (%4 slice); branch "audit" cut at v1; the branch triples every 20th
    key's price and appends a disjoint slice (%4!=0 and %9==0) while
    MAIN independently doubles every 40th key's price — so by read
    time the two refs have genuinely diverged (a fast-forward would
    raise CommitConflict, which is the point: the branch is an analysis
    lane, not a merge queue)."""
    cache = _BRANCHED_LAKE.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    root = session_tmpdir(spark, "gdl_lake_vs14_")
    mt = ManifestTable(
        spark,
        root,
        key_cols=["o_orderkey"],
        partition_by=["o_orderstatus"],
    )
    base = t.orders.filter(F.col("o_orderkey") % 4 == 0).select(*_COLS)
    mt.append(base)
    mt.create_branch("audit")
    b = mt.branch("audit")
    b.table.upsert(
        base.filter(F.col("o_orderkey") % 20 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 3
        )
    )
    b.table.append(
        t.orders.filter(
            (F.col("o_orderkey") % 4 != 0) & (F.col("o_orderkey") % 9 == 0)
        ).select(*_COLS)
    )
    mt.upsert(  # main advances independently of the branch
        base.filter(F.col("o_orderkey") % 40 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
    )
    cache[sf_dir] = mt
    return mt


@register(
    "vs14_branch_divergence",
    oracle="""
        WITH base AS (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_orderkey % 4 = 0
        ),
        m AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 40 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS p
            FROM base
        ),
        b AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 20 = 0 THEN o_totalprice * 3
                        ELSE o_totalprice END AS p
            FROM base
            UNION ALL
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_orderkey % 4 <> 0 AND o_orderkey % 9 = 0
        )
        SELECT COALESCE(m.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN m.o_orderkey IS NULL THEN 'branch_only'
                    WHEN m.p <> b.p THEN 'diverged'
                    ELSE 'same' END AS status,
               CAST(m.p AS DOUBLE) AS main_price,
               CAST(b.p AS DOUBLE) AS branch_price
        FROM m FULL JOIN b ON m.o_orderkey = b.o_orderkey
        ORDER BY o_orderkey
    """,
    tags=("lake", "manifest", "branch", "refs"),
)
def vs14_branch_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a NAMED BRANCH against main and report their divergence —
    the Iceberg-branch workflow tags cannot express: "audit" carries a
    writable chain (a tripled-price MERGE + a disjoint append) while
    main kept committing its own MERGE, and the query full-outer-joins
    the two ref heads into a per-key status (same / diverged /
    branch_only).  Any leak between the refs — branch commits visible
    on main, main commits visible on the branch, lost branch appends —
    changes the status histogram and breaks the hash.

    Scale shape: a branch is one ref file plus a metadata-only seeded
    chain (zero data copies — its base files are carried by
    reference); the divergence read is an ordinary key-equi full outer
    join of two snapshot reads, shuffling each side once on the join
    key.  GC safety under divergence is what the branch REF buys: the
    base snapshot both refs grew from stays pinned against parent
    retention for the branch's lifetime (pinned by the lifecycle unit
    tests)."""
    mt = _build_branched_lake(spark, sf_dir)
    m = mt.read().select(
        "o_orderkey", F.col("o_totalprice").alias("mp")
    )
    b = mt.branch("audit").table.read().select(
        F.col("o_orderkey").alias("b_key"), F.col("o_totalprice").alias("bp")
    )
    j = m.join(b, m.o_orderkey == b.b_key, "full_outer")
    return j.select(
        F.coalesce("o_orderkey", "b_key").alias("o_orderkey"),
        F.when(F.col("o_orderkey").isNull(), F.lit("branch_only"))
        .when(F.col("mp") != F.col("bp"), F.lit("diverged"))
        .otherwise(F.lit("same"))
        .alias("status"),
        F.col("mp").cast("double").alias("main_price"),
        F.col("bp").cast("double").alias("branch_price"),
    ).orderBy("o_orderkey")


# -- vs15: partition-spec evolution across eras -------------------------------

_SPEC_EVOLVED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_spec_evolved_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """events -> a lake table whose hidden partition spec EVOLVES
    mid-history: the first half of the log lands under bucket(user_id,
    4), the spec evolves to bucket(user_id, 16) — zero rewrites, a
    metadata-only commit — and the second half lands under the new
    spec.  Old files keep (and are pruned under) the old spec."""
    cache = _SPEC_EVOLVED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    mt = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_spec_"),
        key_cols=["event_id"],
        partition_by=["ub"],
        partition_transforms={"ub": ("bucket", "user_id", 4)},
    )
    ev = t.events.select("event_id", "user_id", "event_type", "ts", "value")
    mt.append(ev.filter(F.col("event_id") % 2 == 0))
    mt.evolve_partition_spec({"ub": ("bucket", "user_id", 16)})
    mt.append(ev.filter(F.col("event_id") % 2 == 1))
    cache[sf_dir] = mt
    return mt


@register(
    "vs15_spec_evolution_read",
    oracle="""
        SELECT event_id, user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
        FROM events
        WHERE user_id = 7
        ORDER BY event_id
    """,
    tags=("lake", "manifest", "spec-evolution", "hidden-partitioning"),
)
def vs15_spec_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-SPEC EVOLUTION driven end-to-end (Iceberg semantics —
    a long-lived 100 TB table changes its bucketing without rewriting
    history): half the event log is written under bucket(user_id, 4),
    the spec evolves, the other half lands under bucket(user_id, 16),
    and a raw ``user_id`` point read must (a) return every matching
    row from BOTH eras — the per-file spec stamp maps the predicate to
    bucket[4] bounds for old files and bucket[16] bounds for new, so
    neither era is mis-pruned — and (b) still PRUNE on both sides: at
    most one bucket's files per era plan, guarded below.  The oracle
    computes from the raw parquet and never sees the lake layout, so
    the hash gate certifies cross-era reads are lossless and exact.

    Scale shape: the evolution commit is metadata-only (a spec-registry
    entry; zero data movement); a point read plans <= s files for s
    spec eras instead of the table's full file list — the same
    manifest-pruned single-scan read as vs11, just with an era-aware
    predicate mapping."""
    mt = _build_spec_evolved_lake(spark, sf_dir)
    planned = mt.planned_files(where={"user_id": 7})
    total = len(mt.planned_files())
    # one bucket per era at most; must survive python -O (no assert)
    if not (0 < len(planned) <= 2 and len(planned) < total):
        raise RuntimeError(
            f"spec-evolution pruning disengaged: planned {len(planned)}"
            f"/{total} files for a single-user point read"
        )
    return (
        mt.read(where={"user_id": 7})
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value",
        )
        .orderBy("event_id")
    )


_SPEC_REWRITTEN: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


@register(
    "vs16_spec_rewrite_read",
    oracle="""
        SELECT event_id, user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
        FROM events
        WHERE user_id = 7
        ORDER BY event_id
    """,
    tags=("lake", "manifest", "spec-evolution", "maintenance"),
)
def vs16_spec_rewrite_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vs15's cross-era table AFTER ``rewrite_to_current_spec`` — the
    rewriteDataFiles maintenance action that retires spec-evolution
    debt: stale-spec partitions re-derive under the current spec in
    one write job, and the same point read that planned one partition
    PER ERA in vs15 now plans files in a SINGLE partition (guarded
    in-query).  The oracle is vs15's — the rewrite must be perfectly
    content-invariant, so any row lost, duplicated, or mutated by the
    migration breaks the same hash that passed before it.

    Scale shape: the rewrite is one partitioned write of O(stale
    partitions) + a manifest swap; run off-peak, batch by batch, on a
    100 TB table — correctness never requires it (vs15 is exact across
    eras), it only buys back the one-partition-per-era read tax."""
    cache = _SPEC_REWRITTEN.setdefault(spark, {})
    if sf_dir not in cache:
        t = tables(spark, sf_dir)
        mt = ManifestTable(
            spark,
            session_tmpdir(spark, "gdl_lake_specrw_"),
            key_cols=["event_id"],
            partition_by=["ub"],
            partition_transforms={"ub": ("bucket", "user_id", 4)},
        )
        ev = t.events.select(
            "event_id", "user_id", "event_type", "ts", "value"
        )
        mt.append(ev.filter(F.col("event_id") % 2 == 0))
        mt.evolve_partition_spec({"ub": ("bucket", "user_id", 16)})
        mt.append(ev.filter(F.col("event_id") % 2 == 1))
        mt.rewrite_to_current_spec()
        cache[sf_dir] = mt
    mt = cache[sf_dir]
    planned = mt.planned_files(where={"user_id": 7})
    pkeys = {f.rsplit("__mt_pk=", 1)[-1] for f in planned}
    # post-rewrite: single-era read — ONE partition's files plan; must
    # survive python -O (no assert)
    if not planned or len(pkeys) != 1:
        raise RuntimeError(
            f"spec-rewrite pruning regressed: {len(planned)} files across "
            f"{len(pkeys)} partitions for a single-user point read"
        )
    return (
        mt.read(where={"user_id": 7})
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value",
        )
        .orderBy("event_id")
    )


# -- vs17: partition-COLUMN evolution (add-partition-field) --------------------

_COL_EVOLVED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_column_evolved_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """events -> a lake table whose partition-COLUMN LIST grows
    mid-history (Iceberg add-partition-field): the first half of the
    log lands under (event_type,), the key space evolves to
    (event_type, day) with day = day(ts) — a metadata-only commit —
    and the second half lands under the two-column spec.  A cross-era
    MERGE then flips the sign of every OLD-era click row inside the
    query window: the same key routes to DIFFERENT partition keys
    across column eras, so the upsert must locate old rows by their
    FILE's era key (the short-circuit that assumes keys pin partitions
    is unsound across eras) — any old row it misses survives as a
    duplicate and breaks the hash gate."""
    cache = _COL_EVOLVED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    mt = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_coladd_"),
        key_cols=["event_id"],
        partition_by=["event_type"],
    )
    ev = t.events.select("event_id", "user_id", "event_type", "ts", "value")
    mt.append(ev.filter(F.col("event_id") % 2 == 0))
    mt.evolve_partition_spec(
        {"day": ("day", "ts")}, partition_by=["event_type", "day"]
    )
    mt.append(ev.filter(F.col("event_id") % 2 == 1))
    win = (
        (F.col("event_type") == "click")
        & (F.col("ts") >= "2024-01-03 00:00:00")
        & (F.col("ts") <= "2024-01-05 00:00:00")
    )
    mt.upsert(
        ev.filter((F.col("event_id") % 2 == 0) & win).withColumn(
            "value", -F.col("value")
        )
    )
    cache[sf_dir] = mt
    return mt


@register(
    "vs17_partition_column_evolution_read",
    oracle="""
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               CASE WHEN event_id % 2 = 0 THEN -value ELSE value END
                   AS value
        FROM events
        WHERE event_type = 'click'
          AND ts BETWEEN TIMESTAMP '2024-01-03 00:00:00'
                     AND TIMESTAMP '2024-01-05 00:00:00'
        ORDER BY event_id
    """,
    tags=("lake", "manifest", "spec-evolution", "column-evolution"),
)
def vs17_partition_column_evolution_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITION-COLUMN EVOLUTION driven end-to-end (Iceberg
    add-partition-field — a decade-lived table grows its key space
    from (event_type,) to (event_type, day) without rewriting a byte):
    half the log is written under the one-column spec, the key space
    evolves, the other half lands under (event_type, day(ts)), and a
    cross-era MERGE flips old-era click values inside the window.  The
    read must (a) return every matching row from BOTH column eras, (b)
    apply the merge exactly once — the same key routes to different
    partition keys across eras, so a rewrite that re-derives keys
    under the current columns would strand or clobber rows (guarded by
    the hash gate), and (c) still PRUNE: old files on event_type
    stats, new files additionally on the hidden day transform (at most
    one old-era partition plus the window's day partitions plan —
    guarded in-query).  The oracle computes from the raw parquet and
    never sees the lake layout.

    Scale shape: the evolution is one spec-registry entry; reads stay
    single-scan manifest-pruned; the era tax (conservative keeps on
    files that predate the new column) is bounded by old-era file
    counts and retired entirely by rewrite_to_current_spec.

    Ref analog: the reference's own pk/sk composite keys grew fields
    across its git history (backend/processing_assets_model.py:17-21)."""
    mt = _build_column_evolved_lake(spark, sf_dir)
    where = {
        "event_type": "click",
        "ts": ("2024-01-03 00:00:00", "2024-01-05 00:00:00"),
    }
    planned = mt.planned_files(where=where)
    total = len(mt.planned_files())
    pkeys = {f.rsplit("__mt_pk=", 1)[-1] for f in planned}
    # <= 1 old-era click partition + 3 window day-partitions (+1 slack
    # for an upsert-produced split); must survive python -O (no assert)
    if not (0 < len(planned) < total and len(pkeys) <= 5):
        raise RuntimeError(
            f"column-evolution pruning disengaged: planned "
            f"{len(planned)}/{total} files across {len(pkeys)} partitions"
        )
    return (
        mt.read(where=where)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value",
        )
        .orderBy("event_id")
    )


# -- vs18: CDC replication — change-feed apply into a replica table -----------

_CDC_REPLICATED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _cdc_pull(src: ManifestTable, replica: ManifestTable, cursor: int) -> int:
    """One replication pull: consume ``src.changes_since(cursor)`` and
    apply it to ``replica`` — upserts for insert/update_postimage rows
    (txn-stamped with the new cursor, so a crash-replayed pull is a
    no-op), equality-deletes for delete rows (naturally idempotent:
    re-deleting absent keys commits nothing).  The change feed is a NET
    per-key classification over the span, so upserts and deletes touch
    disjoint keys and apply in either order.  Returns the new cursor.

    Scale shape: the feed is O(changed partitions) to derive; the apply
    is one keyed MERGE + one O(deleted keys) metadata commit.  Deleted
    keys pass through the driver (bounded by the delta's deletions —
    the CDC-batch contract), never table-sized."""
    delta, new_cursor = src.changes_since(cursor)
    if new_cursor == cursor:
        return cursor
    ups = delta.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type")
    del_keys = [
        r.o_orderkey
        for r in delta.filter(F.col("_change_type") == "delete")
        .select("o_orderkey")
        .collect()
    ]
    replica.upsert(ups, txn=("vs18-replica", new_cursor))
    if del_keys:
        replica.delete_where_eq(F.col("o_orderkey").isin(del_keys))
    return new_cursor


def _build_cdc_replica(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """Source table commit sequence interleaved with replication pulls,
    ending with an at-head no-op pull and a crash-replay re-apply of an
    already-consumed span (both guarded to zero replica commits)."""
    cache = _CDC_REPLICATED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    base = t.orders.select(*_COLS)
    src = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_cdcsrc_"),
        key_cols=["o_orderkey"],
        partition_by=["o_orderpriority"],
    )
    # the replica lives under a DIFFERENT physical layout — replication
    # is logical (keys + rows), not a file copy
    replica = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_cdcdst_"),
        key_cols=["o_orderkey"],
        partition_by=["o_orderstatus"],
    )
    cursor = 0
    src.append(base.filter(F.col("o_orderkey") % 7 < 5))
    cursor = _cdc_pull(src, replica, cursor)
    src.upsert(
        base.filter(
            (F.col("o_orderkey") % 7 < 5) & (F.col("o_orderkey") % 100 == 0)
        ).withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    src.delete_where(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 10 == 3)
    )
    cursor = _cdc_pull(src, replica, cursor)
    mid_cursor = cursor
    src.upsert(base.filter(F.col("o_orderkey") % 7 == 5))
    cursor = _cdc_pull(src, replica, cursor)

    v_final = replica.current_version()
    # at head: the pull is a no-op and reads no files
    if _cdc_pull(src, replica, cursor) != cursor:
        raise RuntimeError("at-head CDC pull advanced the cursor")
    # crash-replay: re-applying an ALREADY-CONSUMED span must commit
    # nothing (the txn stamp makes the upsert a no-op; re-deleting
    # absent keys commits nothing)
    replayed = src.changes(0, mid_cursor)
    replica.upsert(
        replayed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).drop("_change_type"),
        txn=("vs18-replica", mid_cursor),
    )
    if replica.current_version() != v_final:
        raise RuntimeError(
            "replayed CDC span minted replica commits: txn idempotency "
            "broken in the replication apply"
        )
    cache[sf_dir] = replica
    return replica


@register(
    "vs18_cdc_replication_read",
    oracle="""
        WITH doubled AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 100 = 0
                        THEN o_totalprice * 2 ELSE o_totalprice
                   END AS o_totalprice,
                   o_orderpriority
            FROM orders WHERE o_orderkey % 7 < 5
        ),
        kept AS (
            SELECT * FROM doubled
            WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
        ),
        latecomers AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
            FROM orders WHERE o_orderkey % 7 = 5
        )
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice, 2) AS o_totalprice, o_orderpriority
        FROM (SELECT * FROM kept UNION ALL SELECT * FROM latecomers)
        ORDER BY o_orderkey
    """,
    tags=("lake", "manifest", "cdc", "replication"),
)
def vs18_cdc_replication_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC REPLICATION end-to-end — the Delta-CDF -> downstream-table
    pattern every lakehouse runs: a source table goes through
    append -> price-doubling MERGE -> partition-pruned DELETE -> late
    MERGE while a replica (under a DIFFERENT partition layout) applies
    ``changes_since`` pulls — upserts txn-stamped per cursor,
    equality-deletes for removed keys — with an at-head no-op pull and
    a crash-replayed span both guarded to zero replica commits.  The
    oracle replays the source's logical history over the raw parquet,
    so the hash certifies the replica converged to exactly the source
    state through the incremental feed alone (no full-table copy, no
    drift from the delete or replay paths).

    Ref analog: the import-status view consumed Step Function state
    transitions incrementally (backend/import_status/get.py:39-94);
    this is the same consume-once cursor contract over table commits."""
    replica = _build_cdc_replica(spark, sf_dir)
    return (
        replica.read()
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderpriority",
        )
        .orderBy("o_orderkey")
    )


# -- st04: streaming geospatial ingest — WKB stream -> cell rollup lake -------

_GEO_STREAMED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_geo_streamed_cells(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """Streaming GEOSPATIAL ingest, the reference's dataset-arrival
    workflow with geometry: events arrive as a 4-file stream of
    WKB-ENCODED points (one micro-batch per file, hash-split —
    deliberately NOT time-ordered), each micro-batch decodes the WKB
    through the Arrow-batched kernel ON THE STREAM, assigns grid cells,
    a stateful update-mode count per (cell, day) accumulates, and each
    micro-batch's changed cells MERGE exactly-once into a
    cell-partitioned lake table.  Update-mode emission + keyed upsert
    makes the final table equal the batch per-cell counts for ANY
    arrival order — the property that lets a declarative SQL oracle
    check a streaming spatial pipeline end-to-end."""
    from geospatial_data_lake_spark.sources.wkb_source import (
        points_to_wkb,
        wkb_to_points,
    )
    from geospatial_data_lake_spark.streaming.lake_sink import stream_upsert

    cache = _GEO_STREAMED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    root = session_tmpdir(spark, "gdl_lake_st4_")
    src = os.path.join(root, "src")
    pts = t.events.select(
        "event_id",
        "ts",
        (((F.col("event_id") * 7919) % 900) / 10.0 - 45.0).alias("px"),
        (((F.col("event_id") * 104729) % 425) / 10.0 - 21.25).alias("py"),
    )
    ev = points_to_wkb(pts, "px", "py").drop("px", "py")
    for b in range(4):
        ev.filter(F.pmod(F.xxhash64("event_id"), 4) == b).coalesce(
            1
        ).write.mode("append").parquet(src)
    mt = ManifestTable(
        spark,
        os.path.join(root, "table"),
        key_cols=["cx", "cy", "day"],
        partition_by=["cx"],
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, wkb binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    decoded = wkb_to_points(stream, "wkb")  # Arrow kernel on the stream
    cells = (
        decoded.withColumns(
            {
                "cx": F.floor(F.col("x") / 10).cast("long"),
                "cy": F.floor(F.col("y") / 10).cast("long"),
                "day": F.date_format("ts", "yyyy-MM-dd"),
            }
        )
        .groupBy("cx", "cy", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    q = stream_upsert(
        cells,
        mt,
        os.path.join(root, "ckpt"),
        app_id="st04",
        output_mode="update",
    )
    q.awaitTermination()
    cache[sf_dir] = mt
    return mt


@register(
    "st04_stream_geo_ingest",
    oracle="""
        WITH p AS (
            SELECT ((event_id * 7919) % 900) / CAST(10 AS DOUBLE) - 45.0 AS px,
                   ((event_id * 104729) % 425) / CAST(10 AS DOUBLE) - 21.25 AS py,
                   ts
            FROM events
        )
        SELECT CAST(floor(px / 10) AS BIGINT) AS cx,
               CAST(floor(py / 10) AS BIGINT) AS cy,
               strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM p
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    tags=("lake", "streaming", "geo", "wkb", "ingest"),
)
def st04_stream_geo_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING GEOSPATIAL INGEST end-to-end: WKB-encoded points
    arrive as an unordered file stream, decode through the Arrow
    kernel INSIDE the streaming query, roll up into per-(grid cell,
    day) counts in update mode, and MERGE exactly-once into a
    cell-partitioned lake table (txn-stamped micro-batches — replays
    are no-ops).  The oracle computes the same cells from the raw
    batch log, so the hash certifies the whole chain: stream decode ->
    cell assignment -> stateful accumulation -> keyed merge, under an
    arrival order the batch never sees.

    Scale shape: decode is a narrow per-batch map stage; the stateful
    aggregate keeps one row per touched (cell, day) — geography x
    retention bounded, not corpus bounded (st03's watermark-eviction
    replay proves the eviction mechanics for windowed state); each
    micro-batch merges O(changed cells) into O(touched partitions)."""
    mt = _build_geo_streamed_cells(spark, sf_dir)
    return (
        mt.read()
        .select("cx", "cy", "day", "cnt")
        .orderBy("cx", "cy", "day")
    )


# -- st06: streaming continuous aggregate behind the time-series rollup -------

_TS_STREAMED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_ts_streamed_cells(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """events -> streaming (user, hour) OBSERVATION-cell materialization:
    the log arrives as a 4-file stream split by event_id hash
    (deliberately NOT time-ordered), a stateful tumbling 1-hour
    ``max_by(value, event_id)`` runs in update mode — the
    last-observation-by-ingest-sequence statistic is a commutative
    arg-max monoid, so any arrival order accumulates to the same cell —
    and each micro-batch's changed cells MERGE exactly-once into a lake
    table keyed (user_id, hour), partitioned by a user hash bucket."""
    cache = _TS_STREAMED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    from geospatial_data_lake_spark.streaming.lake_sink import stream_upsert

    t = tables(spark, sf_dir)
    root = session_tmpdir(spark, "gdl_lake_st6_")
    src = os.path.join(root, "src")
    ev = t.events.select("event_id", "ts", "user_id", "value")
    for b in range(4):
        ev.filter(F.pmod(F.xxhash64("event_id"), 4) == b).coalesce(
            1
        ).write.mode("append").parquet(src)
    mt = ManifestTable(
        spark,
        os.path.join(root, "table"),
        key_cols=["user_id", "hour"],
        partition_by=["u_bucket"],
    )
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cells = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.max_by("value", "event_id").alias("obs"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH").alias("hour"),
            "obs",
            F.pmod("user_id", F.lit(8)).cast("int").alias("u_bucket"),
        )
    )
    q = stream_upsert(
        cells,
        mt,
        os.path.join(root, "ckpt"),
        app_id="st06",
        output_mode="update",
    )
    q.awaitTermination()
    cache[sf_dir] = mt
    return mt


from geospatial_data_lake_spark.operators.timeseries import (  # noqa: E402
    TS03_ORACLE as _TS03_ORACLE,
    _locf_fill,
    _twa_daily,
)


@register(
    "st06_stream_timeseries_rollup",
    # Same oracle as ts03, shared verbatim — the streaming cell
    # maintenance must land on exactly the batch hourly observations,
    # and the LOCF gap-fill + integer-exact TWAP on top is the
    # identical deterministic arithmetic.
    oracle=_TS03_ORACLE,
    tags=("lake", "streaming", "timeseries", "twap"),
)
def st06_stream_timeseries_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts03's time-weighted daily average fed by STREAMING state — the
    continuous-aggregate deployment of the time-series family: hourly
    last-observation cells are maintained by a stateful update-mode
    arg-max merged into a lake table per micro-batch (exactly-once via
    txn-stamped upserts), and the LOCF gap-fill + TWAP read runs over
    the streamed cells instead of rescanning the raw log.  The external
    check is end-to-end: stream -> arg-max state -> keyed merge ->
    gap-fill -> integer-DIV mean must reproduce ts03's batch answer
    bit-for-bit, under an arrival order the batch never sees.

    Scale shape: streaming state is one (user, hour) cell per group —
    watermark-evictable in a continuous deployment (st03's replay
    proves the eviction mechanics for windowed state); each micro-batch
    merges only the cells it changed into O(touched partitions); the
    serve path reads the cell table (users x hours, calendar-bounded)
    and never the log."""
    mt = _build_ts_streamed_cells(spark, sf_dir)
    cells = mt.read().select(
        "user_id",
        F.to_timestamp("hour", "yyyy-MM-dd HH").alias("bucket"),
        "obs",
    )
    return _twa_daily(_locf_fill(cells))


@register(
    "vs19_metadata_only_counts",
    # The oracle replays vs01's logical mutation history and counts per
    # partition; the engine side answers from MANIFEST STATS ALONE —
    # the hash certifies that the lake's recorded per-file row counts
    # stay exactly truthful through append + MERGE + delete rewrites.
    oracle="""
        WITH merged AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderpriority
            FROM orders
        )
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM merged
        WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
        GROUP BY o_orderpriority
    """,
    tags=("lake", "manifest", "metadata-only"),
)
def vs19_metadata_only_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition COUNT(*) answered from the manifest ALONE — the
    Delta/Iceberg metadata-only aggregate as an externally hash-gated
    query: vs01's lake (append + MERGE + partition-pruned delete) is
    censused from its recorded per-file row counts; not one data file
    is opened (the plan pin asserts a parquet-scan-free plan).  The
    oracle replays the same mutation history logically, so any drift in
    the stats bookkeeping through any rewrite path breaks the hash.

    Scale shape: the answer is manifest-sized — O(files) driver-side
    metadata (the same class as planned_files/history), independent of
    row volume; this is why production lakehouses serve COUNT(*) and
    file censuses from the transaction log.  Truthfulness contract:
    ``file_rows`` reports None for files whose effective counts are
    unknowable from metadata (pre-counting commits, pending equality
    deletes) — this query RAISES on None rather than guessing; the
    production fallback is the ordinary scan."""
    import json as _json

    mt = _build_lake(spark, sf_dir)
    fr = mt.file_rows()
    rows = []
    for pkey, files in mt.partition_files().items():
        counts = [fr.get(f) for f in files]
        if any(c is None for c in counts):
            raise RuntimeError(
                f"metadata-only count unknowable for partition {pkey}; "
                "scan fallback required"
            )
        n = sum(counts)
        if n > 0:
            rows.append((_json.loads(pkey)["o_orderpriority"], n))
    return spark.createDataFrame(
        rows, "o_orderpriority string, n_orders long"
    )


@register(
    "vs20_metadata_column_range",
    # vs19's sibling for VALUE stats: per-partition MIN/MAX answered
    # from per-file manifest bounds alone, against the logical replay —
    # the hash gates exactly the stats that read(where=...) data
    # skipping prunes by, through every rewrite path (the doubled
    # o_totalprice rows and the delete-rewritten survivors must both
    # carry era-exact recorded bounds for this to match).
    oracle="""
        WITH merged AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderpriority
            FROM orders
        )
        SELECT o_orderpriority,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price
        FROM merged
        WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
        GROUP BY o_orderpriority
    """,
    tags=("lake", "manifest", "metadata-only"),
)
def vs20_metadata_column_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition MIN/MAX of o_totalprice from MANIFEST STATS ALONE —
    vs19's sibling for value bounds: the per-file min/max the lake's
    ``read(where=...)`` data skipping prunes by, aggregated per
    partition without opening a data file (parquet-scan-free by plan
    pin) and hash-gated against the logical replay of vs01's mutation
    history.  The MERGE doubled every 100th price and the delete
    rewrote survivor files — so a stale or era-mixed bound anywhere in
    the stats bookkeeping shifts an extreme and breaks the hash.

    Truthfulness contract mirrors ``column_range``: files missing
    recorded bounds or covered by pending equality deletes make the
    answer metadata-unknowable — this query RAISES there (the fixture
    always records bounds); production falls back to the scan."""
    mt = _build_lake(spark, sf_dir)
    stats = mt.file_stats()
    covered = mt.pending_delete_files()
    rows = []
    for pkey, files in mt.partition_files().items():
        mns, mxs = [], []
        for f in files:
            if f in covered:
                # a pending equality delete may have removed this
                # file's extreme rows — bounds are not truthful until
                # the delete materializes (column_range's contract)
                raise RuntimeError(
                    f"file {f} is covered by a pending equality "
                    "delete; scan fallback required"
                )
            bounds = stats.get(f, {}).get("o_totalprice")
            if bounds is None:
                raise RuntimeError(
                    f"no recorded o_totalprice bounds for {f}; "
                    "scan fallback required"
                )
            if bounds[0] is not None:
                mns.append(bounds[0])
                mxs.append(bounds[1])
        if mns:
            rows.append(
                (json.loads(pkey)["o_orderpriority"], min(mns), max(mxs))
            )
    return spark.createDataFrame(
        rows, "o_orderpriority string, min_price double, max_price double"
    )


_ZORDERED: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_zordered_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """orders -> manifest table, then ``optimize(strategy="zorder")``
    over (o_custkey, o_totalprice): every partition's rows are rewritten
    into Morton-ordered range buckets whose per-file min/max form
    balanced hyper-rectangles over BOTH columns — Delta's
    ``OPTIMIZE ... ZORDER BY`` as one percentile-cut + one write job."""
    cache = _ZORDERED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    base = t.orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    mt = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_zo_"),
        key_cols=["o_orderkey"],
        partition_by=["o_orderpriority"],
        stats_cols=["o_custkey", "o_totalprice"],
    )
    mt.append(base)
    mt.optimize(
        ["o_custkey", "o_totalprice"], target_files=8, strategy="zorder"
    )
    cache[sf_dir] = mt
    return mt


@register(
    "vs21_zorder_clustered_read",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_custkey BETWEEN 1 AND 75
          AND o_totalprice BETWEEN 50000.0 AND 150000.0
    """,
    tags=("lake", "manifest", "zorder", "layout"),
)
def vs21_zorder_clustered_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column range read against a ZORDER-clustered lake table: the
    table is rewritten by ``optimize(["o_custkey", "o_totalprice"],
    strategy="zorder")`` (Morton-interleaved range buckets, pure
    Catalyst bit arithmetic — layout.zorder_key_from_bounds), then read
    with a conjunctive range spec on both clustered columns.  The
    result must equal the plain filter over the fixture — clustering is
    a pure rewrite — while the manifest's per-file min/max (now tight
    hyper-rectangles on BOTH columns) let the read plan a strict subset
    of each partition's files (pinned in tests/test_manifest_table.py::
    should_zorder_prune_on_every_clustered_column and the fixture pin
    below).

    Scale shape: a lexicographic sort would serve only o_custkey
    predicates; Morton interleave makes EITHER column (and especially
    the conjunction) prune, so a 100 TB table answers 2-D slices from
    the few files whose hyper-rectangle intersects the query box —
    O(intersecting files), never O(partition).  Ref analog: the
    reference's DynamoDB GSI gives one extra key dimension
    (backend/datasets_model.py:46-50); z-order is the columnar-lake
    generalization to multi-dimension range predicates."""
    mt = _build_zordered_lake(spark, sf_dir)
    return mt.read(
        where={
            "o_custkey": (1, 75),
            "o_totalprice": (50000.0, 150000.0),
        }
    )


_POSDEL: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_posdel_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """events -> DUPLICATE-KEY manifest table (keyed loosely by user_id:
    many physical rows per key, the raw-log shape) driven through a
    POSITIONAL-delete lifecycle: append two-thirds of the log, pos-delete
    the cheap clicks, then append the final third — whose cheap clicks
    must SURVIVE (the delete's applies_to pins it to the files that
    existed at commit time, Iceberg's sequence-number rule)."""
    cache = _POSDEL.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    ev = t.events.select("event_id", "user_id", "event_type", "ts", "value")
    mt = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_pd_"),
        key_cols=["user_id"],
        partition_by=["event_type"],
    )
    mt.append(ev.filter(F.col("event_id") % 3 < 2))
    mt.delete_where_pos(
        (F.col("event_type") == "click") & (F.col("value") < 50.0)
    )
    mt.append(ev.filter(F.col("event_id") % 3 == 2))
    cache[sf_dir] = mt
    return mt


@register(
    "vs22_positional_delete_read",
    # the oracle replays the lifecycle as pure SQL: a row is gone iff it
    # was a cheap click in the PRE-DELETE batches (event_id % 3 < 2) —
    # rows sharing a user_id survive (row-granular, unlike vs10's
    # key-granular equality deletes) and post-delete appends survive
    # even when they match (sequence rule)
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               round(sum(value), 4) AS sum_value
        FROM events
        WHERE NOT coalesce(
            event_type = 'click' AND value < 50.0 AND event_id % 3 < 2,
            false
        )
        GROUP BY event_type
    """,
    tags=("lake", "manifest", "pos-delete", "merge-on-read"),
)
def vs22_positional_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read over pending POSITIONAL deletes (Iceberg v2
    pos-delete / Delta deletion-vector analog), externally hash-gated:
    the fixture table is keyed by user_id with MANY rows per key, so
    equality deletes could not express "delete exactly the matched
    rows" — ``delete_where_pos`` records (root-relative file path, row
    ordinal) addresses from the scan's ``_metadata`` pseudo-column and commits
    only that address file plus a manifest.  The read anti-joins the
    address list (O(matched rows) state, zero data-file rewrites) and
    must reproduce the SQL lifecycle replay exactly — including the
    same-key survivors and the post-delete appends the sequence rule
    protects.

    Scale shape: deleting k rows from a 100 TB log costs O(k) written
    bytes + one manifest commit; reads pay one broadcast-sized anti-join
    per delete generation until compaction materializes it (vs10's
    lifecycle, here at ROW granularity).  Ref analog: per-item DynamoDB
    deletes (backend/datasets/delete.py) on an append-only log."""
    mt = _build_posdel_lake(spark, sf_dir)
    return (
        mt.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@register(
    "vs25_posdelete_change_feed",
    # the oracle replays the NET multiset feed over (v1, head] as pure
    # SQL: the mid-span positional delete removed exactly the cheap
    # clicks of the PRE-delete batches (event_id % 3 < 2 — applies_to
    # pins it to the files existing at commit time), and the final
    # append contributed every event_id % 3 = 2 row as an insert.  Any
    # drift in the content-diff classification, the multiset counting,
    # or the span's changed-partition selection breaks the hash.
    oracle="""
        WITH feed AS (
            SELECT 'delete' AS _change_type, event_type, value
            FROM events
            WHERE event_id % 3 < 2
              AND event_type = 'click' AND value < 50.0
            UNION ALL
            SELECT 'insert' AS _change_type, event_type, value
            FROM events WHERE event_id % 3 = 2
        )
        SELECT _change_type, event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(value), 4) AS sum_value
        FROM feed
        GROUP BY _change_type, event_type
    """,
    tags=("lake", "manifest", "cdc", "pos-delete"),
)
def vs25_posdelete_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC over a DUPLICATE-KEY event log with a positional delete
    mid-span — the composition r12 left undefined (key-diff CDC
    cross-joins over duplicate keys; Iceberg solves it with file/pos
    diffs that skip REPLACE snapshots).  ``changes(v1, head)`` detects
    the mid-span ``DELETE POS`` commit from the manifests alone and
    routes to the CONTENT (full-row multiset) diff: net feed = the
    pos-deleted rows as ``delete`` rows + the post-delete append as
    ``insert`` rows, rewrite-invariant by construction.  The explicit
    mode="key" path raises loudly instead (unit-gated).

    Scale shape: the feed reads only changed partitions, aggregates
    (row -> count) with map-side combine, and joins on distinct
    physical rows — uniform hash keys, no skew; a 100 TB log pays
    O(span's touched partitions), never O(table).  Ref analog: per-item
    deletes feeding the incremental import-status view
    (backend/datasets/delete.py:38-45, backend/import_status/get.py)."""
    mt = _build_posdel_lake(spark, sf_dir)
    feed = mt.changes(1, mt.current_version())
    return feed.groupBy("_change_type", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "vs26_delete_files_audit",
    # the oracle recomputes what the pos-delete entry's RECORDED count
    # must be from the raw fixture: exactly the cheap clicks of the
    # pre-delete batches (event_id % 3 < 2 — applies_to pins the delete
    # to the files existing at commit time).  Any drift in the
    # delete-commit count recording, the manifest round-trip, or the
    # delete_files_meta assembly breaks the hash.
    oracle="""
        SELECT 'pos' AS kind,
               'click' AS event_type,
               CAST(count(*) AS BIGINT) AS n_addresses
        FROM events
        WHERE event_id % 3 < 2
          AND event_type = 'click' AND value < 50.0
    """,
    tags=("lake", "manifest", "metadata-table", "pos-delete"),
)
def vs26_delete_files_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Iceberg ``delete_files`` metadata table as a QUERYABLE
    DataFrame, audited against the data it describes: over the vs22
    duplicate-key event log with its pending positional delete,
    ``delete_files_meta()`` rows (kind, recorded entry count,
    applies-to span — counts recorded at delete-commit time) aggregate
    to exactly the number of rows the lifecycle deleted, per partition
    decoded from the partition document.  This is the operational
    compact-now view: record_count x applies_to_count is the
    merge-on-read anti-join tax each read pays, and
    ``rewrite_position_deletes`` consumes the same numbers to pick
    partitions past the materialization threshold.

    Scale shape: O(pending delete entries) manifest rows, ZERO parquet
    scans (plan-pinned) — on a 100 TB log the decision to compact costs
    a catalog read, never a data scan.  Ref analog: the dataset
    version list the reference reads from DynamoDB metadata without
    touching S3 objects (backend/datasets/list.py)."""
    mt = _build_posdel_lake(spark, sf_dir)
    return (
        mt.delete_files_meta()
        .select(
            "kind",
            F.get_json_object("partition", "$.event_type").alias(
                "event_type"
            ),
            "record_count",
        )
        .groupBy("kind", "event_type")
        .agg(F.sum("record_count").cast("bigint").alias("n_addresses"))
    )


@register(
    "vs27_per_commit_change_feed",
    # the oracle replays the COMMIT-BY-COMMIT history as pure SQL: v1
    # appends every event_id % 3 < 2 row, v2's positional delete
    # removes that batch's cheap clicks, v3 appends the rest.  Unlike
    # vs25's net two-endpoint feed, the mid-span lifecycle is visible
    # per version — any drift in the per-commit span walk, the
    # rewrite-skip rule, or the version stamping breaks the hash.
    oracle="""
        WITH feed AS (
            SELECT 1 AS _commit_version, 'insert' AS _change_type,
                   event_type, value
            FROM events WHERE event_id % 3 < 2
            UNION ALL
            SELECT 2, 'delete', event_type, value
            FROM events
            WHERE event_id % 3 < 2
              AND event_type = 'click' AND value < 50.0
            UNION ALL
            SELECT 3, 'insert', event_type, value
            FROM events WHERE event_id % 3 = 2
        )
        SELECT CAST(_commit_version AS BIGINT) AS _commit_version,
               _change_type, event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(value), 4) AS sum_value
        FROM feed
        GROUP BY _commit_version, _change_type, event_type
    """,
    tags=("lake", "manifest", "cdc", "pos-delete"),
)
def vs27_per_commit_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-COMMIT CDC — Delta CDF's ``_commit_version`` contract over
    the duplicate-key event log: ``changes_per_commit`` walks the
    commit span, derives each version's own change set (content-mode
    multiset diffs — the key-free classification duplicate-key tables
    need), stamps it with the version, and unions.  A consumer
    replaying history commit-by-commit (event sourcing, audit trails)
    sees the append -> positional-delete -> append lifecycle as three
    distinct stamped change sets, where vs25's net feed collapses the
    endpoints.  Pure-rewrite commits are skipped by their operation
    label before any data is read — Iceberg's REPLACE-snapshot rule.

    Scale shape: cost is the SUM of per-commit changed partitions
    (each span reads only partitions whose file lists moved at that
    version), never O(table x span); the per-span multiset diff
    shuffles on distinct physical rows.  Ref analog: the import-status
    view replaying Step Function state transitions in arrival order
    (backend/import_status/get.py:39-94)."""
    mt = _build_posdel_lake(spark, sf_dir)
    feed = mt.changes_per_commit(0, mt.current_version(), mode="content")
    return feed.groupBy(
        "_commit_version", "_change_type", "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


_MAPCOL: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_mapcol_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """The vs22 duplicate-key positional-delete lifecycle, on a table
    carrying a MAP column (the reference's
    ``validation_results.details map<string,string>`` shape, SURVEY
    §1.2) — the table shape Spark cannot group or join on directly, so
    every full-row lake operation must canonicalize it."""
    cache = _MAPCOL.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    ev = t.events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.create_map(
            F.lit("cheap"),
            F.coalesce(F.col("value") < 50.0, F.lit(False)).cast("string"),
            F.lit("etype"),
            F.col("event_type"),
        ).alias("details"),
    )
    mt = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_mc_"),
        key_cols=["user_id"],
        partition_by=["event_type"],
    )
    mt.append(ev.filter(F.col("event_id") % 3 < 2))
    mt.delete_where_pos(
        (F.col("event_type") == "click") & (F.col("value") < 50.0)
    )
    mt.append(ev.filter(F.col("event_id") % 3 == 2))
    cache[sf_dir] = mt
    return mt


@register(
    "vs28_mapcol_change_feed",
    # the oracle replays the net multiset feed (vs25's lifecycle) AND
    # rebuilds the map's canonical sorted-entry JSON by hand — the
    # exact string Spark's to_json(sorted map_entries) renders, keys
    # in lexicographic order ("cheap" < "etype"), no whitespace.  Any
    # drift in the map canonicalization (insertion-order sensitivity,
    # a false delete+insert pair from unequal renderings) breaks the
    # hash.
    oracle="""
        WITH feed AS (
            SELECT 'delete' AS _change_type, event_type, value
            FROM events
            WHERE event_id % 3 < 2
              AND event_type = 'click' AND value < 50.0
            UNION ALL
            SELECT 'insert' AS _change_type, event_type, value
            FROM events WHERE event_id % 3 = 2
        )
        SELECT _change_type,
               '{"cheap":"' || CAST(coalesce(value < 50.0, false) AS VARCHAR)
                 || '","etype":"' || event_type || '"}' AS details_json,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(value), 4) AS sum_value
        FROM feed
        GROUP BY _change_type, details_json
    """,
    tags=("lake", "manifest", "cdc", "pos-delete", "map-column"),
)
def vs28_mapcol_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-mode CDC over a MAP-columned duplicate-key table — the
    composition Spark rejects outright (maps are not groupable or
    joinable, so a naive full-row multiset diff raises
    AnalysisException on the first pos-delete span).  The content diff
    canonicalizes the map (entries sorted by key, rendered to_json)
    for its group/join key while the original map rides through to the
    feed; this query re-renders the canonical JSON in the OUTPUT so
    the oracle can rebuild the identical string from raw SQL — proving
    both the classification AND the canonicalization byte-for-byte
    (an insertion-order-sensitive rendering would split one logical
    row into a false delete+insert pair and break the hash).

    Scale shape: identical to vs25 (changed-partition reads, map-side
    combinable counts, uniform full-row hash keys) plus one
    per-row JSON rendering — no extra shuffle.  Ref analog: the
    validation_results item's details map
    (backend/processing_assets_model.py, SURVEY §1.2) flowing through
    a change feed."""
    mt = _build_mapcol_lake(spark, sf_dir)
    feed = mt.changes(1, mt.current_version())
    return (
        feed.select(
            "_change_type",
            F.to_json(
                F.map_from_entries(
                    F.array_sort(F.map_entries(F.col("details")))
                )
            ).alias("details_json"),
            "value",
        )
        .groupBy("_change_type", "details_json")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


_CONTENT_REPLICA: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_content_replica(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """Duplicate-key replication through CONTENT feeds: a source log
    (deliberately bucketed so identical full rows recur — multiplicity
    is the hard part) runs append -> positional delete -> append; a
    replica seeds from the v1 snapshot and converges by applying the
    net (1, head] content feed via ``apply_content_changes`` — delete
    rows remove exactly their multiplicity, insert rows append."""
    cache = _CONTENT_REPLICA.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    rows = t.events.select(
        "user_id",
        "event_type",
        (F.floor(F.col("value") / 10) * 10).cast("double").alias("vbucket"),
        (F.col("event_id") % 3).alias("__third"),
    )
    src = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_cr_src_"),
        key_cols=["user_id"],
        partition_by=["event_type"],
    )
    cols = ["user_id", "event_type", "vbucket"]
    src.append(rows.filter(F.col("__third") < 2).select(*cols))
    src.delete_where_pos(
        (F.col("event_type") == "click") & (F.col("vbucket") < 50.0)
    )
    src.append(rows.filter(F.col("__third") == 2).select(*cols))
    rep = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_cr_rep_"),
        key_cols=["user_id"],
        partition_by=["event_type"],
    )
    rep.append(src.read(version=1))
    rep.apply_content_changes(src.changes(1, src.current_version()))
    cache[sf_dir] = rep
    return rep


@register(
    "vs29_content_feed_apply",
    # the oracle replays the SOURCE's logical lifecycle over raw
    # parquet (v1 batch minus its cheap clicks, plus the final batch —
    # as a MULTISET, duplicates preserved) and aggregates; the Spark
    # side aggregates the REPLICA, which only ever saw the v1 snapshot
    # plus the change feed.  A multiplicity error in the apply (one
    # copy too many or too few of any duplicated row) breaks the hash.
    oracle="""
        WITH src AS (
            SELECT user_id, event_type,
                   CAST(floor(value / 10) * 10 AS DOUBLE) AS vbucket,
                   event_id % 3 AS third
            FROM events
        ),
        final AS (
            SELECT user_id, event_type, vbucket FROM src
            WHERE third < 2
              AND NOT (event_type = 'click' AND vbucket < 50.0)
            UNION ALL
            SELECT user_id, event_type, vbucket FROM src WHERE third = 2
        )
        SELECT event_type, vbucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM final
        GROUP BY event_type, vbucket
    """,
    tags=("lake", "manifest", "cdc", "replication", "pos-delete"),
)
def vs29_content_feed_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC REPLICATION for DUPLICATE-KEY tables — the gap vs18's
    key-based replica cannot cover (its upsert/delete-by-key apply is
    undefined over duplicate keys): the replica seeds from a snapshot
    and converges by APPLYING the content-mode multiset feed through
    ``apply_content_changes`` — delete rows remove exactly their
    multiplicity of matching full rows as positional deletes, insert
    rows append, and an inapplicable feed (wrong snapshot) raises
    before committing.  The fixture buckets values so identical full
    rows recur: the hash certifies multiset convergence, copy for
    copy.

    Scale shape: the apply joins the feed's distinct deleted rows
    against only the partitions holding them (uniform full-row hash
    keys) and windows within identical-row groups — tiny partitions by
    construction; cost is O(matched + feed), never O(table).  Ref
    analog: the reference replicates dataset state into an external
    consumer by replaying per-item events
    (backend/dataset_versions/create.py + backend/import_status/get.py);
    this is that contract for logs without keys."""
    rep = _build_content_replica(spark, sf_dir)
    return rep.read().groupBy("event_type", "vbucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


_CONTENT_STREAM: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_content_stream_replica(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """CONTINUOUS duplicate-key replication: the source log commits in
    four arrival batches with a positional delete mid-stream; the
    replica polls ``changes_since(cursor, mode="content")`` after each
    arrival and applies each span through the two-phase-txn'd
    ``apply_content_changes`` — and EVERY micro-batch is applied TWICE
    (the crash-restart replay a streaming sink must survive), which
    the derived txn stamps turn into no-ops.  mode="content" is passed
    explicitly: the table is duplicate-key by construction, and auto's
    key-diff default is only defined for the key-unique contract (the
    pos-delete signal cannot exist on append-only spans)."""
    cache = _CONTENT_STREAM.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    rows = t.events.select(
        "user_id",
        "event_type",
        (F.floor(F.col("value") / 10) * 10).cast("double").alias("vbucket"),
        (F.col("event_id") % 4).alias("__q"),
    )
    cols = ["user_id", "event_type", "vbucket"]
    src = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_cs_src_"),
        key_cols=["user_id"],
        partition_by=["event_type"],
    )
    rep = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_cs_rep_"),
        key_cols=["user_id"],
        partition_by=["event_type"],
    )
    src.append(rows.filter(F.col("__q") == 0).select(*cols))  # v1
    rep.append(src.read(version=1))  # replica seeds from the snapshot
    cursor = 1

    def pull() -> None:
        nonlocal cursor
        feed, new = src.changes_since(cursor, mode="content")
        if new == cursor:
            return
        rep.apply_content_changes(feed, txn=("st07", new))
        # crash-restart: the sink replays its last micro-batch — the
        # phase txn stamps make the second apply commit NOTHING
        rep.apply_content_changes(feed, txn=("st07", new))
        cursor = new

    src.append(rows.filter(F.col("__q") == 1).select(*cols))  # v2
    pull()
    src.delete_where_pos(  # v3: row-granular, applies to v1+v2 files
        (F.col("event_type") == "click") & (F.col("vbucket") < 50.0)
    )
    src.append(rows.filter(F.col("__q") == 2).select(*cols))  # v4
    pull()  # one span netting the delete + the append
    src.append(rows.filter(F.col("__q") == 3).select(*cols))  # v5
    pull()
    # at-head pull: nothing to read, cursor unchanged
    _, at_head = src.changes_since(cursor, mode="content")
    if at_head != cursor:  # pragma: no cover - contract violation
        raise AssertionError("at-head changes_since moved the cursor")
    cache[sf_dir] = rep
    return rep


@register(
    "st07_stream_content_replication",
    # the oracle replays the SOURCE's logical lifecycle: batches q<2
    # minus their cheap clicks (the mid-stream positional delete
    # applies only to files existing at commit time), plus batches
    # q>=2 in full (appended after the delete — the sequence rule).
    # The Spark side aggregates the REPLICA, which saw only the v1
    # snapshot plus three content-feed pulls, each applied twice.  Any
    # replay leak (double delete, double insert), multiplicity error,
    # or cursor drift breaks the hash.
    oracle="""
        WITH src AS (
            SELECT user_id, event_type,
                   CAST(floor(value / 10) * 10 AS DOUBLE) AS vbucket,
                   event_id % 4 AS q
            FROM events
        ),
        final AS (
            SELECT user_id, event_type, vbucket FROM src
            WHERE q < 2
              AND NOT (event_type = 'click' AND vbucket < 50.0)
            UNION ALL
            SELECT user_id, event_type, vbucket FROM src WHERE q >= 2
        )
        SELECT event_type, vbucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM final
        GROUP BY event_type, vbucket
    """,
    tags=("lake", "streaming", "cdc", "replication", "exactly-once"),
)
def st07_stream_content_replication(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING CDC replication for DUPLICATE-KEY tables, end-to-end:
    vs18 proved the cursor-loop contract for key-unique replicas
    (upsert/delete-by-key apply); this is the same loop where keys
    cannot work — each ``changes_since(cursor, mode="content")`` span
    applies through ``apply_content_changes``, whose two derived txn
    stamps (<app>#content-del / <app>#content-ins) make the whole
    apply EXACTLY-ONCE under crash replay: every micro-batch in the
    fixture is deliberately applied twice, including across the
    half-applied window (delete committed, append not), and the
    replica still converges to the source's multiset state.

    Scale shape: each pull costs O(that span's changed partitions +
    feed); the apply joins feed-distinct rows against only the
    partitions holding them and windows within identical-row groups.
    Ref analog: the import-status consumer replaying Step Function
    transitions exactly once per cursor
    (backend/import_status/get.py:39-94), here for keyless logs."""
    rep = _build_content_stream_replica(spark, sf_dir)
    return rep.read().groupBy("event_type", "vbucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@register(
    "vs23_files_metadata_audit",
    # the oracle recomputes what the METADATA must add up to from the
    # raw fixture: per-priority row counts and exact o_totalprice
    # bounds.  Any drift in optimize's stats bookkeeping, the JSON
    # round-trip, or files_meta's assembly breaks the hash.
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("lake", "manifest", "metadata-table", "zorder"),
)
def vs23_files_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Iceberg ``files`` metadata table as a QUERYABLE DataFrame,
    audited against the data it describes: over vs21's ZORDER-clustered
    lake, ``files_meta()`` rows (one per clustered file, with recorded
    row counts and per-column [min, max, null_count] stats) aggregate —
    via ordinary DataFrame ops, ``get_json_object`` over the stats doc —
    to per-partition row counts and EXACT o_totalprice bounds that must
    equal SQL over the raw fixture.  This gates three things at once:
    the clustered-rewrite path's stats bookkeeping (every optimize
    bucket's counts/bounds), the manifest JSON round-trip (shortest
    round-trip float repr -> get_json_object -> double is bit-exact),
    and the metadata-table assembly itself.

    Scale shape: the inspection plan touches O(live files) manifest
    rows and ZERO parquet — on a 100 TB table this is the difference
    between auditing a catalog and re-scanning the lake (vs19/vs20's
    contract, generalized to a composable DataFrame surface).  Ref
    analog: dataset listing endpoints (backend/datasets/list.py) — the
    reference answers inventory questions from DynamoDB items, never
    from S3 objects."""
    mt = _build_zordered_lake(spark, sf_dir)
    fm = mt.files_meta()
    return (
        fm.select(
            F.get_json_object("partition", "$.o_orderpriority").alias(
                "o_orderpriority"
            ),
            "record_count",
            F.get_json_object("column_stats", "$.o_totalprice[0]")
            .cast("double")
            .alias("mn"),
            F.get_json_object("column_stats", "$.o_totalprice[1]")
            .cast("double")
            .alias("mx"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum("record_count").cast("bigint").alias("n_rows"),
            F.min("mn").alias("min_price"),
            F.max("mx").alias("max_price"),
        )
    )


_TSLAKE: "weakref.WeakKeyDictionary[SparkSession, dict[str, ManifestTable]]" = (
    weakref.WeakKeyDictionary()
)


def _build_ts_stats_lake(spark: SparkSession, sf_dir: str) -> ManifestTable:
    """events -> manifest table ingested as four TIME-SLICED appends
    (the natural arrival order of a log) with ``stats_cols=["ts"]``:
    every file's recorded ts bounds are tight and near-disjoint, so a
    time-window read can prune to the slices it intersects — the
    per-file timestamp min/max every production lake format records."""
    import datetime as dt

    cache = _TSLAKE.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    ev = t.events.select("event_id", "user_id", "event_type", "ts", "value")
    mt = ManifestTable(
        spark,
        session_tmpdir(spark, "gdl_lake_ts_"),
        key_cols=["event_id"],
        partition_by=["event_type"],
        stats_cols=["ts"],
    )
    for wk in range(4):
        lo = dt.datetime(2024, 1, 1 + 7 * wk)
        hi = (
            dt.datetime(2024, 1, 8 + 7 * wk)
            if wk < 3
            else dt.datetime(2024, 12, 31)
        )
        mt.append(
            ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        )
    cache[sf_dir] = mt
    return mt


@register(
    "vs24_timestamp_pruned_read",
    oracle="""
        SELECT event_id, user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-09 00:00:00'
          AND ts <= TIMESTAMP '2024-01-12 23:59:59.999999'
    """,
    tags=("lake", "manifest", "timestamp-stats", "time-travel"),
)
def vs24_timestamp_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WINDOW read over per-file TIMESTAMP statistics — the hot
    lake access pattern: the events log lands in four time-sliced
    appends with ``stats_cols=["ts"]`` (bounds recorded as exact UTC
    epoch micros, JSON-safe — see _minmax_exprs), and a 4-day window
    read plans only the files whose recorded range intersects it
    (pruning pinned in tests/test_plan_shapes.py) while returning
    exactly the raw SQL window.

    Scale shape: a day's query against a year of 100 TB log ingest
    touches the files of ~one slice — O(window overlap), never
    O(history).  Where vs11 gets time pruning from a hidden day()
    PARTITION transform, this is the finer-grained FILE-stats path
    (Delta/Iceberg record both; intra-partition slices prune here even
    when the partition key is something else entirely — event_type).
    Ref analog: the reference's per-dataset version listing is keyed so
    time-ordered probes never scan history
    (backend/dataset_versions/list.py)."""
    import datetime as dt

    mt = _build_ts_stats_lake(spark, sf_dir)
    return mt.read(
        where={
            "ts": (
                dt.datetime(2024, 1, 9),
                dt.datetime(2024, 1, 12, 23, 59, 59, 999999),
            )
        }
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "value",
    )
