"""Exactly-once streaming sinks into the manifest lake table.

Structured Streaming's ``foreachBatch`` gives at-least-once batch
delivery: after a crash the engine REPLAYS the last possibly-uncommitted
micro-batch with the SAME ``batch_id``.  Exactly-once therefore lives in
the sink: every commit stamps ``(app_id, batch_id)`` into the table's
manifest (``ManifestTable`` ``txn`` support — the Delta
``txn``/``SetTransaction`` mechanism), and a replayed batch whose id is
already recorded commits nothing.  Idempotency is checked inside the
table's own publish-retry loop, so it holds even when two replicas of
the same sink race the same batch.

The ref analog is the one-pipeline-run-per-version trigger
(backend/dataset_versions/create.py:71-75) upgraded to MERGE semantics:
each arriving micro-batch upserts into the versioned fact table instead
of appending a new dataset version.

Scale shape: each micro-batch pays exactly the table's commit cost —
one partitioned write job over the batch plus a small manifest document
— so sink throughput is bounded by batch size, never table size (upsert
rewrites only partitions the batch's keys touch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from geospatial_data_lake_spark.sources.manifest_table import ManifestTable


def _start(
    stream: DataFrame,
    batch_fn,
    checkpoint_dir: str,
    available_now: bool,
    output_mode: str | None = None,
):
    writer = stream.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if output_mode is not None:
        # streaming AGGREGATIONS need update/complete even under
        # foreachBatch: update mode delivers each group's CURRENT
        # accumulated value per micro-batch, which a keyed upsert
        # materializes arrival-order-independently
        writer = writer.outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert(
    stream: DataFrame,
    table: ManifestTable,
    checkpoint_dir: str,
    app_id: str,
    available_now: bool = True,
    output_mode: str | None = None,
):
    """MERGE each micro-batch into ``table`` exactly once.

    ``app_id`` identifies this logical sink across restarts (pair it
    1:1 with ``checkpoint_dir``); Structured Streaming's monotone
    ``batch_id`` becomes the txn version.  ``availableNow`` drains the
    backlog and stops (the incremental-batch pattern); pass
    ``available_now=False`` for a continuously running query.  Pass
    ``output_mode="update"`` when ``stream`` carries a stateful
    aggregation: each micro-batch then delivers the groups it changed
    with their current accumulated values, and the keyed MERGE turns
    that into the final table state regardless of arrival order."""
    return _start(
        stream,
        upsert_batch_fn(table, app_id),
        checkpoint_dir,
        available_now,
        output_mode,
    )


def stream_append(
    stream: DataFrame,
    table: ManifestTable,
    checkpoint_dir: str,
    app_id: str,
    available_now: bool = True,
):
    """Append each micro-batch to ``table`` exactly once (the blind
    O(batch) ingest path — no key dedup across batches)."""
    return _start(
        stream, append_batch_fn(table, app_id), checkpoint_dir, available_now
    )


def upsert_batch_fn(table: ManifestTable, app_id: str):
    """The raw ``foreachBatch`` callable (exposed so tests can replay a
    batch id directly, simulating the engine's crash-recovery path)."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        table.upsert(batch, txn=(app_id, batch_id))

    return _apply


def append_batch_fn(table: ManifestTable, app_id: str):
    def _apply(batch: DataFrame, batch_id: int) -> None:
        table.append(batch, txn=(app_id, batch_id))

    return _apply


def stream_dedup_ingest(
    stream: DataFrame,
    table: ManifestTable,
    checkpoint_dir: str,
    app_id: str,
    available_now: bool = True,
):
    """Dedup-gated document ingest: each micro-batch is fingerprinted
    (md5 of the sorted distinct token set — dd02's canonical form),
    deduplicated within the batch (min doc_id per fingerprint wins),
    probed against the CORPUS already in the table, and only the novel
    documents are appended — the admission gate every training-data
    lake runs in front of its corpus, as one exactly-once streaming
    pipeline.

    Scale shape: the within-batch dedup is one batch-sized shuffle; the
    corpus probe reads ONLY the table partitions matching the batch's
    fingerprint prefixes (``read(where={'pb': ...})`` stats pruning), so
    its cost is O(touched partitions), not O(table); the append is the
    blind O(batch) fast path.  The documented escalation past
    partition-level pruning is a bloom index on ``fp``
    (``bloom_cols=['fp']``) or probing a persisted dd04 band index for
    NEAR-dup admission (dd09's shape).  Exactly-once: the append is
    txn-stamped, so a crash-replayed micro-batch is a detectable no-op
    — double-admission is impossible even though the probe re-runs."""
    return _start(
        stream,
        dedup_ingest_batch_fn(table, app_id),
        checkpoint_dir,
        available_now,
    )


def dedup_ingest_batch_fn(table: ManifestTable, app_id: str):
    """The raw dedup-admission ``foreachBatch`` callable (exposed so
    tests can replay batches in a controlled order and re-deliver a
    batch id to exercise the crash-recovery path).  Expects document
    batches with at least (doc_id, text) columns; stores them with the
    derived ``fp`` (content fingerprint, the table key) and ``pb``
    (fingerprint hex prefix, the partition key)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from geospatial_data_lake_spark.plans.catalog import NotFoundError

    def _apply(batch: DataFrame, batch_id: int) -> None:
        fp = F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(F.split("text", " ")))
            )
        )
        b = batch.withColumn("fp", fp).withColumn(
            "pb", F.substring("fp", 1, 1)
        )
        first = Window.partitionBy("fp").orderBy("doc_id")
        b1 = (
            b.withColumn("__rn", F.row_number().over(first))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # corpus probe, pruned to the partitions this batch can touch
        # (<= 16 hex prefixes — a bounded driver-side list, never rows)
        try:
            seen = None
            for r in sorted(
                b1.select("pb").distinct().collect(), key=lambda r: r.pb
            ):
                part = table.read(where={"pb": r.pb}).select("fp")
                seen = part if seen is None else seen.unionByName(part)
            novel = b1.join(seen, "fp", "left_anti") if seen is not None else b1
        except NotFoundError:  # first batch: table never committed
            novel = b1
        table.append(novel, txn=(app_id, batch_id))

    return _apply
