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


def _start(stream: DataFrame, batch_fn, checkpoint_dir: str, available_now: bool):
    writer = stream.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert(
    stream: DataFrame,
    table: ManifestTable,
    checkpoint_dir: str,
    app_id: str,
    available_now: bool = True,
):
    """MERGE each micro-batch into ``table`` exactly once.

    ``app_id`` identifies this logical sink across restarts (pair it
    1:1 with ``checkpoint_dir``); Structured Streaming's monotone
    ``batch_id`` becomes the txn version.  ``availableNow`` drains the
    backlog and stops (the incremental-batch pattern); pass
    ``available_now=False`` for a continuously running query."""
    return _start(
        stream, upsert_batch_fn(table, app_id), checkpoint_dir, available_now
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
