"""Exactly-once streaming sinks into ManifestTable.

Structured Streaming replays the last micro-batch after a crash, so the
sink's idempotency (txn stamping in the manifest) is what upgrades
foreachBatch's at-least-once to exactly-once.  These tests drive the
real streaming path (file source -> foreachBatch -> MERGE) and the
replay path directly (same batch id applied twice)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geospatial_data_lake_spark.sources.manifest_table import ManifestTable
from geospatial_data_lake_spark.streaming.lake_sink import (
    append_batch_fn,
    stream_upsert,
    upsert_batch_fn,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, part string, v string")


def _state(df):
    return {r.id: (r.part, r.v) for r in df.collect()}


def _table(spark, tmp_path) -> ManifestTable:
    return ManifestTable(
        spark, str(tmp_path / "mt"), key_cols=["id"], partition_by=["part"]
    )


def should_ignore_replayed_upsert_batch(spark, tmp_path):
    """Applying the same (app, batch_id) twice — the crash-replay path —
    must commit exactly once: version unchanged, data unchanged."""
    mt = _table(spark, tmp_path)
    apply = upsert_batch_fn(mt, "sink-a")
    apply(_mk(spark, [(1, "a", "x"), (2, "b", "y")]), 0)
    v_after_first = mt.current_version()
    apply(_mk(spark, [(1, "a", "x"), (2, "b", "y")]), 0)  # replay
    assert mt.current_version() == v_after_first
    assert _state(mt.read()) == {1: ("a", "x"), 2: ("b", "y")}
    # the NEXT batch id commits normally
    apply(_mk(spark, [(1, "a", "x2")]), 1)
    assert mt.current_version() == v_after_first + 1
    assert _state(mt.read())[1] == ("a", "x2")
    assert mt.last_txn_version("sink-a") == 1


def should_ignore_replayed_append_batch(spark, tmp_path):
    """Append replay must not double rows (blind append has no key dedup
    to hide behind — only the txn check prevents duplication)."""
    mt = _table(spark, tmp_path)
    apply = append_batch_fn(mt, "sink-b")
    apply(_mk(spark, [(1, "a", "x"), (2, "a", "y")]), 0)
    apply(_mk(spark, [(1, "a", "x"), (2, "a", "y")]), 0)  # replay
    assert mt.read().count() == 2


def should_track_txns_per_app(spark, tmp_path):
    """Two independent sinks into one table keep separate txn cursors;
    maintenance commits (delete/compact) carry both forward."""
    mt = _table(spark, tmp_path)
    upsert_batch_fn(mt, "sink-a")(_mk(spark, [(1, "a", "x")]), 5)
    upsert_batch_fn(mt, "sink-b")(_mk(spark, [(2, "b", "y")]), 3)
    mt.delete_where(F.col("id") == 999)  # no-op delete, still a commit
    assert mt.last_txn_version("sink-a") == 5
    assert mt.last_txn_version("sink-b") == 3
    assert mt.last_txn_version("never-seen") == -1
    # replay of either sink's recorded batch is still a no-op
    v = mt.current_version()
    upsert_batch_fn(mt, "sink-a")(_mk(spark, [(1, "a", "CLOBBER")]), 5)
    assert mt.current_version() == v
    assert _state(mt.read())[1] == ("a", "x")


def should_stream_merge_into_lake_exactly_once(spark, tmp_path):
    """End-to-end: a file-source stream MERGEs into the table via
    availableNow; a second start over the same checkpoint (plus new
    input) applies only the NEW data — the restart contract."""
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    mt = _table(spark, tmp_path)
    _mk(spark, [(1, "a", "x"), (2, "b", "y")]).write.mode("overwrite").parquet(
        str(src)
    )
    stream = spark.readStream.schema("id long, part string, v string").parquet(
        str(src)
    )
    q = stream_upsert(stream, mt, ckpt, app_id="e2e")
    q.awaitTermination(120)
    assert _state(mt.read()) == {1: ("a", "x"), 2: ("b", "y")}
    v1 = mt.current_version()

    # drain again with no new input: no new commits
    q = stream_upsert(stream, mt, ckpt, app_id="e2e")
    q.awaitTermination(120)
    assert mt.current_version() == v1

    # new file arrives; restart applies exactly the delta
    _mk(spark, [(2, "b", "y2"), (3, "c", "z")]).write.mode("append").parquet(
        str(src)
    )
    q = stream_upsert(stream, mt, ckpt, app_id="e2e")
    q.awaitTermination(120)
    assert _state(mt.read()) == {
        1: ("a", "x"), 2: ("b", "y2"), 3: ("c", "z"),
    }


def should_reject_cross_batch_duplicates_in_dedup_ingest(spark, tmp_path):
    """The dedup admission gate must (1) keep the min-doc_id survivor
    within a batch, (2) reject a LATER batch's doc whose fingerprint is
    already in the corpus — even with reordered/repeated tokens — and
    (3) treat a crash-replayed batch id as a no-op."""
    from geospatial_data_lake_spark.streaming.lake_sink import (
        dedup_ingest_batch_fn,
    )

    mt = ManifestTable(
        spark, str(tmp_path / "mt"), key_cols=["fp"], partition_by=["pb"]
    )
    apply = dedup_ingest_batch_fn(mt, "ingest-a")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    apply(mk([(1, "x y z"), (2, "x y z")]), 0)  # within-batch dup
    assert {r.doc_id for r in mt.read().collect()} == {1}
    # (3, "z y x x") normalizes to the SAME token set {x, y, z} -> reject
    apply(mk([(3, "z y x x"), (4, "totally different words")]), 1)
    assert {r.doc_id for r in mt.read().collect()} == {1, 4}
    v = mt.current_version()
    apply(mk([(3, "z y x x"), (4, "totally different words")]), 1)  # replay
    assert mt.current_version() == v
    assert {r.doc_id for r in mt.read().collect()} == {1, 4}
