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


def should_evict_watermarked_cells_while_matching_batch_answer(
    spark, tmp_path
):
    """The st03 docstring's claim, driven: with a watermark on the
    event-time window, streaming state must stay BOUNDED over a long
    replay (old (type, hour) cells evicted as the watermark passes
    them) while the merged lake table still lands on exactly the batch
    hourly counts — including late-but-within-watermark arrivals."""
    import os
    import time

    from pyspark.sql import functions as F

    from geospatial_data_lake_spark.streaming.lake_sink import stream_upsert

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    base = "2026-01-01 00:00:00"
    rows_of_block = []
    n_blocks, block_hours = 8, 6
    for blk in range(n_blocks):
        rows = []
        for h in range(blk * block_hours, (blk + 1) * block_hours):
            for t, typ in enumerate(["A", "B", "C"]):
                for i in range(1 + (h + t) % 3):
                    rows.append((h * 100 + t * 10 + i, h, typ))
        if blk > 0:  # late data: previous block's last hour, 1-5h late
            lh = blk * block_hours - 1
            rows.append((90000 + blk, lh, "A"))
        rows_of_block.append(rows)
    for rows in rows_of_block:
        df = spark.createDataFrame(
            rows, "event_id long, h int, event_type string"
        ).select(
            "event_id",
            (
                F.to_timestamp(F.lit(base))
                + F.make_interval(hours=F.col("h"))
            ).alias("ts"),
            "event_type",
        )
        df.coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.2)  # distinct mtimes => deterministic file order

    mt = ManifestTable(
        spark,
        str(tmp_path / "table"),
        key_cols=["event_type", "hour"],
        partition_by=["event_type"],
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cells = (
        stream.withWatermark("ts", "6 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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
        str(tmp_path / "ckpt"),
        app_id="evict",
        output_mode="update",
    )
    q.awaitTermination(300)
    peak_state = max(
        p["stateOperators"][0]["numRowsTotal"]
        for p in (q.recentProgress or [])
        if p.get("stateOperators")
    )

    want = {
        (r.event_type, r.hour): r.cnt
        for r in spark.read.parquet(src)
        .groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd HH").alias("hour")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    got = {
        (r.event_type, r.hour): r.cnt for r in mt.read().collect()
    }
    assert got == want  # stream == batch, late rows included
    n_cells = len(want)
    assert n_cells == n_blocks * block_hours * 3
    # BOUNDED state: the watermark evicted closed cells as it advanced —
    # the peak live state is a fraction of the full cell space
    assert 0 < peak_state < n_cells * 0.6, (peak_state, n_cells)
