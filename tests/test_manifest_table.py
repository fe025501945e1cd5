"""ManifestTable protocol tests — the fact-table lake contract:
O(touched partitions) MERGE, snapshot-isolated reads, time travel,
file-level reference carrying, GC refcounting, and serializable
concurrent writers."""

from __future__ import annotations

import pytest

from geospatial_data_lake_spark.plans.catalog import NotFoundError
from geospatial_data_lake_spark.sources.manifest_table import ManifestTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, part string, v string")


def _state(df):
    return {r.id: (r.part, r.v) for r in df.collect()}


def _table(spark, tmp_path, **kw):
    return ManifestTable(
        spark, str(tmp_path / "mt"), key_cols=["id"], partition_by=["part"], **kw
    )


def should_merge_and_time_travel_partitioned(spark, tmp_path):
    mt = _table(spark, tmp_path)
    v1 = mt.upsert(_mk(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")]))
    v2 = mt.upsert(_mk(spark, [(2, "a", "Y2"), (4, "c", "w")]))
    assert (v1, v2) == (1, 2)
    assert _state(mt.read()) == {
        1: ("a", "x"), 2: ("a", "Y2"), 3: ("b", "z"), 4: ("c", "w"),
    }
    assert _state(mt.read(version=1)) == {
        1: ("a", "x"), 2: ("a", "y"), 3: ("b", "z"),
    }


def should_carry_untouched_partitions_by_reference(spark, tmp_path):
    """The O(delta) property: an upsert touching partition 'a' must reuse
    partition 'b's existing file list verbatim — no rewrite, no copy."""
    mt = _table(spark, tmp_path)
    mt.upsert(_mk(spark, [(1, "a", "x"), (3, "b", "z")]))
    before = mt.partition_files()
    mt.upsert(_mk(spark, [(1, "a", "x2")]))
    after = mt.partition_files()
    b_key = next(k for k in before if '"b"' in k)
    a_key = next(k for k in before if '"a"' in k)
    assert after[b_key] == before[b_key]  # carried by reference
    assert after[a_key] != before[a_key]  # rewritten


def should_handle_key_partition_moves(spark, tmp_path):
    """An update that moves a key to another partition must rewrite BOTH
    partitions — the old row may not survive in the old partition."""
    mt = _table(spark, tmp_path)
    mt.upsert(_mk(spark, [(1, "a", "x"), (2, "b", "y")]))
    mt.upsert(_mk(spark, [(1, "b", "moved")]))
    assert _state(mt.read()) == {1: ("b", "moved"), 2: ("b", "y")}
    # partition 'a' emptied out entirely -> dropped from the manifest
    assert not any('"a"' in k for k in mt.partition_files())


def should_bound_time_travel_and_refcount_gc(spark, tmp_path):
    """GC drops expired versions but must NOT unlink data files still
    referenced by retained manifests (files are shared by reference)."""
    mt = _table(spark, tmp_path, keep_versions=2)
    mt.upsert(_mk(spark, [(1, "a", "x"), (2, "b", "y")]))  # v1
    mt.upsert(_mk(spark, [(1, "a", "x2")]))  # v2 touches only 'a'
    mt.upsert(_mk(spark, [(1, "a", "x3")]))  # v3 -> v1 expires
    with pytest.raises(NotFoundError):
        mt.read(version=1)
    # v2's manifest still references partition 'b' files first written at
    # v1 — the expired-version GC must have kept them
    assert _state(mt.read(version=2)) == {1: ("a", "x2"), 2: ("b", "y")}
    assert _state(mt.read()) == {1: ("a", "x3"), 2: ("b", "y")}


def should_serialize_concurrent_manifest_writers(spark, tmp_path):
    """Racing writers on distinct partitions: every upsert survives, the
    version history is gap-free, and losers' orphaned files are cleaned."""
    from concurrent.futures import ThreadPoolExecutor

    root = str(tmp_path / "race_mt")
    n = 6

    def write(i):
        mt = ManifestTable(spark, root, key_cols=["id"], partition_by=["part"])
        return mt.upsert(_mk(spark, [(i, f"p{i}", f"w{i}")]))

    with ThreadPoolExecutor(max_workers=n) as pool:
        versions = list(pool.map(write, range(n)))

    assert sorted(versions) == list(range(1, n + 1))
    final = ManifestTable(spark, root, key_cols=["id"], partition_by=["part"])
    assert _state(final.read()) == {i: (f"p{i}", f"w{i}") for i in range(n)}


def should_materialize_cdc_stream_into_manifest_table(spark, tmp_path):
    """Streaming CDC -> versioned lake: a change stream drives
    foreachBatch -> ManifestTable.upsert. Each micro-batch lands as one
    committed version (incremental materialization with time travel),
    and because MERGE is idempotent on content, a redelivered batch —
    foreachBatch is at-least-once across restarts — changes no state."""
    import pandas as pd

    src = tmp_path / "cdc"
    src.mkdir()
    chk = str(tmp_path / "chk")
    mt = ManifestTable(
        spark, str(tmp_path / "lake"), key_cols=["id"], partition_by=["part"]
    )
    schema = "id long, part string, v string"
    delivered = []

    def on_batch(df, epoch_id):
        batch = df.localCheckpoint(eager=True)
        delivered.append(batch)
        mt.upsert(batch)

    def drain():
        q = (
            spark.readStream.schema(schema).json(str(src))
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    pd.DataFrame(
        [(1, "a", "x"), (2, "b", "y")], columns=["id", "part", "v"]
    ).to_json(src / "b1.json", orient="records", lines=True)
    drain()
    pd.DataFrame(
        [(2, "b", "y2"), (3, "c", "z")], columns=["id", "part", "v"]
    ).to_json(src / "b2.json", orient="records", lines=True)
    drain()

    assert _state(mt.read()) == {1: ("a", "x"), 2: ("b", "y2"), 3: ("c", "z")}
    v_after = mt.current_version()
    assert _state(mt.read(version=1)) == {1: ("a", "x"), 2: ("b", "y")}

    # simulate at-least-once redelivery of the last batch
    mt.upsert(delivered[-1])
    assert mt.current_version() == v_after + 1  # a commit happened...
    assert _state(mt.read()) == {1: ("a", "x"), 2: ("b", "y2"), 3: ("c", "z")}
    # ...but the state is unchanged (idempotent MERGE)


def should_evolve_schema_across_commits(spark, tmp_path):
    """Schema evolution: a commit adding a column must not rewrite
    untouched partitions — their carried-forward files simply surface
    NULL for the new column on read (mergeSchema), and time travel
    still returns each version under its own schema."""
    mt = _table(spark, tmp_path)
    mt.upsert(_mk(spark, [(1, "a", "x"), (2, "b", "y")]))
    before_b = mt.partition_files()[
        next(k for k in mt.partition_files() if '"b"' in k)
    ]

    widened = spark.createDataFrame(
        [(1, "a", "x2", "en")], "id long, part string, v string, lang string"
    )
    mt.upsert(widened)

    cur = mt.read()
    assert set(cur.columns) >= {"id", "part", "v", "lang"}
    rows = {r.id: (r.v, r.lang) for r in cur.collect()}
    assert rows[1] == ("x2", "en")
    assert rows[2] == ("y", None)  # untouched partition: new column is NULL
    # and partition b really was carried by reference, not rewritten
    after_b = mt.partition_files()[
        next(k for k in mt.partition_files() if '"b"' in k)
    ]
    assert after_b == before_b
    # time travel: version 1 predates the column entirely
    assert "lang" not in mt.read(version=1).columns


def should_append_blindly_and_compact(spark, tmp_path):
    """append is the O(batch) ingest path: files accumulate per
    partition with nothing read or rewritten; compact folds multi-file
    partitions back to one without changing row content."""
    mt = _table(spark, tmp_path)
    mt.append(_mk(spark, [(1, "a", "x")]))
    mt.append(_mk(spark, [(2, "a", "y"), (3, "b", "z")]))
    a_key = next(k for k in mt.partition_files() if '"a"' in k)
    assert len(mt.partition_files()[a_key]) == 2  # two appended files
    assert _state(mt.read()) == {1: ("a", "x"), 2: ("a", "y"), 3: ("b", "z")}

    v = mt.compact()
    assert v == 3
    assert len(mt.partition_files()[a_key]) == 1  # folded
    assert _state(mt.read()) == {1: ("a", "x"), 2: ("a", "y"), 3: ("b", "z")}
    assert mt.compact() is None  # nothing left to fold


def should_delete_where_with_partition_pruning(spark, tmp_path):
    """delete_where rewrites only partitions holding matching rows;
    untouched partitions carry by reference, and a fully-deleted
    partition leaves the manifest."""
    from pyspark.sql import functions as F

    mt = _table(spark, tmp_path)
    mt.upsert(_mk(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z"), (4, "c", "w")]))
    files_before = mt.partition_files()
    b_key = next(k for k in files_before if '"b"' in k)

    mt.delete_where((F.col("id") == 1) | (F.col("part") == "c"))
    assert _state(mt.read()) == {2: ("a", "y"), 3: ("b", "z")}
    files_after = mt.partition_files()
    assert files_after[b_key] == files_before[b_key]  # untouched, by reference
    assert not any('"c"' in k for k in files_after)  # fully deleted partition
    # time travel still sees the pre-delete state
    assert len(_state(mt.read(version=1))) == 4


def should_vacuum_orphaned_files_respecting_age_horizon(spark, tmp_path):
    """vacuum removes only files no retained manifest references, and
    only past the age horizon (a young orphan may belong to a writer
    that has not published yet)."""
    import os
    import time

    mt = _table(spark, tmp_path)
    mt.upsert(_mk(spark, [(1, "a", "x")]))

    # fake a crashed writer: a data batch dir never published
    orphan_dir = os.path.join(mt.root, "data", "deadbeef", "f.parquet")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-00000.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not really parquet")

    # young orphan survives the horizon
    assert mt.vacuum(min_age_seconds=3600) == []
    assert os.path.exists(orphan)

    # age it past the horizon -> removed; referenced files untouched
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    removed = mt.vacuum(min_age_seconds=3600)
    assert removed == [orphan]
    assert not os.path.exists(os.path.dirname(orphan))  # empty dirs swept
    assert _state(mt.read()) == {1: ("a", "x")}  # table intact
