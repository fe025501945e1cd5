"""VersionedTable protocol tests — the contract a Delta/Iceberg backend
would have to keep: MERGE semantics, VERSION AS OF, history, bounded
retention, and serializable multi-writer commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geospatial_data_lake_spark.plans.catalog import NotFoundError
from geospatial_data_lake_spark.sources.versioned import VersionedTable


def _state(df):
    return {r.id: r.v for r in df.collect()}


def should_merge_upserts_and_time_travel(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "vt"))
    v1 = vt.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), ["id"])
    v2 = vt.upsert(spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"), ["id"])
    assert (v1, v2) == (1, 2)

    assert _state(vt.read()) == {1: "a", 2: "B", 3: "c"}  # update wins, rest survive
    assert _state(vt.read(version=1)) == {1: "a", 2: "b"}  # VERSION AS OF
    assert vt.current_version() == 2

    hist = vt.history()
    assert [h["version"] for h in hist] == [2, 1]
    assert hist[0]["committed_at"] >= hist[1]["committed_at"]


def should_delete_where_as_new_version(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "vt"))
    vt.overwrite(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string"))
    v = vt.delete_where(F.col("id") == 2)
    assert v == 2
    assert _state(vt.read()) == {1: "a", 3: "c"}
    assert _state(vt.read(version=1)) == {1: "a", 2: "b", 3: "c"}  # old state intact


def should_bound_time_travel_by_retention_window(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "vt"), keep_versions=3)
    for i in range(5):
        vt.overwrite(spark.createDataFrame([(i, str(i))], "id long, v string"))
    assert vt.current_version() == 5
    assert _state(vt.read(version=3)) == {2: "2"}  # inside the window
    with pytest.raises(NotFoundError):
        vt.read(version=1)  # GC'd
    with pytest.raises(NotFoundError):
        vt.read(version=99)  # never committed


def should_serialize_concurrent_upsert_writers(spark, tmp_path):
    """No lost updates under racing writers: each writer merges one
    distinct key through its own handle on a shared root; the atomic
    commit point forces losers to re-merge against the winner's state,
    so the final table holds every writer's row and the history is one
    committed generation per writer."""
    from concurrent.futures import ThreadPoolExecutor

    root = str(tmp_path / "race_vt")
    n = 8

    def write(i):
        vt = VersionedTable(spark, root)
        return vt.upsert(
            spark.createDataFrame([(i, f"w{i}")], "id long, v string"), ["id"]
        )

    with ThreadPoolExecutor(max_workers=n) as pool:
        versions = list(pool.map(write, range(n)))

    assert sorted(versions) == list(range(1, n + 1))  # serialized, gap-free
    final = VersionedTable(spark, root)
    assert _state(final.read()) == {i: f"w{i}" for i in range(n)}
    assert final.current_version() == n


def should_keep_null_predicate_rows_on_delete(spark, tmp_path):
    """SQL DELETE removes only TRUE-predicate rows: a NULL predicate
    (e.g. comparing a NULL column) must not delete the row."""
    vt = VersionedTable(spark, str(tmp_path / "vt_null"))
    vt.overwrite(
        spark.createDataFrame(
            [(1, "x"), (2, None), (3, "y")], "id long, v string"
        )
    )
    vt.delete_where(F.col("v") == "x")
    assert {r.id: r.v for r in vt.read().collect()} == {2: None, 3: "y"}


def should_merge_null_keys_without_duplicating(spark, tmp_path):
    """MERGE key matching is null-safe: upserting a NULL-keyed row
    replaces the existing NULL-keyed row instead of leaving both."""
    vt = VersionedTable(spark, str(tmp_path / "vt_nullkey"))
    vt.overwrite(
        spark.createDataFrame([(None, "old"), (1, "x")], "id long, v string")
    )
    vt.upsert(
        spark.createDataFrame([(None, "new")], "id long, v string"),
        key_cols=["id"],
    )
    rows = sorted(((r.id, r.v) for r in vt.read().collect()), key=repr)
    assert rows == sorted([(None, "new"), (1, "x")], key=repr)
