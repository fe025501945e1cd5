"""Lake-binding contract tests — written against the five-method
contract, parametrized over every binding importable in this
environment.  In this container only the ManifestTable binding resolves
(delta-spark cannot be installed); on a Delta-enabled cluster the same
test bodies run against DeltaLakeTable with zero changes — which is the
whole point: the contract, not the implementation, is what downstream
call sites (catalog, importer, streaming sinks) depend on."""

from __future__ import annotations

import pytest

from geospatial_data_lake_spark.sources.lake_binding import (
    HAVE_DELTA,
    open_lake_table,
    where_condition,
)

BINDINGS = ["manifest"] + (["delta"] if HAVE_DELTA else [])


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, part string, v string")


def _state(df):
    return {r.id: (r.part, r.v) for r in df.collect()}


@pytest.fixture(params=BINDINGS)
def lake(request, spark, tmp_path):
    return open_lake_table(
        spark,
        str(tmp_path / f"lake_{request.param}"),
        key_cols=["id"],
        partition_by=["part"],
        prefer=request.param,
    )


def should_roundtrip_append_upsert_and_time_travel(spark, lake):
    v1 = lake.upsert(_mk(spark, [(1, "a", "x"), (2, "b", "y")]))
    v2 = lake.upsert(_mk(spark, [(1, "a", "x2"), (3, "b", "z")]))
    assert v2 > v1
    assert lake.current_version() == v2
    assert _state(lake.read()) == {1: ("a", "x2"), 2: ("b", "y"), 3: ("b", "z")}
    # VERSION AS OF: the pre-merge snapshot is intact
    assert _state(lake.read(version=v1)) == {1: ("a", "x"), 2: ("b", "y")}
    versions = [h["version"] for h in lake.history()]
    assert v1 in versions and v2 in versions


def should_append_blindly_without_key_collision_checks(spark, lake):
    lake.append(_mk(spark, [(1, "a", "x")]))
    lake.append(_mk(spark, [(1, "a", "x")]))  # duplicate key: both survive
    rows = lake.read().collect()
    assert len(rows) == 2


def should_filter_reads_with_the_shared_predicate_spec(spark, lake):
    lake.append(
        spark.createDataFrame(
            [(i, "p", f"v{i}") for i in range(10)], "id long, part string, v string"
        )
    )
    got = {r.id for r in lake.read(where={"id": (3, 6)}).collect()}
    assert got == {3, 4, 5, 6}
    got2 = {r.id for r in lake.read(where={"id": 7}).collect()}
    assert got2 == {7}


def should_compile_predicate_spec_to_equivalent_column(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(8)], "id long, k string"
    )
    cond = where_condition({"id": (2, None), "k": "a"})
    got = {r.id for r in df.filter(cond).collect()}
    assert got == {3, 5, 7}
    assert df.filter(where_condition(None)).count() == 8
