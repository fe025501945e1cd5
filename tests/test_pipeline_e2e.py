"""Golden-path E2E: STAC tree -> validate -> checksum -> import -> status.

Mirrors the reference's end-to-end test shape
(tests/test_processing_stack.py:83-262: 3-doc STAC tree + 2 assets,
assert exact final status) including the negative checksum-mismatch path
(test_processing_stack.py:400)."""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from geospatial_data_lake_spark.plans import checksums, stac, status
from geospatial_data_lake_spark.plans.catalog import (
    ConflictError,
    DatasetCatalog,
    ValidationError,
)
from geospatial_data_lake_spark.plans.pipeline import create_dataset_version


def _multihash(payload: bytes) -> str:
    return "1220" + hashlib.sha256(payload).hexdigest()


@pytest.fixture
def stac_tree(tmp_path):
    """catalog -> collection -> item with two binary assets (one path also
    plants a checksum mismatch toggle)."""
    asset1 = tmp_path / "asset1.bin"
    asset1.write_bytes(b"payload-one")
    asset2 = tmp_path / "asset2.bin"
    asset2.write_bytes(b"")  # empty file, ref tests/aws_utils.py:44-45

    item = {
        "type": "Feature",
        "stac_version": "1.0.0-rc.3",
        "id": "item-1",
        "geometry": None,
        "properties": {"datetime": "2026-01-01T00:00:00Z"},
        "links": [],
        "assets": {
            "a1": {"href": "asset1.bin", "file:checksum": _multihash(b"payload-one")},
            "a2": {"href": "asset2.bin", "file:checksum": _multihash(b"")},
        },
    }
    collection = {
        "type": "Collection",
        "stac_version": "1.0.0-rc.3",
        "id": "collection-1",
        "description": "c",
        "license": "MIT",
        "extent": {
            "spatial": {"bbox": [[-180, -90, 180, 90]]},
            "temporal": {"interval": [["2026-01-01T00:00:00Z", None]]},
        },
        "links": [{"href": "item.json", "rel": "child"}],
    }
    catalog_doc = {
        "type": "Catalog",
        "stac_version": "1.0.0-rc.3",
        "id": "catalog-1",
        "description": "root",
        "links": [
            {"href": "collection.json", "rel": "child"},
            {"href": "catalog.json", "rel": "self"},  # cycle, must not loop
        ],
    }
    (tmp_path / "item.json").write_text(json.dumps(item))
    (tmp_path / "collection.json").write_text(json.dumps(collection))
    (tmp_path / "catalog.json").write_text(json.dumps(catalog_doc))
    return tmp_path


def should_run_golden_path(spark, stac_tree, tmp_path):
    catalog = DatasetCatalog(spark, str(tmp_path / "catalog_store"))
    ds = catalog.create_dataset("golden_path_ds")
    result = create_dataset_version(
        spark,
        catalog,
        ds["dataset_id"],
        str(stac_tree / "catalog.json"),
        str(tmp_path / "storage"),
    )
    assert result.validation_passed, result.validation.collect()

    assets = {
        (r.item_type, os.path.basename(r.url)): r for r in result.assets.collect()
    }
    assert ("METADATA", "catalog.json") in assets
    assert ("METADATA", "collection.json") in assets
    assert ("METADATA", "item.json") in assets
    assert ("DATA", "asset1.bin") in assets
    assert ("DATA", "asset2.bin") in assets
    # dense 0-based indexes per item_type (W1)
    meta_indexes = sorted(
        r.item_index for (t, _), r in assets.items() if t == "METADATA"
    )
    assert meta_indexes == [0, 1, 2]

    copied = {os.path.basename(r.target): r.status for r in result.copy_status.collect()}
    assert all(s == "Complete" for s in copied.values())
    # metadata hrefs rewritten to basenames (S10)
    storage = tmp_path / "storage"
    copied_catalogs = list(storage.rglob("catalog.json"))
    assert copied_catalogs, "catalog.json not copied"
    rewritten = json.loads(copied_catalogs[0].read_text())
    assert all("/" not in l["href"] for l in rewritten["links"])

    # status view: one row, everything green
    versions = catalog.versions()
    view = status.status_view(
        versions,
        result.validation,
        spark.createDataFrame(
            [
                (ds["dataset_id"], result.version_id, "metadata", "j1", "Complete", []),
                (ds["dataset_id"], result.version_id, "asset", "j2", "Complete", []),
            ],
            "dataset_id string, version_id string, job_type string, job_id string, status string, failure_reasons array<string>",
        ),
    ).collect()
    assert len(view) == 1
    row = view[0].asDict()
    assert row["validation_status"] == "Passed"
    assert row["metadata_upload_status"] == "Complete"
    assert row["asset_upload_status"] == "Complete"
    assert row["n_failures"] == 0


def should_skip_copy_on_checksum_mismatch(spark, stac_tree, tmp_path):
    # plant a mismatch: overwrite asset1 after manifest hashes were minted
    (stac_tree / "asset1.bin").write_bytes(b"tampered!")
    catalog = DatasetCatalog(spark, str(tmp_path / "catalog_store"))
    ds = catalog.create_dataset("mismatch_ds")
    result = create_dataset_version(
        spark,
        catalog,
        ds["dataset_id"],
        str(stac_tree / "catalog.json"),
        str(tmp_path / "storage"),
    )
    assert not result.validation_passed
    assert result.copy_status is None  # import skipped
    failed = result.validation.filter(F.col("result") == "Failed").collect()
    assert len(failed) == 1
    assert failed[0].check == "checksum"
    assert "mismatch" in failed[0].details["message"]
    # skip-propagation in the status view (ref get.py:79-85)
    view = status.status_view(
        catalog.versions(),
        result.validation,
        spark.createDataFrame(
            [], "dataset_id string, version_id string, job_type string, job_id string, status string, failure_reasons array<string>"
        ),
    ).collect()
    assert view[0].validation_status == "Failed"
    assert view[0].metadata_upload_status == "Skipped"
    assert view[0].asset_upload_status == "Skipped"


def should_reject_invalid_json_and_duplicate_keys(spark, tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text('{"type": "Catalog", "type": "Collection"}')
    assets, validation = stac.traverse_and_validate(spark, "d", "v", str(bad))
    rows = validation.collect()
    assert any(
        r.check == "JSON parse" and "duplicate keys" in r.details["message"]
        for r in rows
    )

    notjson = tmp_path / "notjson.json"
    notjson.write_text("{nope")
    _, validation2 = stac.traverse_and_validate(spark, "d", "v", str(notjson))
    assert any(r.result == "Failed" for r in validation2.collect())


def should_enforce_catalog_crud_invariants(spark, tmp_path):
    catalog = DatasetCatalog(spark, str(tmp_path / "store"))
    with pytest.raises(ValidationError):
        catalog.create_dataset("bad title!")  # regex (P4/F14)
    ds = catalog.create_dataset("unique_title")
    with pytest.raises(ConflictError):
        catalog.create_dataset("unique_title")  # uniqueness (A3)
    got = catalog.get_dataset(title="unique_title")
    assert got["dataset_id"] == ds["dataset_id"]
    catalog.register_version(ds["dataset_id"], "v1", "file:///x", "SUCCEEDED")
    with pytest.raises(ConflictError):
        catalog.delete_dataset(ds["dataset_id"])  # anti-join guard (J5)


def should_serialize_concurrent_catalog_writers(spark, tmp_path):
    """The commit protocol's guarantee: N racing writers on one catalog
    root produce a serializable history — no lost inserts, and duplicate
    titles hit the uniqueness precondition in exactly one of the two
    racers (never both succeed)."""
    from concurrent.futures import ThreadPoolExecutor

    root = str(tmp_path / "race_store")
    titles = ["t_a", "t_b", "t_c", "t_a", "t_b", "t_c", "only_one"]

    def try_create(title):
        cat = DatasetCatalog(spark, root)  # each writer: own handle, shared root
        try:
            cat.create_dataset(title)
            return (title, "ok")
        except ConflictError:
            return (title, "conflict")

    with ThreadPoolExecutor(max_workers=7) as pool:
        outcomes = list(pool.map(try_create, titles))

    ok = sorted(t for t, s in outcomes if s == "ok")
    assert ok.count("t_a") == 1 and ok.count("t_b") == 1 and ok.count("t_c") == 1
    assert "only_one" in ok
    final = DatasetCatalog(spark, root).datasets().collect()
    assert sorted(r.title for r in final) == ["only_one", "t_a", "t_b", "t_c"]
    assert len({r.dataset_id for r in final}) == 4  # no lost/duplicated inserts


def should_detect_conflicting_duplicate_asset_references(spark, tmp_path):
    """U4: same asset referenced twice with different multihash => Failed."""
    item1 = {
        "type": "Feature",
        "stac_version": "1.0.0-rc.3",
        "id": "i1",
        "geometry": None,
        "properties": {"datetime": "2026-01-01T00:00:00Z"},
        "links": [],
        "assets": {"a": {"href": "shared.bin", "file:checksum": "1220" + "a" * 64}},
    }
    item2 = dict(item1, id="i2", assets={"a": {"href": "shared.bin", "file:checksum": "1220" + "b" * 64}})
    root = {
        "type": "Catalog",
        "stac_version": "1.0.0-rc.3",
        "id": "root",
        "description": "r",
        "links": [
            {"href": "i1.json", "rel": "child"},
            {"href": "i2.json", "rel": "child"},
        ],
    }
    (tmp_path / "i1.json").write_text(json.dumps(item1))
    (tmp_path / "i2.json").write_text(json.dumps(item2))
    (tmp_path / "root.json").write_text(json.dumps(root))
    (tmp_path / "shared.bin").write_bytes(b"x")
    _, validation = stac.traverse_and_validate(spark, "d", "v", str(tmp_path / "root.json"))
    assert any(r.check == "duplicate asset name" for r in validation.collect())


def should_stream_digest_match_reference_semantics(spark, tmp_path):
    """Chunked streaming hash equals whole-file sha256 (A5/X4)."""
    big = tmp_path / "big.bin"
    payload = os.urandom(3 * (1 << 20) + 17)  # crosses chunk boundaries
    big.write_bytes(payload)
    assets = spark.createDataFrame(
        [("d", "v", "DATA", 0, str(big), _multihash(payload))],
        "dataset_id string, version_id string, item_type string, item_index long, url string, multihash string",
    )
    rows = checksums.verify_checksums(assets).collect()
    assert len(rows) == 1 and rows[0].result == "Passed"


def should_dispatch_multihash_function_codes(spark, tmp_path):
    """One manifest mixing sha1 / sha2-256 / sha2-512 / sha3-256
    multihashes: every algorithm verifies via the FUNCS dispatch
    (ref: check_files_checksums/utils.py:98-99)."""
    payload = b"multi-algorithm payload"
    f = tmp_path / "data.bin"
    f.write_bytes(payload)
    rows_in = [
        ("d", "v", "DATA", i, str(f), checksums.make_multihash(payload, algo))
        for i, algo in enumerate(["sha1", "sha256", "sha512", "sha3_256"])
    ]
    assets = spark.createDataFrame(
        rows_in,
        "dataset_id string, version_id string, item_type string,"
        " item_index long, url string, multihash string",
    )
    rows = checksums.verify_checksums(assets).collect()
    assert len(rows) == 4
    assert all(r.result == "Passed" for r in rows), [
        (r.result, r.details) for r in rows
    ]


def should_flag_unknown_multihash_code_as_unsupported(spark, tmp_path):
    """An unregistered fn code fails with a distinct 'unsupported hash
    function' detail, not a generic mismatch."""
    f = tmp_path / "data.bin"
    f.write_bytes(b"payload")
    assets = spark.createDataFrame(
        [("d", "v", "DATA", 0, str(f), "ff20" + "0" * 64)],
        "dataset_id string, version_id string, item_type string,"
        " item_index long, url string, multihash string",
    )
    rows = checksums.verify_checksums(assets).collect()
    assert len(rows) == 1
    assert rows[0].result == "Failed"
    assert "unsupported hash function 0xff" in rows[0].details["message"]


def should_detect_corrupted_payload_for_each_algorithm(spark, tmp_path):
    """A wrong digest still fails per algorithm (mismatch path unaffected
    by the dispatch)."""
    f = tmp_path / "data.bin"
    f.write_bytes(b"actual contents")
    rows_in = [
        ("d", "v", "DATA", i, str(f), checksums.make_multihash(b"other", algo))
        for i, algo in enumerate(["sha1", "sha512"])
    ]
    assets = spark.createDataFrame(
        rows_in,
        "dataset_id string, version_id string, item_type string,"
        " item_index long, url string, multihash string",
    )
    rows = checksums.verify_checksums(assets).collect()
    assert all(r.result == "Failed" for r in rows)
    assert all("checksum mismatch" in r.details["message"] for r in rows)


def should_time_travel_catalog_state(spark, tmp_path):
    """Catalog time travel: each CRUD mutation is one generation; a
    reader can replay the exact dataset table any earlier round planned
    against, bounded by the retention window."""
    import pytest

    from geospatial_data_lake_spark.plans.catalog import NotFoundError

    catalog = DatasetCatalog(spark, str(tmp_path / "tt_store"))
    catalog.create_dataset("first")
    catalog.create_dataset("second")
    ds = catalog.get_dataset(title="second")
    catalog.update_dataset(ds["dataset_id"], "second_renamed")

    assert catalog.catalog_history() == [1, 2, 3]
    assert {r.title for r in catalog.datasets_at(1).collect()} == {"first"}
    assert {r.title for r in catalog.datasets_at(2).collect()} == {"first", "second"}
    assert {r.title for r in catalog.datasets_at(3).collect()} == {
        "first", "second_renamed",
    }
    with pytest.raises(NotFoundError):
        catalog.datasets_at(99)


def should_run_quickstart_example_end_to_end(spark, sf_dir):
    """examples/quickstart.py is executable documentation: every
    section (lake, registry, GeoParquet) runs and returns nonzero
    headline numbers against the fixtures."""
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).parent.parent / "examples" / "quickstart.py"
    spec = importlib.util.spec_from_file_location("quickstart", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(spark, sf_dir)
    assert out["lake_rows"] > 0
    assert out["lake_files"] > 0
    assert out["registry_queries"] >= 235
    assert out["dedup_pairs"] > 0
    assert out["ann_topk_rows"] == 15
    assert out["gapfilled_hours"] > 0
    assert out["semdedup_clusters"] > 0
    assert out["geo_window_rows"] > 0
