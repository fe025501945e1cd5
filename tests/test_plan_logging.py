"""Logging-contract tests — the parallel-file tier from the reference
(SURVEY §5.6: tests/test_import_dataset_logging.py and friends).

Contract: every pipeline plan DEBUG-logs its input payload as one JSON
document under an "event" key at entry, and WARNING-logs failures as
JSON under an "error" key — so a log pipeline parses every line with
json.loads, never a regex.  Log points are driver-side only (a per-row
executor log would be a scale bug)."""

from __future__ import annotations

import json
import logging

import pytest

from geospatial_data_lake_spark.plans.logging_contract import ERROR_KEY, EVENT_KEY


def _json_records(caplog, logger_name, level):
    out = []
    for rec in caplog.records:
        if rec.name == logger_name and rec.levelno == level:
            try:
                out.append(json.loads(rec.getMessage()))
            except ValueError:
                pytest.fail(f"non-JSON log line from {logger_name}: {rec.getMessage()}")
    return out


def should_log_stac_traversal_payload(spark, tmp_path, caplog):
    from geospatial_data_lake_spark.plans.stac import traverse_and_validate

    root = tmp_path / "root.json"
    root.write_text(
        json.dumps(
            {
                "type": "Catalog",
                "stac_version": "1.0.0-rc.3",
                "id": "root",
                "description": "d",
                "links": [],
            }
        )
    )
    with caplog.at_level(logging.DEBUG, logger="geospatial_data_lake_spark.plans.stac"):
        traverse_and_validate(spark, "ds1", "v1", f"file://{root}")
    events = _json_records(caplog, "geospatial_data_lake_spark.plans.stac", logging.DEBUG)
    assert {
        "task": "check_stac_metadata",
        "dataset_id": "ds1",
        "version_id": "v1",
        "metadata_url": f"file://{root}",
    } in [e[EVENT_KEY] for e in events if EVENT_KEY in e]


def should_log_importer_payload(spark, caplog):
    from geospatial_data_lake_spark.plans.importer import build_manifest, run_copy

    assets = spark.createDataFrame(
        [("file:///x/a.bin", "DATA")], "url string, item_type string"
    )
    logger = "geospatial_data_lake_spark.plans.importer"
    with caplog.at_level(logging.DEBUG, logger=logger):
        manifest = build_manifest(assets, "file:///target/")
        run_copy(manifest)  # plan construction logs; no action needed
    payloads = [e[EVENT_KEY] for e in _json_records(caplog, logger, logging.DEBUG)]
    assert {"task": "import_dataset", "target_prefix": "file:///target/"} in payloads
    assert {"task": "import_asset_files"} in payloads


def should_log_checksum_payload_and_failure(spark, caplog):
    from geospatial_data_lake_spark import schemas
    from geospatial_data_lake_spark.plans.checksums import (
        validation_summary,
        verify_checksums,
    )

    assets = spark.createDataFrame(
        [("d", "v", "file:///nonexistent.bin", "1220" + "0" * 64, "DATA")],
        "dataset_id string, version_id string, url string, multihash string,"
        " item_type string",
    )
    logger = "geospatial_data_lake_spark.plans.checksums"
    with caplog.at_level(logging.DEBUG, logger=logger):
        validation = verify_checksums(assets)
        ok = validation_summary(validation)
    assert not ok  # unreadable file must fail the summary
    events = _json_records(caplog, logger, logging.DEBUG)
    assert {"task": "check_files_checksums"} in [
        e[EVENT_KEY] for e in events if EVENT_KEY in e
    ]
    errors = _json_records(caplog, logger, logging.WARNING)
    assert any(ERROR_KEY in e for e in errors)


def should_log_catalog_validation_and_conflict_errors(spark, tmp_path, caplog):
    from geospatial_data_lake_spark.plans.catalog import (
        ConflictError,
        DatasetCatalog,
        ValidationError,
    )

    catalog = DatasetCatalog(spark, str(tmp_path / "store"))
    logger = "geospatial_data_lake_spark.plans.catalog"
    with caplog.at_level(logging.DEBUG, logger=logger):
        with pytest.raises(ValidationError):
            catalog.create_dataset("bad title!")
        catalog.create_dataset("good_title")
        with pytest.raises(ConflictError):
            catalog.create_dataset("good_title")
    payloads = [e[EVENT_KEY] for e in _json_records(caplog, logger, logging.DEBUG)]
    assert payloads.count({"task": "datasets_create", "title": "good_title"}) == 2
    errors = [e[ERROR_KEY] for e in _json_records(caplog, logger, logging.WARNING)]
    assert any("does not match" in m for m in errors)
    assert any("already exists" in m for m in errors)
