"""Full-schema STAC validation tests — the reference's mutation strategy
(per-required-key deletion, tests/test_check_stac_metadata.py:381-401)
ported against the vendored draft-7 schema tree, plus RFC 3339 format
and GeoJSON geometry cases."""

from __future__ import annotations

import copy

import pytest

from geospatial_data_lake_spark.plans.stac_schema import (
    ROOT_SCHEMA_IDS,
    is_rfc3339_datetime,
    validate_stac_document,
)

VALID = {
    "Feature": {
        "type": "Feature",
        "stac_version": "1.0.0-rc.3",
        "id": "item-1",
        "geometry": None,
        "properties": {"datetime": "2026-01-01T00:00:00Z"},
        "links": [{"href": "./asset.json", "rel": "self"}],
        "assets": {"a1": {"href": "asset1.bin"}},
    },
    "Collection": {
        "type": "Collection",
        "stac_version": "1.0.0-rc.3",
        "id": "collection-1",
        "description": "c",
        "license": "MIT",
        "extent": {
            "spatial": {"bbox": [[-180, -90, 180, 90]]},
            "temporal": {"interval": [["2026-01-01T00:00:00Z", None]]},
        },
        "links": [],
    },
    "Catalog": {
        "type": "Catalog",
        "stac_version": "1.0.0-rc.3",
        "id": "catalog-1",
        "description": "root",
        "links": [{"href": "collection.json", "rel": "child"}],
    },
}

REQUIRED = {
    "Feature": [
        "type",
        "stac_version",
        "id",
        "geometry",
        "properties",
        "links",
        "assets",
    ],
    "Collection": [
        "type",
        "stac_version",
        "id",
        "description",
        "license",
        "extent",
        "links",
    ],
    "Catalog": ["type", "stac_version", "id", "description", "links"],
}


@pytest.mark.parametrize("stac_type", sorted(ROOT_SCHEMA_IDS))
def should_accept_valid_document(stac_type):
    assert validate_stac_document(VALID[stac_type]) is None


@pytest.mark.parametrize(
    "stac_type,key",
    [(t, k) for t, keys in REQUIRED.items() for k in keys],
)
def should_reject_document_missing_each_required_key(stac_type, key):
    doc = copy.deepcopy(VALID[stac_type])
    del doc[key]
    assert validate_stac_document(doc) is not None, f"{stac_type} without {key}"


@pytest.mark.parametrize(
    "bad",
    [
        "not-a-date",
        "2026-01-01",  # date only
        "2026-01-01T00:00:00",  # missing offset
        "2026-13-01T00:00:00Z",  # month 13
        "2026-01-32T00:00:00Z",  # day 32
        "2026-01-01T25:00:00Z",  # hour 25
        "2026-01-01 00:00:00Z",  # space separator
    ],
)
def should_reject_invalid_rfc3339_datetime(bad):
    doc = copy.deepcopy(VALID["Feature"])
    doc["properties"]["datetime"] = bad
    err = validate_stac_document(doc)
    assert err is not None and "date-time" in err, (bad, err)


@pytest.mark.parametrize(
    "good",
    [
        "2026-01-01T00:00:00Z",
        "2026-01-01t23:59:59z",
        "2026-01-01T00:00:00.123456Z",
        "2026-01-01T00:00:00+13:00",
        "2026-12-31T12:30:00-05:00",
    ],
)
def should_accept_valid_rfc3339_datetime(good):
    assert is_rfc3339_datetime(good)
    doc = copy.deepcopy(VALID["Feature"])
    doc["properties"]["datetime"] = good
    assert validate_stac_document(doc) is None


def should_require_start_end_when_datetime_null():
    doc = copy.deepcopy(VALID["Feature"])
    doc["properties"]["datetime"] = None
    assert validate_stac_document(doc) is not None
    doc["properties"]["start_datetime"] = "2026-01-01T00:00:00Z"
    doc["properties"]["end_datetime"] = "2026-01-02T00:00:00Z"
    assert validate_stac_document(doc) is None


def should_require_bbox_with_nonnull_geometry_and_forbid_without():
    doc = copy.deepcopy(VALID["Feature"])
    doc["geometry"] = {"type": "Point", "coordinates": [170.0, -43.5]}
    assert validate_stac_document(doc) is not None  # bbox missing
    doc["bbox"] = [170.0, -43.5, 170.0, -43.5]
    assert validate_stac_document(doc) is None
    doc["geometry"] = None
    assert validate_stac_document(doc) is not None  # bbox present w/o geometry


@pytest.mark.parametrize(
    "geometry",
    [
        {"type": "Point", "coordinates": [1.0]},  # 1-d position
        {"type": "Polygon", "coordinates": [[[0, 0], [1, 1], [0, 1]]]},  # open ring
        {"type": "Nonsense", "coordinates": []},
        {"type": "Point"},  # no coordinates
    ],
)
def should_reject_malformed_geojson_geometry(geometry):
    doc = copy.deepcopy(VALID["Feature"])
    doc["geometry"] = geometry
    doc["bbox"] = [0.0, 0.0, 1.0, 1.0]
    assert validate_stac_document(doc) is not None


@pytest.mark.parametrize(
    "geometry",
    [
        {"type": "Point", "coordinates": [170.0, -43.5]},
        {"type": "MultiPoint", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
        {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
        {
            "type": "Polygon",
            "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]],
        },
        {
            "type": "GeometryCollection",
            "geometries": [{"type": "Point", "coordinates": [0.0, 0.0]}],
        },
    ],
)
def should_accept_valid_geojson_geometry(geometry):
    doc = copy.deepcopy(VALID["Feature"])
    doc["geometry"] = geometry
    doc["bbox"] = [0.0, -43.5, 170.0, 1.0]
    assert validate_stac_document(doc) is None


def should_reject_wrong_stac_version_and_bad_link_objects():
    doc = copy.deepcopy(VALID["Catalog"])
    doc["stac_version"] = "0.9.0"
    assert validate_stac_document(doc) is not None
    doc = copy.deepcopy(VALID["Catalog"])
    doc["links"] = [{"href": "x.json"}]  # rel missing
    assert validate_stac_document(doc) is not None


def should_reject_malformed_collection_extent():
    doc = copy.deepcopy(VALID["Collection"])
    del doc["extent"]["temporal"]
    assert validate_stac_document(doc) is not None
    doc = copy.deepcopy(VALID["Collection"])
    doc["extent"]["spatial"]["bbox"] = [[0, 1]]  # 2-element bbox
    assert validate_stac_document(doc) is not None
    doc = copy.deepcopy(VALID["Collection"])
    doc["extent"]["temporal"]["interval"] = [["bad-date", None]]
    assert validate_stac_document(doc) is not None


def should_reject_asset_without_href():
    doc = copy.deepcopy(VALID["Feature"])
    doc["assets"] = {"a1": {"title": "no href"}}
    assert validate_stac_document(doc) is not None
