"""Explicit StructType schemas for the catalog tables — SURVEY.md §1.

The reference's persistent model (pynamodb attributes + JSON-Schema request
validation) maps to fixed Spark schemas; production paths never rely on
schema inference (SURVEY §1.2)."""

from __future__ import annotations

from pyspark.sql import types as T

# ref: backend/datasets_model.py:43-66
DATASETS = T.StructType(
    [
        T.StructField("dataset_id", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

# ref: backend/dataset_versions/create.py:58-75
DATASET_VERSIONS = T.StructType(
    [
        T.StructField("dataset_id", T.StringType(), False),
        T.StructField("version_id", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("metadata_url", T.StringType(), False),
        T.StructField("execution_status", T.StringType(), False),
    ]
)

# ref: backend/processing_assets_model.py:17-21 (normalized composite key)
ASSETS = T.StructType(
    [
        T.StructField("dataset_id", T.StringType(), False),
        T.StructField("version_id", T.StringType(), False),
        T.StructField("item_type", T.StringType(), False),  # DATA | METADATA
        T.StructField("item_index", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("multihash", T.StringType(), True),  # null iff METADATA
    ]
)

# ref: backend/validation_results_model.py:34-39
VALIDATION_RESULTS = T.StructType(
    [
        T.StructField("dataset_id", T.StringType(), False),
        T.StructField("version_id", T.StringType(), False),
        T.StructField("check", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("result", T.StringType(), False),  # Passed | Failed
        T.StructField("details", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# ref: backend/import_status/get.py:140-155
COPY_JOBS = T.StructType(
    [
        T.StructField("dataset_id", T.StringType(), False),
        T.StructField("version_id", T.StringType(), False),
        T.StructField("job_type", T.StringType(), False),  # metadata | asset
        T.StructField("job_id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("failure_reasons", T.ArrayType(T.StringType()), True),
    ]
)

# STAC document shape (subset we traverse; open schema otherwise) —
# ref: backend/check_stac_metadata/utils.py:23-38,119-130
STAC_DOC = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField("stac_version", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField(
            "links",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("href", T.StringType(), True),
                        T.StructField("rel", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField(
            "assets",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField("href", T.StringType(), True),
                        T.StructField("file:checksum", T.StringType(), True),
                    ]
                ),
            ),
            True,
        ),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)

CHECK_JSON_PARSE = "JSON parse"
CHECK_JSON_SCHEMA = "JSON schema"
CHECK_DUPLICATE_ASSET = "duplicate asset name"
CHECK_CHECKSUM = "checksum"
RESULT_PASSED = "Passed"
RESULT_FAILED = "Failed"
