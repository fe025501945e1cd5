"""The flagship end-to-end pipeline — SURVEY.md §3.1 re-architected.

``create_dataset_version`` replaces the reference's Step Functions state
machine (`infrastructure/processing_stack.py:285-319`): every state becomes
a DataFrame stage; the content-iterator/array-job machinery
(`backend/content_iterator/task.py`) disappears entirely — Spark
partitioning IS the batching.

    read root JSON -> BFS link traversal + validation (stac.py)
    -> assets + validation_results parquet
    -> distributed checksum verification (checksums.py)
    -> bool_and summary gate (A6)
    -> manifest build + distributed copy with href rewrite (importer.py)
    -> status view (status.py)
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark import schemas
from geospatial_data_lake_spark.plans import checksums, importer, stac
from geospatial_data_lake_spark.plans.catalog import DatasetCatalog, mint_version_id


@dataclass
class VersionRunResult:
    dataset_id: str
    version_id: str
    validation_passed: bool
    assets: DataFrame
    validation: DataFrame
    copy_status: DataFrame | None


def create_dataset_version(
    spark: SparkSession,
    catalog: DatasetCatalog,
    dataset_id: str,
    metadata_url: str,
    storage_root: str,
) -> VersionRunResult:
    """Validate + (conditionally) import one new dataset version."""
    dataset = catalog.get_dataset(dataset_id=dataset_id)
    version_id = mint_version_id()

    # 1) STAC traversal + structural validation
    assets, validation = stac.traverse_and_validate(
        spark, dataset_id, version_id, metadata_url
    )
    assets = assets.cache()

    # 2) checksum verification (one distributed job, no iteration windows)
    checksum_validation = checksums.verify_checksums(assets)
    validation = validation.unionByName(checksum_validation).cache()

    # 3) summary gate (A6 / limit-1 probe)
    passed = checksums.validation_summary(validation)

    # 4) conditional import with href rewrite
    copy_status = None
    if passed:
        target_prefix = os.path.join(
            storage_root, f"{dataset['title']}-{dataset_id}", version_id
        )
        manifest = importer.build_manifest(assets, target_prefix)
        copy_status = importer.run_copy(manifest).cache()
        copy_status.count()  # materialize the side effect exactly once

    catalog.register_version(
        dataset_id,
        version_id,
        metadata_url,
        "SUCCEEDED" if passed else "FAILED",
    )
    return VersionRunResult(
        dataset_id=dataset_id,
        version_id=version_id,
        validation_passed=passed,
        assets=assets,
        validation=validation,
        copy_status=copy_status,
    )
