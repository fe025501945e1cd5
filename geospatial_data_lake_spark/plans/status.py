"""Import-status view — SURVEY.md §3.3.

The reference fuses three remote lookups per GET (Step Functions
describe_execution, validation-failure GSI query, per-job S3 Batch
describe_job — `backend/import_status/get.py:39-94`) plus a
skip-propagation rule (failed validation forces upload statuses to
``Skipped``, get.py:79-85).

Here the whole thing is ONE relational query: left-outer joins (J3) of the
executions, aggregated validation errors, and copy-job frames, with
when/otherwise outcome columns — recomputable on demand or maintainable as
a streaming 'update'-mode view (streaming/, T3)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geospatial_data_lake_spark import schemas


def status_view(
    executions: DataFrame,
    validation_results: DataFrame,
    copy_jobs: DataFrame,
) -> DataFrame:
    """One row per (dataset_id, version_id) with validation + upload status.

    executions: schemas.DATASET_VERSIONS rows (execution_status per ref
    get.py:105). copy_jobs: schemas.COPY_JOBS rows.
    """
    keys = ["dataset_id", "version_id"]

    errors = (
        validation_results.filter(F.col("result") == schemas.RESULT_FAILED)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_failures"),
            # deterministic error report (A7): sorted struct list — the map
            # field is JSON-encoded because maps are not orderable
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("check"), F.col("url"), F.to_json("details").alias("details")
                    )
                )
            ).alias("errors"),
        )
    )

    jobs = copy_jobs.groupBy(*keys).pivot("job_type", ["metadata", "asset"]).agg(
        F.first("status")
    )

    # validation outcome state machine — ref get.py:97-107
    validation_outcome = (
        F.when(F.col("n_failures").isNotNull() & (F.col("n_failures") > 0), "Failed")
        .when(F.col("execution_status") == "SUCCEEDED", "Passed")
        .when(F.col("execution_status") == "RUNNING", "Pending")
        .otherwise("Failed")
    )

    # skip-propagation — ref get.py:79-85: failed validation forces upload
    # statuses to Skipped; missing job rows mean Pending
    def upload_status(col: str):
        return (
            F.when(F.col("validation_status") == "Failed", "Skipped")
            .when(F.col(col).isNotNull(), F.initcap(F.col(col)))
            .otherwise("Pending")
        )

    return (
        executions.join(errors, keys, "left_outer")
        .withColumn("validation_status", validation_outcome)
        .join(jobs, keys, "left_outer")
        .select(
            *keys,
            F.initcap(F.lower(F.col("execution_status"))).alias("execution"),
            "validation_status",
            F.coalesce(F.col("n_failures"), F.lit(0)).alias("n_failures"),
            upload_status("metadata").alias("metadata_upload_status"),
            upload_status("asset").alias("asset_upload_status"),
        )
    )
