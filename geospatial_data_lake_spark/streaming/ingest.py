"""Incremental version ingestion — T1/T3.

The reference starts one pipeline run per POSTed version
(`backend/dataset_versions/create.py:71-75`). The streaming analog watches
a staging directory and drives the validate pipeline per arrival batch via
``foreachBatch`` with ``Trigger.AvailableNow`` — each micro-batch is a
bounded DataFrame, so the batch pipeline plans are reused verbatim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("dataset_id", T.StringType()),
        T.StructField("metadata_url", T.StringType()),
    ]
)


def ingest_staging_stream(
    spark: SparkSession,
    staging_manifest_dir: str,
    on_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
):
    """Watch a staging manifest directory (one JSON row per new version
    request) and invoke ``on_batch`` per micro-batch. AvailableNow drains
    the backlog then stops — exactly-once per row via the checkpoint."""
    stream = spark.readStream.schema(MANIFEST_SCHEMA).json(staging_manifest_dir)
    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
