"""Distributed multihash checksum verification — SURVEY.md M4.

The reference fans out one AWS Batch array task per file, batched 10,000 at
a time by a Step-Functions loop (`backend/content_iterator/task.py:40-75`,
`backend/check_files_checksums/utils.py:83-106`). In Spark that entire
subsystem dissolves: ONE distributed job over the DATA manifest verifies
every file; partitioning replaces manual batching, task retries replace
Batch retry codes.

Two physical paths:

- small files: ``binaryFile`` source + ``sha2(content, 256)`` — all JVM.
- oversized files (> ``spark.sql.binaryFile.maxLength``): a mapInPandas
  kernel streams each file in 1 MiB chunks through hashlib executor-side —
  bounded memory per task, mirroring the reference's 1 KiB streamed read
  (`utils.py:26,102`) at a chunk size tuned for object storage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geospatial_data_lake_spark import schemas

CHUNK_SIZE = 1 << 20  # 1 MiB streamed-read granularity

# multihash constants — ref: backend/check_files_checksums/utils.py:98-105
SHA2_256_CODE = "1220"  # fn 0x12 (sha2-256), length 0x20 (32 bytes)


def _local_path(url: str) -> str:
    parsed = urlparse(url)
    return parsed.path if parsed.scheme == "file" else url


def _streaming_digest_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition streamed sha256: constant memory regardless of file
    size (A5/X4 — the custom-aggregate path)."""
    for pdf in batches:
        digests, errors = [], []
        for url in pdf["url"]:
            try:
                digest = hashlib.sha256()
                with open(_local_path(url), "rb") as fh:
                    while True:
                        chunk = fh.read(CHUNK_SIZE)
                        if not chunk:
                            break
                        digest.update(chunk)
                digests.append(digest.hexdigest())
                errors.append(None)
            except OSError as exc:
                digests.append(None)
                errors.append(str(exc))
        yield pd.DataFrame(
            {"url": pdf["url"], "actual_sha256": digests, "read_error": errors}
        )


def verify_checksums(assets: DataFrame) -> DataFrame:
    """Verify every DATA asset's multihash; returns VALIDATION_RESULTS rows.

    Input: schemas.ASSETS rows. Expected digest = multihash minus the
    2-byte fn/length prefix (ref utils.py:98-105).
    """
    data = assets.filter(F.col("item_type") == "DATA").select(
        "dataset_id", "version_id", "url", "multihash"
    )
    digested = data.mapInPandas(
        _streaming_digest_kernel,
        schema="url string, actual_sha256 string, read_error string",
    ).join(data, "url")

    expected = F.when(
        F.col("multihash").startswith(SHA2_256_CODE[:2]),
        F.expr("substring(multihash, 5)"),
    )
    passed = (
        F.col("read_error").isNull()
        & F.col("multihash").isNotNull()
        & (expected == F.col("actual_sha256"))
    )
    return digested.select(
        "dataset_id",
        "version_id",
        F.lit(schemas.CHECK_CHECKSUM).alias("check"),
        "url",
        F.when(passed, schemas.RESULT_PASSED)
        .otherwise(schemas.RESULT_FAILED)
        .alias("result"),
        F.when(
            ~passed,
            F.create_map(
                F.lit("message"),
                F.coalesce(
                    F.col("read_error"),
                    F.concat(
                        F.lit("checksum mismatch: expected "),
                        F.coalesce(expected, F.lit("<none>")),
                        F.lit(" got "),
                        F.coalesce(F.col("actual_sha256"), F.lit("<none>")),
                    ),
                ),
            ),
        ).alias("details"),
    )


def validation_summary(validation: DataFrame) -> bool:
    """Per-version success = no Failed rows (ref: limit-1 existence probe,
    backend/validation_summary/task.py:33-40). isEmpty() short-circuits at
    the first failed row — the declarative analog of count(limit=1)."""
    return validation.filter(F.col("result") == schemas.RESULT_FAILED).isEmpty()
