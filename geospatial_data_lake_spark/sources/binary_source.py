"""Binary file source — S6.

The reference streams objects from S3 in 1 KiB chunks purely to bound
memory while hashing (ref: backend/check_files_checksums/utils.py:87-103).
Spark's ``binaryFile`` source gives the same rows ``(path, length,
modificationTime, content)`` with the read distributed across executors;
the chunked-streaming path for files too large to materialize lives in
plans/checksums.py (_streaming_digest_kernel).

Scale note: ``spark.sql.binaryFile.maxLength`` caps content size (2 GiB
hard limit from the byte-array type). The loader filters oversized files
into a separate stream the caller routes to the chunked kernel, so one
giant object can't fail the whole scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MAX_INLINE = 256 * 1024 * 1024  # 256 MiB: keep task memory bounded


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_inline_bytes: int = DEFAULT_MAX_INLINE,
) -> tuple[DataFrame, DataFrame]:
    """Read files as binary rows, split into ``(inline, oversized)``.

    ``inline`` rows carry content and are safe for in-memory digesting
    (``sha2(content, 256)``); ``oversized`` rows carry only path+length
    and must go through the chunked streaming kernel.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    inline = df.filter(F.col("length") <= max_inline_bytes)
    oversized = df.filter(F.col("length") > max_inline_bytes).select(
        "path", "length", "modificationTime"
    )
    return inline, oversized


def with_sha256(inline: DataFrame) -> DataFrame:
    """Append the sha256 hex digest of the content column — the JVM path
    for normal-sized files (A5/F6: sha2 is codegen, no Python)."""
    return inline.withColumn("sha256", F.lower(F.sha2(F.col("content"), 256)))
