"""Multimodal (binary) column operators.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch shape
through mapInPandas — is real and tested; the actual codec step is a
deterministic stub (the image/audio libraries are not in this container),
clearly marked, with the same signature a real decoder would have.

Scale notes: binary payloads ride in the same parquet row groups as their
metadata; ``spark.sql.files.maxPartitionBytes`` bounds partition memory;
decode/feature-extract runs per Arrow batch inside mapInPandas so one
executor core streams batches without materializing the whole partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables

_DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, mime string, width int, height int, channels int"
)


def decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: derives deterministic fake dimensions from the payload
    hash. A real deployment replaces this body with PIL/libvips decode —
    the Spark plumbing (batching, schema, partitioning) is unchanged.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 1 + digest[2] % 3
    return width, height, channels


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one metadata frame out."""
    for pdf in batches:
        dims = pdf["content"].map(decode_image_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["content"].map(len),
                "mime": "image/stub",
                "width": dims.map(lambda d: d[0]),
                "height": dims.map(lambda d: d[1]),
                "channels": dims.map(lambda d: d[2]),
            }
        )


def as_blob_table(documents: DataFrame) -> DataFrame:
    """Model a multimodal table: (doc_id, content binary, meta struct)."""
    return documents.select(
        "doc_id",
        F.col("text").cast("binary").alias("content"),
        F.struct(
            F.octet_length("text").cast("bigint").alias("n_bytes"),
            F.lit("image/stub").alias("mime"),
        ).alias("meta"),
    )


@register(
    "mm01_blob_metadata",
    oracle="""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               'image/stub' AS mime,
               substr(sha256(text), 1, 16) AS content_id
        FROM documents
    """,
    tags=("multimodal",),
)
def mm01_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: size, mime, content-id.
    (Document text bytes stand in for image bytes; the schema shape is the
    real thing.) All JVM expressions."""
    t = tables(spark, sf_dir)
    blobs = as_blob_table(t.documents)
    return blobs.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.substring(F.sha2("content", 256), 1, 16).alias("content_id"),
    )


@register(
    "mm02_decode_features",
    # The codec is a stub, but a *deterministic* one (dimensions derived
    # from sha256 bytes of the payload) — and DuckDB has sha256, so the
    # whole kernel is SQL-replicable and hash-gated. Payloads are the
    # ASCII document texts, so byte and character offsets coincide. When
    # a real decoder replaces the stub this oracle is dropped (a real
    # codec is not SQL-expressible; the Arrow plumbing tests remain).
    oracle="""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               'image/stub' AS mime,
               CAST(64 + ('0x' || substr(sha256(text), 1, 2))::INT % 192
                    AS INT) AS width,
               CAST(64 + ('0x' || substr(sha256(text), 3, 2))::INT % 192
                    AS INT) AS height,
               CAST(1 + ('0x' || substr(sha256(text), 5, 2))::INT % 3
                    AS INT) AS channels
        FROM documents
    """,
    tags=("multimodal", "mapInPandas"),
)
def mm02_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract via mapInPandas (stubbed codec, real
    plumbing): binary in, typed feature struct out, Arrow-batched."""
    t = tables(spark, sf_dir)
    blobs = as_blob_table(t.documents).select("doc_id", "content")
    return blobs.mapInPandas(decode_batch, schema=_DECODE_SCHEMA)


_FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_off int, frame_digest string"


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: treat each payload as a fixed-stride frame
    container (stub for a real demuxer); emit every 4th frame with a
    digest of its byte range. One output frame per ~400 input bytes, so
    the kernel *contracts* data — the shape that keeps executor memory
    flat when real video decode replaces the stub."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_digest": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
            n_frames = max(1, len(payload) // 100)
            for idx in range(0, n_frames, 4):
                off = idx * 100
                chunk = bytes(payload[off : off + 100])
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_off"].append(off)
                out["frame_digest"].append(hashlib.sha256(chunk).hexdigest()[:16])
        yield pd.DataFrame(out)


@register(
    "mm03_frame_sample",
    # Same deal as mm02: the stub demuxer is deterministic byte
    # arithmetic + sha256, both SQL-replicable (ASCII payloads => byte
    # offsets == char offsets; DuckDB substring is 1-based).
    oracle="""
        WITH f AS (
            SELECT doc_id, text,
                   greatest(1, strlen(text) // 100) AS n_frames
            FROM documents
        )
        SELECT doc_id,
               CAST(i.i AS INT) AS frame_idx,
               CAST(i.i * 100 AS INT) AS frame_off,
               substr(sha256(substring(text, i.i * 100 + 1, 100)), 1, 16)
                   AS frame_digest
        FROM f, LATERAL (
            SELECT unnest(generate_series(0, CAST(f.n_frames - 1 AS INT), 4)) AS i
        ) i
    """,
    tags=("multimodal", "mapInPandas", "video"),
)
def mm03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over binary payloads: every 4th
    100-byte 'frame', with offset and content digest. Stub demuxer,
    real plumbing — Arrow batches in, typed exploded rows out, fully
    parallel per partition with no driver involvement."""
    t = tables(spark, sf_dir)
    blobs = as_blob_table(t.documents).select("doc_id", "content")
    return blobs.mapInPandas(sample_frames_batch, schema=_FRAME_SCHEMA)
