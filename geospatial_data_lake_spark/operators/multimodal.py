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


# -- mm04: a REAL decoder -----------------------------------------------------
#
# JPEG/PNG need codec libraries this container lacks (hence the stubs
# above), but binary PPM (P6) is decodable with numpy alone — so this
# operator runs a GENUINE decode: header token scan, ndarray reshape,
# per-channel statistics. Payloads are synthesized deterministically
# (the "read blob from object storage" stand-in), which is what keeps a
# real codec hash-gateable against the SQL oracle.

_PPM_SCHEMA = (
    "doc_id bigint, width int, height int,"
    " mean_r double, mean_g double, mean_b double"
)


def synth_ppm(doc_id: int) -> bytes:
    """Deterministic P6 payload: width from doc_id, fixed height, pixel
    bytes from a linear byte pattern (exactly reproducible in SQL)."""
    w = 1 + doc_id % 16
    h = 4
    header = f"P6\n# synthetic {doc_id}\n{w} {h}\n255\n".encode()
    n = w * h * 3
    px = bytes((doc_id * 31 + i) % 256 for i in range(n))
    return header + px


def decode_ppm(payload: bytes):
    """REAL binary-PPM (P6) decoder: whitespace/comment-tolerant header
    scan, then a zero-copy numpy view reshaped to (h, w, 3).  Returns
    (width, height, ndarray). Raises ValueError on malformed input."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    # token scanner: skip whitespace and '#' comments after the magic
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3 and i < n:
        c = payload[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            i = payload.index(b"\n", i) + 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 3:
        raise ValueError("truncated ppm header")
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit ppm unsupported")
    i += 1  # single whitespace after maxval, then raster
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, raster.reshape(h, w, 3)


def ppm_stats_batch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """mapInPandas kernel: synthesize the blob (storage-read stand-in),
    then REALLY decode it and emit per-channel means."""
    for pdf in batches:
        rows: dict[str, list] = {
            "doc_id": [], "width": [], "height": [],
            "mean_r": [], "mean_g": [], "mean_b": [],
        }
        for doc_id in pdf["doc_id"]:
            w, h, arr = decode_ppm(synth_ppm(int(doc_id)))
            means = arr.astype("float64").mean(axis=(0, 1))
            rows["doc_id"].append(int(doc_id))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["mean_r"].append(round(float(means[0]), 4))
            rows["mean_g"].append(round(float(means[1]), 4))
            rows["mean_b"].append(round(float(means[2]), 4))
        yield pd.DataFrame(rows)


@register(
    "mm04_ppm_decode_stats",
    # The pixel pattern is linear in the byte index, so the channel means
    # are replayable in SQL: pixel (k, channel c) has value
    # (doc_id*31 + 3k + c) % 256 over k in [0, w*h).
    oracle="""
        WITH d AS (
            SELECT doc_id, 1 + doc_id % 16 AS w, 4 AS h
            FROM documents WHERE doc_id % 7 = 0
        ),
        px AS (
            SELECT doc_id, w, h,
                   unnest(generate_series(0, w * h - 1)) AS k
            FROM d
        )
        SELECT doc_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               round(avg((doc_id * 31 + 3 * k + 0) % 256), 4) AS mean_r,
               round(avg((doc_id * 31 + 3 * k + 1) % 256), 4) AS mean_g,
               round(avg((doc_id * 31 + 3 * k + 2) % 256), 4) AS mean_b
        FROM px
        GROUP BY doc_id, w, h
        ORDER BY doc_id
    """,
    tags=("multimodal", "mapInPandas", "real-codec"),
)
def mm04_ppm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine image decode on Spark: binary-PPM payloads are parsed
    (tolerant header scan) and decoded to (h, w, 3) uint8 arrays with
    numpy inside a mapInPandas kernel; the query reports per-channel
    pixel means.  Unlike mm02's declared stub, this codec path is REAL
    and its fidelity is tested (tests/test_operators_unit.py) — the
    pattern generalizes to any decoder importable on the executors.
    Scale shape: decode is per-Arrow-batch executor work; one narrow
    shuffle only for the deterministic output ordering."""
    t = tables(spark, sf_dir)
    ids = t.documents.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return ids.mapInPandas(ppm_stats_batch, schema=_PPM_SCHEMA).orderBy("doc_id")


# -- mm05: audio (WAV/PCM16) — also a real decoder ---------------------------

_WAV_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint,"
    " duration_ms double, rms double, peak int"
)

_WAV_RATE = 16000


def synth_wav(doc_id: int) -> bytes:
    """Deterministic RIFF/WAVE payload: mono PCM16 @16 kHz, sample i =
    ((doc_id*7 + i*13) % 4096) - 2048 — reproducible in SQL."""
    import struct

    n = 64 + (doc_id % 64)
    samples = [((doc_id * 7 + i * 13) % 4096) - 2048 for i in range(n)]
    data = struct.pack(f"<{n}h", *samples)
    byte_rate = _WAV_RATE * 2
    return b"".join(
        [
            b"RIFF", struct.pack("<I", 36 + len(data)), b"WAVE",
            b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, _WAV_RATE, byte_rate, 2, 16),
            b"data", struct.pack("<I", len(data)), data,
        ]
    )


def decode_wav(payload: bytes):
    """REAL RIFF/WAVE decoder for PCM16: chunk walk (not fixed offsets —
    real files carry LIST/fact chunks), format validation, numpy int16
    view of the data chunk. Returns (sample_rate, ndarray)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, sz = payload[pos : pos + 4], struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only mono PCM16 supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, data


def wav_features_batch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    for pdf in batches:
        rows: dict[str, list] = {
            "doc_id": [], "sample_rate": [], "n_samples": [],
            "duration_ms": [], "rms": [], "peak": [],
        }
        for doc_id in pdf["doc_id"]:
            rate, x = decode_wav(synth_wav(int(doc_id)))
            xf = x.astype("float64")
            rows["doc_id"].append(int(doc_id))
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(len(x))
            rows["duration_ms"].append(round(len(x) * 1000.0 / rate, 4))
            rows["rms"].append(round(float((xf * xf).mean() ** 0.5), 4))
            rows["peak"].append(int(abs(xf).max()))
        yield pd.DataFrame(rows)


@register(
    "mm05_wav_features",
    # sample i = ((doc_id*7 + i*13) % 4096) - 2048 over n = 64 + doc_id%64
    oracle=f"""
        WITH d AS (
            SELECT doc_id, 64 + doc_id % 64 AS n
            FROM documents WHERE doc_id % 13 = 0
        ),
        s AS (
            SELECT doc_id, n,
                   ((doc_id * 7 + unnest(generate_series(0, n - 1)) * 13)
                       % 4096) - 2048 AS x
            FROM d
        )
        SELECT doc_id,
               {_WAV_RATE} AS sample_rate,
               CAST(max(n) AS BIGINT) AS n_samples,
               round(max(n) * 1000.0 / {_WAV_RATE}, 4) AS duration_ms,
               round(sqrt(avg(CAST(x AS DOUBLE) * x)), 4) AS rms,
               CAST(max(abs(x)) AS INT) AS peak
        FROM s
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("multimodal", "mapInPandas", "real-codec", "audio"),
)
def mm05_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine audio decode on Spark: RIFF/WAVE chunk walk + PCM16 numpy
    view inside mapInPandas, reporting sample rate, duration, RMS
    energy, and peak amplitude — the features an audio-corpus filter
    thresholds on (silence/clipping detection).  Deterministic synth
    payloads keep the real codec hash-gateable, exactly like mm04."""
    t = tables(spark, sf_dir)
    ids = t.documents.filter(F.col("doc_id") % 13 == 0).select("doc_id")
    return ids.mapInPandas(wav_features_batch, schema=_WAV_SCHEMA).orderBy("doc_id")


# -- mm06: a REAL PNG codec ---------------------------------------------------
#
# PNG is fully decodable with the standard library alone (zlib is the
# compression layer; chunk integrity is crc32) — so unlike JPEG, a
# GENUINE spec-compliant decode needs no external imaging library:
# signature check, chunk walk with CRC verification, IHDR parse, IDAT
# reassembly, zlib inflate, and per-scanline reverse filtering (all
# five PNG filter types: None/Sub/Up/Average/Paeth).  The synth encoder
# deliberately cycles through every filter type across scanlines, so
# the decoder's unfilter logic is exercised on each payload.

_PNG_SCHEMA = (
    "doc_id bigint, width int, height int, n_chunks int,"
    " mean_r double, mean_g double, mean_b double"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # 8-bit RGB


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    )


def synth_png(doc_id: int) -> bytes:
    """Deterministic, spec-compliant RGB8 PNG: pixel (k, channel c) is
    (doc_id*17 + 3k + c) % 256; scanline r is encoded with filter type
    r % 5, so decoding exercises Sub/Up/Average/Paeth reversal."""
    import struct
    import zlib as _z

    w, h = 1 + doc_id % 8, 5
    raw_rows = []
    for r in range(h):
        base = r * w * _BPP
        raw_rows.append(
            bytes((doc_id * 17 + base + i) % 256 for i in range(w * _BPP))
        )
    stream = bytearray()
    for r, raw in enumerate(raw_rows):
        ftype = r % 5
        prev = raw_rows[r - 1] if r > 0 else bytes(w * _BPP)
        out = bytearray()
        for i, x in enumerate(raw):
            left = raw[i - _BPP] if i >= _BPP else 0
            up = prev[i]
            ul = prev[i - _BPP] if i >= _BPP else 0
            if ftype == 0:
                out.append(x)
            elif ftype == 1:
                out.append((x - left) % 256)
            elif ftype == 2:
                out.append((x - up) % 256)
            elif ftype == 3:
                out.append((x - (left + up) // 2) % 256)
            else:
                out.append((x - _paeth(left, up, ul)) % 256)
        stream.append(ftype)
        stream.extend(out)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB8, no interlace
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(stream)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """REAL PNG decoder (RGB8, non-interlaced): chunk walk with crc32
    verification, IDAT reassembly, zlib inflate, and full reverse
    filtering.  Returns (width, height, n_chunks, flat pixel bytes).
    Raises ValueError on any malformed structure — corrupt payloads
    must be routed to quarantine, never silently zeroed."""
    import struct
    import zlib as _z

    if not payload.startswith(_PNG_SIG):
        raise ValueError("bad png signature")
    pos, n = len(_PNG_SIG), len(payload)
    w = h = None
    idat = bytearray()
    n_chunks = 0
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if _z.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"crc mismatch in {tag!r}")
        n_chunks += 1
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color, interlace) != (8, 2, 0):
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    stream = _z.decompress(bytes(idat))
    stride = w * _BPP
    if len(stream) != h * (1 + stride):
        raise ValueError("bad raster length")
    out = bytearray()
    prev = bytes(stride)
    for r in range(h):
        ftype = stream[r * (1 + stride)]
        row = stream[r * (1 + stride) + 1 : (r + 1) * (1 + stride)]
        recon = bytearray()
        for i, x in enumerate(row):
            left = recon[i - _BPP] if i >= _BPP else 0
            up = prev[i]
            ul = prev[i - _BPP] if i >= _BPP else 0
            if ftype == 0:
                recon.append(x)
            elif ftype == 1:
                recon.append((x + left) % 256)
            elif ftype == 2:
                recon.append((x + up) % 256)
            elif ftype == 3:
                recon.append((x + (left + up) // 2) % 256)
            elif ftype == 4:
                recon.append((x + _paeth(left, up, ul)) % 256)
            else:
                raise ValueError(f"unknown filter type {ftype}")
        out.extend(recon)
        prev = bytes(recon)
    return w, h, n_chunks, bytes(out)


def png_stats_batch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """mapInPandas kernel: synthesize the blob (storage-read stand-in),
    REALLY decode it, and emit per-channel pixel means."""
    import numpy as np

    for pdf in batches:
        rows: dict[str, list] = {
            "doc_id": [], "width": [], "height": [], "n_chunks": [],
            "mean_r": [], "mean_g": [], "mean_b": [],
        }
        for doc_id in pdf["doc_id"]:
            w, h, n_chunks, px = decode_png(synth_png(int(doc_id)))
            arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, _BPP)
            means = arr.astype("float64").mean(axis=(0, 1))
            rows["doc_id"].append(int(doc_id))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_chunks"].append(n_chunks)
            rows["mean_r"].append(round(float(means[0]), 4))
            rows["mean_g"].append(round(float(means[1]), 4))
            rows["mean_b"].append(round(float(means[2]), 4))
        yield pd.DataFrame(rows)


@register(
    "mm06_png_decode_stats",
    # Same replay trick as mm04: the pixel pattern is linear in the byte
    # index, so the decoded channel means are SQL-expressible even
    # though the payload went through zlib + PNG filtering in between —
    # which is exactly what makes a REAL codec hash-gateable.
    oracle="""
        WITH d AS (
            SELECT doc_id, 1 + doc_id % 8 AS w, 5 AS h
            FROM documents WHERE doc_id % 9 = 0
        ),
        px AS (
            SELECT doc_id, w, h,
                   unnest(generate_series(0, w * h - 1)) AS k
            FROM d
        )
        SELECT doc_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               3 AS n_chunks,
               round(avg((doc_id * 17 + 3 * k + 0) % 256), 4) AS mean_r,
               round(avg((doc_id * 17 + 3 * k + 1) % 256), 4) AS mean_g,
               round(avg((doc_id * 17 + 3 * k + 2) % 256), 4) AS mean_b
        FROM px
        GROUP BY doc_id, w, h
        ORDER BY doc_id
    """,
    tags=("multimodal", "mapInPandas", "real-codec", "png"),
)
def mm06_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine PNG decode on Spark — stdlib-only (zlib inflate, crc32
    chunk verification, all five scanline filters reversed), inside a
    mapInPandas kernel, reporting per-channel pixel means.  The synth
    encoder cycles every PNG filter type across scanlines, so each
    payload exercises the full unfilter path; fidelity and corrupt-CRC
    rejection are unit-tested.  With mm04 (PPM) and mm05 (WAV) this
    makes three REAL codecs behind the one declared stub family (mm02
    JPEG-class decode, which genuinely needs an imaging library).
    Scale shape: decode is per-Arrow-batch executor work; one narrow
    shuffle only for the deterministic output ordering."""
    t = tables(spark, sf_dir)
    ids = t.documents.filter(F.col("doc_id") % 9 == 0).select("doc_id")
    return ids.mapInPandas(png_stats_batch, schema=_PNG_SCHEMA).orderBy("doc_id")
