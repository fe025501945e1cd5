"""WKB geometry codec — the GeoParquet column contract.

GeoParquet stores geometry as WKB (well-known binary) in a plain
``binary`` parquet column; engines decode it into their native layout.
The reference's catalog carries GeoJSON geometry (tests/stac_objects.py
bbox arrays; geojson-spec submodule in .gitmodules:5-8) and its
USAGE.md north-star names GeoParquet as the interchange format — this
module is that interchange surface for the Spark engine: encode the
engine's array-layout geometries (``struct<x,y>`` points,
``array<struct<x,y>>`` rings) to spec-conformant WKB, and decode WKB
(either endianness) back.

Physical shape: both directions are Arrow-batched ``mapInPandas``
kernels — byte packing is the one job codegen expressions genuinely
cannot express — with all per-row work in ``struct``/bytes, no
geometry library required.  The kernels are schema-preserving
passthroughs for every non-geometry column, so they slot into any plan
as a narrow map stage: no shuffle, no driver state, partition-parallel
like the multimodal codecs (operators/multimodal.py).

Supported: WKB Point (type 1) and Polygon (type 3, outer ring;
multi-ring polygons decode their outer ring, the engine's predicate
layout).  Encoders always write little-endian; decoders accept both
byte orders.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_WKB_POINT = 1
_WKB_POLYGON = 3


def encode_wkb_point(x: float, y: float) -> bytes:
    """Little-endian WKB POINT."""
    return struct.pack("<BIdd", 1, _WKB_POINT, x, y)


def encode_wkb_polygon(ring: list[tuple[float, float]]) -> bytes:
    """Little-endian single-ring WKB POLYGON; ``ring`` must be closed
    (first vertex repeated last), per the spec."""
    out = struct.pack("<BIII", 1, _WKB_POLYGON, 1, len(ring))
    for px, py in ring:
        out += struct.pack("<dd", px, py)
    return out


def decode_wkb(buf: bytes) -> tuple[int, list[tuple[float, float]]]:
    """Parse one WKB blob -> (geom_type, vertices).  Point yields one
    vertex; Polygon yields its OUTER ring's vertices.  Raises
    ValueError on malformed/unsupported input."""
    if len(buf) < 5:
        raise ValueError("short WKB")
    endian = "<" if buf[0] == 1 else ">"
    (gtype,) = struct.unpack_from(endian + "I", buf, 1)
    if gtype == _WKB_POINT:
        x, y = struct.unpack_from(endian + "dd", buf, 5)
        return gtype, [(x, y)]
    if gtype == _WKB_POLYGON:
        (nrings,) = struct.unpack_from(endian + "I", buf, 5)
        if nrings < 1:
            raise ValueError("empty polygon")
        (npts,) = struct.unpack_from(endian + "I", buf, 9)
        pts = struct.unpack_from(endian + "d" * (2 * npts), buf, 13)
        return gtype, [(pts[2 * i], pts[2 * i + 1]) for i in range(npts)]
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _with_fields(base: T.StructType, extra: list[T.StructField]) -> T.StructType:
    return T.StructType(list(base.fields) + extra)


_RING_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
        ]
    )
)


def points_to_wkb(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Append a ``wkb`` binary column encoding (x_col, y_col) as WKB
    Point — the GeoParquet writer side."""
    schema = _with_fields(df.schema, [T.StructField("wkb", T.BinaryType())])

    def enc(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["wkb"] = [
                encode_wkb_point(float(x), float(y))
                for x, y in zip(pdf[x_col], pdf[y_col])
            ]
            yield pdf

    return df.mapInPandas(enc, schema)


def polygons_to_wkb(df: DataFrame, ring_col: str) -> DataFrame:
    """Append a ``wkb`` binary column encoding the closed
    ``array<struct<x,y>>`` ring as WKB Polygon."""
    schema = _with_fields(df.schema, [T.StructField("wkb", T.BinaryType())])

    def enc(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["wkb"] = [
                encode_wkb_polygon([(float(v["x"]), float(v["y"])) for v in ring])
                for ring in pdf[ring_col]
            ]
            yield pdf

    return df.mapInPandas(enc, schema)


def wkb_to_points(df: DataFrame, wkb_col: str = "wkb") -> DataFrame:
    """Decode a WKB Point column into ``x``/``y`` doubles (other
    columns pass through; the wkb column is dropped)."""
    base = T.StructType([f for f in df.schema.fields if f.name != wkb_col])
    schema = _with_fields(
        base,
        [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())],
    )

    def dec(batches: Iterator) -> Iterator:
        for pdf in batches:
            xs, ys = [], []
            for buf in pdf[wkb_col]:
                gtype, verts = decode_wkb(bytes(buf))
                if gtype != _WKB_POINT:
                    raise ValueError("expected WKB Point")
                xs.append(verts[0][0])
                ys.append(verts[0][1])
            out = pdf.drop(columns=[wkb_col])
            out["x"], out["y"] = xs, ys
            yield out

    return df.mapInPandas(dec, schema)


def wkb_to_polygons(df: DataFrame, wkb_col: str = "wkb") -> DataFrame:
    """Decode a WKB Polygon column into the engine's closed-ring layout
    ``ring: array<struct<x,y>>`` (outer ring; other columns pass
    through; the wkb column is dropped)."""
    base = T.StructType([f for f in df.schema.fields if f.name != wkb_col])
    schema = _with_fields(base, [T.StructField("ring", _RING_TYPE)])

    def dec(batches: Iterator) -> Iterator:
        for pdf in batches:
            rings = []
            for buf in pdf[wkb_col]:
                gtype, verts = decode_wkb(bytes(buf))
                if gtype != _WKB_POLYGON:
                    raise ValueError("expected WKB Polygon")
                rings.append([{"x": vx, "y": vy} for vx, vy in verts])
            out = pdf.drop(columns=[wkb_col])
            out["ring"] = rings
            yield out

    return df.mapInPandas(dec, schema)
