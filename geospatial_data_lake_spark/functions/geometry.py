"""ST_* geometry functions — the Sedona-parity scalar surface.

BASELINE.json's spark_approach names GeoSpark/Sedona as the extension
family this engine replaces on its fixtures; these are the core ST_*
scalars users reach for first, each a pure Catalyst expression over
the engine's array-layout geometries (``array<struct<x,y>>`` closed
rings / paths, ``struct`` or column-pair points) — whole-stage
codegen, no UDF, no geometry library, and every fold runs in a fixed
left-to-right order so a SQL oracle replays it bit-for-bit.

Conventions: rings are CLOSED (first vertex repeated last, the
GeoJSON/WKB layout used across operators/geo.py); area is the
shoelace formula (positive for counter-clockwise rings — ``st_area``
returns the absolute value, ``st_signed_area`` keeps orientation);
centroid is the polygon (area-weighted) centroid, not the vertex
mean."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_edges(ring: Column, term) -> Column:
    """Left-to-right fold of ``term(a, b)`` over consecutive ring
    vertices (1-based element_at; requires a closed ring).

    Degenerate 0/1-vertex input folds to 0.0 (NULL stays NULL) —
    without the guard, ``sequence(1, size-1)`` would generate a
    DESCENDING sequence (e.g. [1, 0]) and ``element_at(ring, 0)``
    raises at runtime."""
    return (
        F.when(
            F.size(ring) >= 2,
            F.aggregate(
                F.sequence(F.lit(1), F.size(ring) - 1),
                F.lit(0.0),
                lambda acc, i: acc
                + term(F.element_at(ring, i), F.element_at(ring, i + 1)),
            ),
        )
        .when(ring.isNotNull(), F.lit(0.0))
        .otherwise(F.lit(None).cast("double"))
    )


def st_signed_area(ring: Column) -> Column:
    """Shoelace signed area of a closed ring: positive when the ring
    winds counter-clockwise."""
    return (
        _fold_edges(
            ring, lambda a, b: a["x"] * b["y"] - b["x"] * a["y"]
        )
        / 2.0
    )


def st_area(ring: Column) -> Column:
    """Absolute shoelace area of a closed ring."""
    return F.abs(st_signed_area(ring))


def st_perimeter(ring: Column) -> Column:
    """Sum of edge lengths of a closed ring (= st_length of its path)."""
    return st_length(ring)


def st_length(path: Column) -> Column:
    """Euclidean length of a vertex path (polyline or closed ring)."""
    return _fold_edges(
        path,
        lambda a, b: F.sqrt(
            (b["x"] - a["x"]) * (b["x"] - a["x"])
            + (b["y"] - a["y"]) * (b["y"] - a["y"])
        ),
    )


def st_centroid(ring: Column) -> tuple[Column, Column]:
    """Polygon (area-weighted) centroid of a closed ring ->
    (cx, cy) Columns.  Degenerate (zero-area) rings divide by zero to
    NULL/NaN — callers gate on ``st_area > 0``."""
    a2 = _fold_edges(
        ring, lambda a, b: a["x"] * b["y"] - b["x"] * a["y"]
    )  # 2 * signed area
    cx = (
        _fold_edges(
            ring,
            lambda a, b: (a["x"] + b["x"])
            * (a["x"] * b["y"] - b["x"] * a["y"]),
        )
        / (3.0 * a2)
    )
    cy = (
        _fold_edges(
            ring,
            lambda a, b: (a["y"] + b["y"])
            * (a["x"] * b["y"] - b["x"] * a["y"]),
        )
        / (3.0 * a2)
    )
    return cx, cy


def st_distance(ax: Column, ay: Column, bx: Column, by: Column) -> Column:
    """Euclidean point-to-point distance."""
    return F.sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))


def st_within(ring: Column, px: Column, py: Column) -> Column:
    """Point-in-polygon (even-odd ray cast over the closed ring) — the
    general higher-order form; inside hot joins prefer the unrolled
    variant (operators/geo.py: unrolled_ray_cast)."""
    from geospatial_data_lake_spark.operators.geo import point_in_ring

    return point_in_ring(ring, px, py)


def st_bbox(ring: Column) -> Column:
    """struct(x1, y1, x2, y2) envelope of a ring/path."""
    return F.struct(
        F.array_min(F.transform(ring, lambda v: v["x"])).alias("x1"),
        F.array_min(F.transform(ring, lambda v: v["y"])).alias("y1"),
        F.array_max(F.transform(ring, lambda v: v["x"])).alias("x2"),
        F.array_max(F.transform(ring, lambda v: v["y"])).alias("y2"),
    )


__all__ = [
    "st_signed_area",
    "st_area",
    "st_perimeter",
    "st_length",
    "st_centroid",
    "st_distance",
    "st_within",
    "st_bbox",
]
