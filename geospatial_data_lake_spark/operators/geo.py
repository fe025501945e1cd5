"""Geospatial predicates over STAC-shaped payloads.

The reference's datasets carry STAC geometry: bbox arrays of doubles and
temporal intervals ``[start, end|null]`` (ref: tests/stac_objects.py:22-26,
geojson-spec submodule in .gitmodules:5-8). It never *queries* by them —
DynamoDB can't — but a catalog-serving engine must: "what intersects this
region", "which items contain this point", "what overlaps this time range"
are the reference's USAGE.md search scenarios. These queries provide that
capability natively, with geometry derived deterministically from fixture
keys (integer arithmetic, so Spark and DuckDB compute bit-identical
doubles).

Scale design — the distributed spatial join:

- geo01 (bbox x bbox) uses the canonical **grid-partitioned spatial
  join**: each box is exploded to the 5-degree grid cells it covers, pairs
  meet through a cell equi-join (shuffle on cell id — no quadratic
  cross-join), and the exact intersection test runs per candidate. A pair
  spanning several shared cells is emitted exactly once via the
  **reference-point rule** (report only in the cell containing the
  intersection's min corner) — a codegen predicate, not a distinct()
  shuffle. Skewed cells (dense regions) split further under AQE; cell size
  trades replication (boxes straddling borders) against bucket occupancy.
- geo02 (point-in-bbox) joins each point's single cell against the box
  cell table — the point side never replicates, the filter runs on the
  cell-pruned candidates only.
- geo03 (interval overlap) is a broadcast interval join: the small
  collection-window side broadcasts; the overlap predicate
  (a.start <= b.end AND b.start <= a.end) evaluates inside the join.
"""

from __future__ import annotations

import weakref

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables

_CELL = 5.0  # degrees; grid granularity of the spatial join


def _doc_boxes(documents: DataFrame) -> DataFrame:
    """Deterministic synthetic bbox per document: center from multiplicative
    hashes of doc_id, half-extent from doc_id mod — pure integer arithmetic
    then one exact-in-IEEE754 division path shared with the oracle."""
    cx = ((F.col("doc_id") * 7919) % 900) / 10.0 - 45.0
    cy = ((F.col("doc_id") * 104729) % 425) / 10.0 - 21.25
    w = 0.5 + (F.col("doc_id") % 20) / 10.0
    h = 0.5 + (F.col("doc_id") % 13) / 10.0
    return documents.select(
        "doc_id",
        (cx - w).alias("x1"),
        (cy - h).alias("y1"),
        (cx + w).alias("x2"),
        (cy + h).alias("y2"),
    )


_BOX_SQL = """
        SELECT doc_id,
               ((doc_id * 7919) % 900) / CAST(10 AS DOUBLE) - 45.0
                   - (0.5 + (doc_id % 20) / CAST(10 AS DOUBLE)) AS x1,
               ((doc_id * 104729) % 425) / CAST(10 AS DOUBLE) - 21.25
                   - (0.5 + (doc_id % 13) / CAST(10 AS DOUBLE)) AS y1,
               ((doc_id * 7919) % 900) / CAST(10 AS DOUBLE) - 45.0
                   + (0.5 + (doc_id % 20) / CAST(10 AS DOUBLE)) AS x2,
               ((doc_id * 104729) % 425) / CAST(10 AS DOUBLE) - 21.25
                   + (0.5 + (doc_id % 13) / CAST(10 AS DOUBLE)) AS y2
        FROM documents
"""


def _cells(df: DataFrame, id_col: str) -> DataFrame:
    """Explode a box to every grid cell it covers."""
    return (
        df.withColumn(
            "cx",
            F.explode(
                F.sequence(
                    F.floor(F.col("x1") / _CELL), F.floor(F.col("x2") / _CELL)
                )
            ),
        ).withColumn(
            "cy",
            F.explode(
                F.sequence(
                    F.floor(F.col("y1") / _CELL), F.floor(F.col("y2") / _CELL)
                )
            ),
        )
    )


def _intersects(a: str, b: str) -> Column:
    return (
        (F.col(f"{a}.x1") <= F.col(f"{b}.x2"))
        & (F.col(f"{b}.x1") <= F.col(f"{a}.x2"))
        & (F.col(f"{a}.y1") <= F.col(f"{b}.y2"))
        & (F.col(f"{b}.y1") <= F.col(f"{a}.y2"))
    )


@register(
    "geo01_bbox_intersect_pairs",
    oracle="""
        WITH b AS (""" + _BOX_SQL + """)
        SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM b a JOIN b b ON a.doc_id < b.doc_id
        WHERE a.x1 <= b.x2 AND b.x1 <= a.x2
          AND a.y1 <= b.y2 AND b.y1 <= a.y2
    """,
    tags=("geo", "spatial-join", "J8"),
)
def geo01_bbox_intersect_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All dataset pairs whose bboxes intersect — grid-partitioned spatial
    join with reference-point dedup (see module docstring). The DuckDB
    oracle is the quadratic formulation; results must be identical."""
    t = tables(spark, sf_dir)
    boxes = _doc_boxes(t.documents)
    cells = _cells(boxes, "doc_id")
    a = cells.alias("a")
    b = cells.alias("b")
    # reference point: the intersection's min corner; its cell is the only
    # cell where the pair reports (both boxes necessarily cover that cell)
    ref_cx = F.floor(F.greatest(F.col("a.x1"), F.col("b.x1")) / _CELL)
    ref_cy = F.floor(F.greatest(F.col("a.y1"), F.col("b.y1")) / _CELL)
    return (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(_intersects("a", "b"))
        .filter((F.col("a.cx") == ref_cx) & (F.col("a.cy") == ref_cy))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
    )


@register(
    "geo02_point_in_bbox",
    oracle="""
        WITH b AS (""" + _BOX_SQL + """),
        p AS (
            SELECT event_id,
                   ((event_id * 7919) % 900) / CAST(10 AS DOUBLE) - 45.0 AS px,
                   ((event_id * 104729) % 425) / CAST(10 AS DOUBLE) - 21.25 AS py
            FROM events
        )
        SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_points
        FROM p JOIN b
          ON p.px BETWEEN b.x1 AND b.x2 AND p.py BETWEEN b.y1 AND b.y2
        GROUP BY b.doc_id
    """,
    tags=("geo", "containment", "J8"),
)
def geo02_point_in_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-per-dataset-footprint: each event point lands in exactly one
    grid cell; the cell equi-join prunes the candidate boxes before the
    exact containment test. The big (point) side never replicates — only
    boxes explode to their covering cells, and that table broadcasts."""
    t = tables(spark, sf_dir)
    box_cells = _cells(_doc_boxes(t.documents), "doc_id").select(
        "doc_id", "x1", "y1", "x2", "y2", "cx", "cy"
    )
    px = ((F.col("event_id") * 7919) % 900) / 10.0 - 45.0
    py = ((F.col("event_id") * 104729) % 425) / 10.0 - 21.25
    points = t.events.select(
        "event_id", px.alias("px"), py.alias("py")
    ).withColumns(
        {
            "cx": F.floor(F.col("px") / _CELL),
            "cy": F.floor(F.col("py") / _CELL),
        }
    )
    return (
        points.join(F.broadcast(box_cells), ["cx", "cy"])
        .filter(
            F.col("px").between(F.col("x1"), F.col("x2"))
            & F.col("py").between(F.col("y1"), F.col("y2"))
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


@register(
    "geo03_temporal_overlap",
    oracle="""
        WITH c AS (
            SELECT n_nationkey, n_name,
                   TIMESTAMP '1995-01-01' + INTERVAL (n_nationkey * 90) DAY
                       AS c_start,
                   TIMESTAMP '1995-01-01' + INTERVAL (n_nationkey * 90 + 180) DAY
                       AS c_end
            FROM nation
        ),
        o AS (
            SELECT o_orderkey, o_orderdate AS o_start,
                   o_orderdate + INTERVAL ((o_orderkey % 30) + 1) DAY AS o_end
            FROM orders
        )
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_overlapping
        FROM o JOIN c ON o.o_start <= c.c_end AND c.c_start <= o.o_end
        GROUP BY n_name
    """,
    tags=("geo", "temporal", "J8"),
)
def geo03_temporal_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAC temporal-extent overlap: orders as item intervals, per-nation
    collection windows; count items overlapping each window. Broadcast
    interval join — the window side is dimension-sized; the overlap
    predicate evaluates inside the broadcast nested-loop join."""
    t = tables(spark, sf_dir)
    base = F.to_timestamp(F.lit("1995-01-01"))
    coll = t.nation.select(
        "n_name",
        F.timestamp_add("DAY", F.col("n_nationkey") * 90, base).alias("c_start"),
        F.timestamp_add("DAY", F.col("n_nationkey") * 90 + 180, base).alias("c_end"),
    )
    items = t.orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("o_start"),
        F.timestamp_add(
            "DAY", (F.col("o_orderkey") % 30) + 1, F.col("o_orderdate")
        ).alias("o_end"),
    )
    return (
        items.join(
            F.broadcast(coll),
            (F.col("o_start") <= F.col("c_end"))
            & (F.col("c_start") <= F.col("o_end")),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_overlapping"))
    )


# --- polygon predicates (geo04/geo05) -------------------------------------
#
# The reference's STAC items carry real GeoJSON `geometry` rings
# (ref: tests/stac_objects.py:36 and the geojson-spec submodule,
# .gitmodules:5-8); bbox queries alone don't cover them. geo04/geo05 add
# the two polygon predicates over synthetic rings whose vertices live on
# an integer lattice (0.1-degree units), so every edge test is exact
# 64-bit integer arithmetic — Spark and DuckDB agree bit-for-bit, with no
# float-boundary drift on points that land exactly on an edge.
#
# geo04 runs the *general* even-odd ray-casting test over a GeoJSON-shaped
# closed vertex ring (works for any simple polygon, not just these
# fixtures); the oracle expands the identical crossing arithmetic per
# edge. geo05 tests convex-polygon overlap by the separating-axis theorem
# in a closed form over the generated diamonds. Both scale through the
# same grid-cell equi-join as geo01/geo02 — polygon rings explode to
# covering cells, candidates meet on cell id, the exact predicate refines.

# Grid cell size in 0.1-degree units (1 degree). Finer than geo01/geo02's
# 5-degree cells because the polygon fixtures are ~10x denser than the
# candidate tests are cheap: cell occupancy (candidates per point) scales
# with (polygons per cell), so the cell edge should shrink as polygon
# density grows until replication (cells per polygon bbox) dominates the
# broadcast. 1 degree ≈ 12 cells/polygon, ~16 polygons/cell here.
_U = 10


def _doc_diamonds(documents: DataFrame) -> DataFrame:
    """Deterministic convex quad (diamond) per document on the integer
    lattice: center from multiplicative hashes of doc_id, half-extents
    from doc_id mods. Same spatial distribution as _doc_boxes, integer
    units."""
    return documents.select(
        "doc_id",
        ((F.col("doc_id") * 7919) % 900 - 450).alias("ccx"),
        ((F.col("doc_id") * 104729) % 425 - 212).alias("ccy"),
        (5 + F.col("doc_id") % 20).alias("w"),
        (5 + F.col("doc_id") % 13).alias("h"),
    )


_DIAMOND_SQL = """
        SELECT doc_id,
               (doc_id * 7919) % 900 - 450 AS ccx,
               (doc_id * 104729) % 425 - 212 AS ccy,
               5 + doc_id % 20 AS w,
               5 + doc_id % 13 AS h
        FROM documents
"""


def _sql_crossing(ax: str, ay: str, bx: str, by: str) -> str:
    """DuckDB crossing-test term for one polygon edge (a->b) against the
    +x ray from (px, py) — the division-free integer form of the classic
    even-odd rule. Mirrors the Spark-side lambda in geo04 exactly."""
    return (
        f"(CASE WHEN (({ay}) > py) != (({by}) > py)"
        f" AND (((px - ({ax})) * (({by}) - ({ay}))"
        f" < (({bx}) - ({ax})) * (py - ({ay}))) = (({by}) > ({ay})))"
        f" THEN 1 ELSE 0 END)"
    )


# the diamond ring's 4 edges, counter-clockwise, closed at v0
_DIAMOND_EDGES = [
    (("ccx + w", "ccy"), ("ccx", "ccy + h")),
    (("ccx", "ccy + h"), ("ccx - w", "ccy")),
    (("ccx - w", "ccy"), ("ccx", "ccy - h")),
    (("ccx", "ccy - h"), ("ccx + w", "ccy")),
]

_SQL_INSIDE = (
    "("
    + " + ".join(_sql_crossing(a[0], a[1], b[0], b[1]) for a, b in _DIAMOND_EDGES)
    + ") % 2 = 1"
)


def point_in_ring(ring: Column, px: Column, py: Column) -> Column:
    """General even-odd ray cast over an arbitrary-length closed ring
    (array<struct<x,y>>) via `aggregate` — handles any simple polygon.
    NOTE: Spark interprets higher-order lambdas row-at-a-time (~6 us per
    evaluation); inside a high-fanout join prefer ``unrolled_ray_cast``
    with a fixed vertex budget.

    Degenerate 0/1-vertex rings contain nothing (guarded: an unguarded
    ``sequence(1, size-1)`` DESCENDS for size < 2 and
    ``element_at(ring, 0)`` raises at runtime)."""
    return F.when(F.size(ring) < 2, F.lit(False)).otherwise(F.aggregate(
        F.sequence(F.lit(1), F.size(ring) - 1),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (
                (F.element_at(ring, i).getField("y") > py)
                != (F.element_at(ring, i + 1).getField("y") > py)
            )
            & (
                (
                    (px - F.element_at(ring, i).getField("x"))
                    * (
                        F.element_at(ring, i + 1).getField("y")
                        - F.element_at(ring, i).getField("y")
                    )
                    < (
                        F.element_at(ring, i + 1).getField("x")
                        - F.element_at(ring, i).getField("x")
                    )
                    * (py - F.element_at(ring, i).getField("y"))
                )
                == (
                    F.element_at(ring, i + 1).getField("y")
                    > F.element_at(ring, i).getField("y")
                )
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ) % 2 == 1)


def unrolled_ray_cast(ring: Column, px: Column, py: Column, n_edges: int) -> Column:
    """The same even-odd crossing sum with the edge loop unrolled at plan
    build time (literal indices -> codegen'd GetArrayItem/GetStructField,
    straight-line arithmetic — no interpreted lambda). Requires the ring
    to have exactly ``n_edges + 1`` vertices (closed)."""
    total: Column | None = None
    for i in range(1, n_edges + 1):
        a, b = F.element_at(ring, i), F.element_at(ring, i + 1)
        ax, ay = a.getField("x"), a.getField("y")
        bx, by = b.getField("x"), b.getField("y")
        crossing = F.when(
            ((ay > py) != (by > py))
            & (((px - ax) * (by - ay) < (bx - ax) * (py - ay)) == (by > ay)),
            F.lit(1),
        ).otherwise(F.lit(0))
        total = crossing if total is None else total + crossing
    return total % 2 == 1


@register(
    "geo04_point_in_polygon",
    oracle="""
        WITH d AS (""" + _DIAMOND_SQL + """),
        p AS (
            SELECT event_id,
                   (event_id * 7919) % 900 - 450 AS px,
                   (event_id * 104729) % 425 - 212 AS py
            FROM events
        )
        SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_points
        FROM p JOIN d ON """ + _SQL_INSIDE + """
        GROUP BY d.doc_id
    """,
    tags=("geo", "polygon", "J8"),
)
def geo04_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events inside each dataset's polygon footprint — even-odd ray
    casting over a GeoJSON-shaped closed vertex ring.

    The predicate is the division-free integer crossing test. Two
    implementations exist: ``point_in_ring`` (this module) evaluates it
    with `aggregate` over the ring array and handles ANY simple polygon —
    but Spark interprets higher-order lambdas per row, which measured
    ~6 us/candidate (31 s at sf0.1's ~200M candidate pairs). This query
    therefore *unrolls* the ring's 4 edges into straight-line Column
    arithmetic (literal array indices -> codegen'd GetArrayItem), behind
    a codegen'd bbox prefilter that kills most candidates before the
    crossing sum runs. At 100 TB the same normalization applies: fixed
    vertex-budget rings unroll; ragged rings take the HOF path.

    Scale shape = geo02's: each point hashes to one grid cell; polygon
    rings explode to the cells their bbox covers and that dimension-side
    table broadcasts, so the event side never shuffles or replicates.
    The oracle expands the identical crossing arithmetic per edge
    (quadratic join — oracle scale only)."""
    t = tables(spark, sf_dir)
    d = _doc_diamonds(t.documents)
    ring = d.select(
        "doc_id",
        (F.col("ccx") - F.col("w")).alias("x1"),
        (F.col("ccy") - F.col("h")).alias("y1"),
        (F.col("ccx") + F.col("w")).alias("x2"),
        (F.col("ccy") + F.col("h")).alias("y2"),
        F.array(
            F.struct((F.col("ccx") + F.col("w")).alias("x"), F.col("ccy").alias("y")),
            F.struct(F.col("ccx").alias("x"), (F.col("ccy") + F.col("h")).alias("y")),
            F.struct((F.col("ccx") - F.col("w")).alias("x"), F.col("ccy").alias("y")),
            F.struct(F.col("ccx").alias("x"), (F.col("ccy") - F.col("h")).alias("y")),
            F.struct((F.col("ccx") + F.col("w")).alias("x"), F.col("ccy").alias("y")),
        ).alias("ring"),
    )
    # polygon bbox -> covering cells (integer-unit variant of _cells)
    ring_cells = ring.withColumn(
        "cx",
        F.explode(F.sequence(F.floor(F.col("x1") / _U), F.floor(F.col("x2") / _U))),
    ).withColumn(
        "cy",
        F.explode(F.sequence(F.floor(F.col("y1") / _U), F.floor(F.col("y2") / _U))),
    )
    # spread(): the broadcast cell join fans each point out to ~16
    # candidate rings and the crossing sum runs per candidate, so the
    # probe side must occupy every core even when the fixture parquet is
    # a single row group (1 scan split).  No-op on any production-size
    # table — see tables.spread.
    from geospatial_data_lake_spark.tables import spread

    points = spread(
        spark,
        t.events.select(
            ((F.col("event_id") * 7919) % 900 - 450).alias("px"),
            ((F.col("event_id") * 104729) % 425 - 212).alias("py"),
        ),
    ).withColumns(
        {
            "cx": F.floor(F.col("px") / _U),
            "cy": F.floor(F.col("py") / _U),
        }
    )
    bbox_hit = F.col("px").between(F.col("x1"), F.col("x2")) & F.col("py").between(
        F.col("y1"), F.col("y2")
    )
    return (
        points.join(F.broadcast(ring_cells), ["cx", "cy"])
        .filter(bbox_hit)  # codegen'd prefilter before the crossing sum
        .filter(unrolled_ray_cast(F.col("ring"), F.col("px"), F.col("py"), 4))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def _sat_overlap_sql(ax: str, ay: str) -> str:
    """DuckDB separating-axis interval-overlap term for one axis: the
    diamonds' projections are center +/- max(|w*ax|, |h*ay|)."""
    return (
        f"abs((a.ccx - b.ccx) * ({ax}) + (a.ccy - b.ccy) * ({ay}))"
        f" <= greatest(abs(a.w * ({ax})), abs(a.h * ({ay})))"
        f"  + greatest(abs(b.w * ({ax})), abs(b.h * ({ay})))"
    )


_SQL_SAT = " AND ".join(
    _sat_overlap_sql(ax, ay)
    for ax, ay in [("a.h", "a.w"), ("a.h", "-a.w"), ("b.h", "b.w"), ("b.h", "-b.w")]
)


def _sat_overlap_col(ax: Column, ay: Column) -> Column:
    proj = (F.col("a.ccx") - F.col("b.ccx")) * ax + (
        F.col("a.ccy") - F.col("b.ccy")
    ) * ay
    ra = F.greatest(F.abs(F.col("a.w") * ax), F.abs(F.col("a.h") * ay))
    rb = F.greatest(F.abs(F.col("b.w") * ax), F.abs(F.col("b.h") * ay))
    return F.abs(proj) <= ra + rb


@register(
    "geo05_polygon_intersect_pairs",
    oracle="""
        WITH d AS (""" + _DIAMOND_SQL + """)
        SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE """ + _SQL_SAT + """
    """,
    tags=("geo", "polygon", "spatial-join", "J8"),
)
def geo05_polygon_intersect_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All dataset pairs whose polygon footprints intersect — convex
    overlap by the separating-axis theorem (the polygons touch iff no
    edge-normal axis separates their projections), evaluated in exact
    integer arithmetic shared verbatim with the oracle.

    Scale shape = geo01's grid spatial join: each polygon's bbox explodes
    to covering cells, candidate pairs meet through the cell equi-join
    (hash shuffle, never a cross join), the SAT predicate refines, and
    the reference-point rule (report only in the cell holding the bbox
    intersection's min corner) dedups without a distinct() shuffle."""
    t = tables(spark, sf_dir)
    d = _doc_diamonds(t.documents).select(
        "doc_id",
        "ccx",
        "ccy",
        "w",
        "h",
        (F.col("ccx") - F.col("w")).alias("x1"),
        (F.col("ccy") - F.col("h")).alias("y1"),
        (F.col("ccx") + F.col("w")).alias("x2"),
        (F.col("ccy") + F.col("h")).alias("y2"),
    )
    cells = d.withColumn(
        "cx",
        F.explode(F.sequence(F.floor(F.col("x1") / _U), F.floor(F.col("x2") / _U))),
    ).withColumn(
        "cy",
        F.explode(F.sequence(F.floor(F.col("y1") / _U), F.floor(F.col("y2") / _U))),
    )
    a = cells.alias("a")
    b = cells.alias("b")
    sat = (
        _sat_overlap_col(F.col("a.h"), F.col("a.w"))
        & _sat_overlap_col(F.col("a.h"), -F.col("a.w"))
        & _sat_overlap_col(F.col("b.h"), F.col("b.w"))
        & _sat_overlap_col(F.col("b.h"), -F.col("b.w"))
    )
    ref_cx = F.floor(F.greatest(F.col("a.x1"), F.col("b.x1")) / _U)
    ref_cy = F.floor(F.greatest(F.col("a.y1"), F.col("b.y1")) / _U)
    return (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(sat)
        .filter((F.col("a.cx") == ref_cx) & (F.col("a.cy") == ref_cy))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
    )


@register(
    "j11_binned_interval_join",
    oracle="""
        WITH c AS (
            SELECT n_nationkey, n_name,
                   TIMESTAMP '1995-01-01' + INTERVAL (n_nationkey * 90) DAY
                       AS c_start,
                   TIMESTAMP '1995-01-01' + INTERVAL (n_nationkey * 90 + 180) DAY
                       AS c_end
            FROM nation
        ),
        o AS (
            SELECT o_orderkey, o_orderdate AS o_start,
                   o_orderdate + INTERVAL ((o_orderkey % 30) + 1) DAY AS o_end
            FROM orders
        )
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_overlapping
        FROM o JOIN c ON o.o_start <= c.c_end AND c.c_start <= o.o_end
        GROUP BY n_name
    """,
    tags=("geo", "temporal", "binned", "J8-scale"),
)
def j11_binned_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME interval-overlap query as geo03, executed as an equi-join:
    both sides explode to the 30-day time bins they span, pairs meet on
    bin equality (hash shuffle — no nested loop), the exact overlap
    predicate refines, and the reference-bin rule (report only in the
    overlap's first bin) dedups without a distinct. geo03's broadcast
    nested loop needs one side to be dimension-sized; this form scales to
    interval x interval at fact size on BOTH sides — the dd03/dd04
    pattern applied to time. Identical results, verified by the same
    oracle."""
    t = tables(spark, sf_dir)
    bin_sec = 30 * 86400
    base = F.to_timestamp(F.lit("1995-01-01"))
    coll = t.nation.select(
        "n_name",
        F.timestamp_add("DAY", F.col("n_nationkey") * 90, base).alias("c_start"),
        F.timestamp_add("DAY", F.col("n_nationkey") * 90 + 180, base).alias("c_end"),
    ).withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("c_start") / bin_sec),
                F.floor(F.unix_timestamp("c_end") / bin_sec),
            )
        ),
    )
    items = t.orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("o_start"),
        F.timestamp_add(
            "DAY", (F.col("o_orderkey") % 30) + 1, F.col("o_orderdate")
        ).alias("o_end"),
    ).withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("o_start") / bin_sec),
                F.floor(F.unix_timestamp("o_end") / bin_sec),
            )
        ),
    )
    ref_bin = F.floor(
        F.greatest(F.unix_timestamp("o_start"), F.unix_timestamp("c_start")) / bin_sec
    )
    return (
        items.join(coll, "bin")
        .filter(
            (F.col("o_start") <= F.col("c_end")) & (F.col("c_start") <= F.col("o_end"))
        )
        .filter(F.col("bin") == ref_bin)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_overlapping"))
    )


def _morton_sql() -> str:
    """DuckDB twin of the unrolled Morton interleave below (pure
    integer bit arithmetic — identical on any engine)."""
    xs = " + ".join(
        f"((((doc_id * 7919) % 900 >> {i}) & 1) << {2 * i})" for i in range(10)
    )
    ys = " + ".join(
        f"((((doc_id * 104729) % 425 >> {i}) & 1) << {2 * i + 1})"
        for i in range(9)
    )
    return f"({xs} + {ys})"


@register(
    "geo06_zorder_cells",
    oracle=f"""
        WITH m AS (
            SELECT doc_id, {_morton_sql()} AS cell FROM documents
        )
        SELECT CAST(cell >> 10 AS BIGINT) AS quad,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(cell) AS BIGINT) AS min_cell,
               CAST(max(cell) AS BIGINT) AS max_cell
        FROM m GROUP BY quad ORDER BY quad
    """,
    tags=("geo", "zorder", "layout"),
)
def geo06_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) cell key per document from the synthetic box
    centers' integer lattice coordinates — the interleaved key the
    Z-order writer (layout.py) clusters files on — rolled up to a
    per-quad (top-10-bit prefix) density histogram with the cell range
    each quad spans.

    The interleave is 19 unrolled shift/mask/or terms — pure in-row
    integer codegen, bit-identical on any engine (the geohash string
    form is this key base32-chunked; the integer form is what range
    predicates and file stats actually compare).  The prefix property
    is the point: a quad's documents occupy ONE contiguous Morton
    range (min_cell/max_cell prove it per group), so a 2-D spatial
    predicate becomes a small set of 1-D key ranges — which per-file
    min/max stats (manifest_table.py) can prune without a spatial
    index.  Scale shape: one scan + one category-sized partial-agg
    rollup; the key itself costs no shuffle anywhere."""
    t = tables(spark, sf_dir)
    x = (F.col("doc_id") * 7919) % 900
    y = (F.col("doc_id") * 104729) % 425
    terms = [
        F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(10)
    ] + [
        F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(9)
    ]
    cell = terms[0]
    for tm in terms[1:]:
        cell = cell + tm
    m = t.documents.select("doc_id", cell.alias("cell"))
    return (
        m.groupBy(F.shiftright("cell", 10).cast("bigint").alias("quad"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("cell").cast("bigint").alias("min_cell"),
            F.max("cell").cast("bigint").alias("max_cell"),
        )
        .orderBy("quad")
    )


# --- geo07: KNN-within-radius join ----------------------------------------

_KNN_R = 2.0  # search radius, degrees — geo07 probes on a grid of
# exactly this cell size (one-ring completeness needs cell >= radius)


@register(
    "geo07_nearest_within_radius",
    oracle=f"""
        WITH p AS (
            SELECT event_id,
                   ((event_id * 7919) % 900) / 10.0 - 45.0 AS px,
                   ((event_id * 104729) % 425) / 10.0 - 21.25 AS py
            FROM events
        ),
        c AS (
            SELECT doc_id,
                   ((doc_id * 7919) % 900) / 10.0 - 45.0 AS qx,
                   ((doc_id * 104729) % 425) / 10.0 - 21.25 AS qy
            FROM documents
        ),
        pairs AS (
            SELECT event_id, doc_id,
                   (px - qx) * (px - qx) + (py - qy) * (py - qy) AS d2
            FROM p CROSS JOIN c
            WHERE (px - qx) * (px - qx) + (py - qy) * (py - qy)
                  <= {_KNN_R * _KNN_R}
        )
        SELECT event_id, doc_id AS nearest_doc, round(sqrt(d2), 6) AS dist
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY event_id ORDER BY d2, doc_id) AS rn
            FROM pairs
        ) WHERE rn = 1
        ORDER BY event_id
    """,
    tags=("geo", "knn", "join"),
)
def geo07_nearest_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor-within-radius spatial join: for every event
    point, the closest dataset footprint center within 2 degrees
    (ties by doc_id) — the "which catalog item is this observation
    closest to" query, the KNN companion of geo02's containment.

    Scale shape: the CENTER (dimension) side replicates to its cell
    plus the 8 neighbors — 9 broadcast-side rows per center, complete
    for any radius <= the cell size (the grid is radius-sized) — while
    the point (fact)
    side stays un-replicated in its single cell; the cell equi-join
    prunes candidates before the exact distance test, and the per-point
    argmin folds as min(struct(d2, doc_id)) inside a partial-then-final
    aggregation keyed on event_id (no window sort, no global sort —
    the oracle's row_number is the SQL spelling of the same argmin).
    Never a cartesian: cost is points x local density, not points x
    centers.  Skewed cells (dense regions) split under AQE; the radius
    bounds the probe ring by construction."""
    t = tables(spark, sf_dir)
    # r15 (guide §3: prune candidates before the expensive test): the
    # probe grid is query-LOCAL at exactly the search radius instead of
    # the shared 5-degree ``_CELL``.  One-ring completeness only needs
    # cell >= radius, and candidate density per point scales with
    # cell^2 — (2/5)^2 ≈ 6x fewer exact distance tests for the same
    # (internal, never emitted) cell keys.  Replication stays 9x on the
    # dimension side only.
    cell = _KNN_R
    px = ((F.col("event_id") * 7919) % 900) / 10.0 - 45.0
    py = ((F.col("event_id") * 104729) % 425) / 10.0 - 21.25
    points = t.events.select(
        "event_id", px.alias("px"), py.alias("py")
    ).withColumns(
        {
            "cx": F.floor(F.col("px") / cell),
            "cy": F.floor(F.col("py") / cell),
        }
    )
    qx = ((F.col("doc_id") * 7919) % 900) / 10.0 - 45.0
    qy = ((F.col("doc_id") * 104729) % 425) / 10.0 - 21.25
    ring = F.array(
        *[
            F.struct(
                (F.floor(F.col("qx") / cell) + dx).alias("cx"),
                (F.floor(F.col("qy") / cell) + dy).alias("cy"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    centers = (
        t.documents.select("doc_id", qx.alias("qx"), qy.alias("qy"))
        .select("doc_id", "qx", "qy", F.explode(ring).alias("cell"))
        .select("doc_id", "qx", "qy", "cell.cx", "cell.cy")
    )
    d2 = (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx")) + (
        F.col("py") - F.col("qy")
    ) * (F.col("py") - F.col("qy"))
    best = (
        points.join(F.broadcast(centers), ["cx", "cy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= F.lit(_KNN_R * _KNN_R))
        .groupBy("event_id")
        .agg(F.min(F.struct("d2", "doc_id")).alias("b"))
    )
    return best.select(
        "event_id",
        F.col("b.doc_id").alias("nearest_doc"),
        F.round(F.sqrt("b.d2"), 6).alias("dist"),
    ).orderBy("event_id")


@register(
    "geo08_wkb_point_in_polygon",
    oracle="""
        WITH d AS (""" + _DIAMOND_SQL + """),
        p AS (
            SELECT event_id,
                   (event_id * 7919) % 900 - 450 AS px,
                   (event_id * 104729) % 425 - 212 AS py
            FROM events
        )
        SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_points
        FROM p JOIN d ON """ + _SQL_INSIDE + """
        WHERE d.doc_id % 5 = 0
        GROUP BY d.doc_id
    """,
    tags=("geo", "polygon", "wkb", "geoparquet", "source"),
)
def geo08_wkb_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo04's containment count with every geometry routed through the
    GEOPARQUET WKB CONTRACT: points and polygon rings are encoded to
    spec WKB binary columns and decoded back by the Arrow-batched
    kernels in sources/wkb_source.py before the spatial join runs — the
    end-to-end proof that a GeoParquet-shaped table (geometry as opaque
    ``binary``) drives the engine's native predicates.  The oracle
    computes from the raw coordinates and never sees WKB, so the hash
    gate certifies the encode->decode round trip bit-for-bit along with
    the join.

    Scale shape: the codecs are narrow mapInPandas stages (no shuffle,
    partition-parallel — the multimodal-codec shape) on each side of
    geo04's plan: polygon cells broadcast, points meet them on grid
    cell, codegen bbox prefilter, unrolled ray cast.  Only the %5
    polygon slice is decoded — predicate pushdown happens BEFORE the
    decode kernel, the order a GeoParquet reader must preserve."""
    from geospatial_data_lake_spark.sources.wkb_source import (
        points_to_wkb,
        polygons_to_wkb,
        wkb_to_points,
        wkb_to_polygons,
    )
    from geospatial_data_lake_spark.tables import spread

    t = tables(spark, sf_dir)
    d = _doc_diamonds(t.documents).filter(F.col("doc_id") % 5 == 0)
    ring_src = d.select(
        "doc_id",
        F.array(
            F.struct(
                (F.col("ccx") + F.col("w")).cast("double").alias("x"),
                F.col("ccy").cast("double").alias("y"),
            ),
            F.struct(
                F.col("ccx").cast("double").alias("x"),
                (F.col("ccy") + F.col("h")).cast("double").alias("y"),
            ),
            F.struct(
                (F.col("ccx") - F.col("w")).cast("double").alias("x"),
                F.col("ccy").cast("double").alias("y"),
            ),
            F.struct(
                F.col("ccx").cast("double").alias("x"),
                (F.col("ccy") - F.col("h")).cast("double").alias("y"),
            ),
            F.struct(
                (F.col("ccx") + F.col("w")).cast("double").alias("x"),
                F.col("ccy").cast("double").alias("y"),
            ),
        ).alias("ring"),
    )
    # geometry -> WKB binary column -> back: the GeoParquet round trip
    polys = wkb_to_polygons(
        polygons_to_wkb(ring_src, "ring").drop("ring"), "wkb"
    )
    ring = polys.select(
        "doc_id",
        "ring",
        F.array_min(F.transform("ring", lambda v: v["x"])).alias("x1"),
        F.array_min(F.transform("ring", lambda v: v["y"])).alias("y1"),
        F.array_max(F.transform("ring", lambda v: v["x"])).alias("x2"),
        F.array_max(F.transform("ring", lambda v: v["y"])).alias("y2"),
    )
    ring_cells = ring.withColumn(
        "cx",
        F.explode(F.sequence(F.floor(F.col("x1") / _U), F.floor(F.col("x2") / _U))),
    ).withColumn(
        "cy",
        F.explode(F.sequence(F.floor(F.col("y1") / _U), F.floor(F.col("y2") / _U))),
    )
    pts_src = t.events.select(
        "event_id",
        ((F.col("event_id") * 7919) % 900 - 450).cast("double").alias("px"),
        ((F.col("event_id") * 104729) % 425 - 212).cast("double").alias("py"),
    )
    points = wkb_to_points(
        points_to_wkb(pts_src, "px", "py").drop("px", "py"), "wkb"
    ).select(F.col("x").alias("px"), F.col("y").alias("py"))
    points = spread(spark, points).withColumns(
        {
            "cx": F.floor(F.col("px") / _U),
            "cy": F.floor(F.col("py") / _U),
        }
    )
    bbox_hit = F.col("px").between(F.col("x1"), F.col("x2")) & F.col(
        "py"
    ).between(F.col("y1"), F.col("y2"))
    return (
        points.join(F.broadcast(ring_cells), ["cx", "cy"])
        .filter(bbox_hit)
        .filter(unrolled_ray_cast(F.col("ring"), F.col("px"), F.col("py"), 4))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def _rect_ring(cx, cy, hx, hy):
    """Closed 5-vertex axis-aligned rectangle ring (Column structs)."""
    return F.array(
        F.struct((cx - hx).alias("x"), (cy - hy).alias("y")),
        F.struct((cx + hx).alias("x"), (cy - hy).alias("y")),
        F.struct((cx + hx).alias("x"), (cy + hy).alias("y")),
        F.struct((cx - hx).alias("x"), (cy + hy).alias("y")),
        F.struct((cx - hx).alias("x"), (cy - hy).alias("y")),
    )


@register(
    "geo09_wkb_multipolygon_holes",
    oracle="""
        WITH g AS (
            SELECT doc_id,
                   (doc_id * 31) % 700 - 350 AS ccx,
                   (doc_id * 57) % 300 - 150 AS ccy,
                   3 + doc_id % 4 AS w,
                   3 + doc_id % 3 AS h,
                   (doc_id * 31) % 700 - 350 + 30 + doc_id % 40 AS p2x,
                   (doc_id * 57) % 300 - 150 AS p2y
            FROM documents WHERE doc_id % 7 = 0
        ),
        p AS (
            SELECT event_id,
                   (event_id * 7919) % 900 - 450 AS px,
                   (event_id * 104729) % 425 - 212 AS py
            FROM events
        )
        SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_points
        FROM p JOIN g ON (
            (abs(px - ccx) < w + 0.5 AND abs(py - ccy) < h + 0.5
             AND NOT (abs(px - ccx) < w - 1.5 AND abs(py - ccy) < h - 1.5))
            OR (abs(px - p2x) < 2.5 AND abs(py - p2y) < 2.5)
        )
        GROUP BY g.doc_id
    """,
    tags=("geo", "polygon", "wkb", "multipolygon", "holes", "geoparquet"),
)
def geo09_wkb_multipolygon_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points-in-MULTIPOLYGON counts where the geometry travels as WKB
    MultiPolygon (type 6) with INTERIOR RINGS: each selected document
    owns a two-part multipolygon — part 1 is a rectangle with a
    rectangular HOLE punched out (points inside the hole must NOT
    count), part 2 a disjoint solid rectangle — encoded to spec WKB by
    ``multipolygons_to_wkb`` and decoded back by ``wkb_to_rings``
    (sources/wkb_source.py) before the spatial join.  The oracle
    computes containment from the raw rectangle arithmetic and never
    sees WKB, so the hash gate certifies the nested
    parts->rings->vertices encode/decode round trip bit-for-bit AND
    that holes flip containment.

    Scale shape: even-odd parity across rings — ``wkb_to_rings``
    flattens shells and holes into one ring array, each ring explodes
    to its grid cells (small, broadcast), points meet rings on cell,
    the codegen'd unrolled ray cast marks per-ring containment, and a
    per-(doc, point) parity aggregate XORs shells against holes.  No
    ring identity bookkeeping: a hole is just a ring whose containment
    flips the parity, so the same plan serves any nesting depth.  Ring
    boundaries sit on half-integers while points sit on the integer
    lattice, so no point is ever ON a boundary and the even-odd answer
    is exact.  Both aggregates are partial-aggregatable; the candidate
    fan-out is bounded by rings-per-cell exactly as in geo04."""
    from geospatial_data_lake_spark.sources.wkb_source import (
        multipolygons_to_wkb,
        wkb_to_rings,
    )
    from geospatial_data_lake_spark.tables import spread

    t = tables(spark, sf_dir)
    g = t.documents.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        ((F.col("doc_id") * 31) % 700 - 350).cast("double").alias("ccx"),
        ((F.col("doc_id") * 57) % 300 - 150).cast("double").alias("ccy"),
        (3 + F.col("doc_id") % 4).cast("double").alias("w"),
        (3 + F.col("doc_id") % 3).cast("double").alias("h"),
    )
    cx, cy = F.col("ccx"), F.col("ccy")
    w, h = F.col("w"), F.col("h")
    p2x = cx + 30 + F.col("doc_id") % 40
    parts = F.array(
        # part 1: outer shell + interior hole (strictly inside: w >= 3)
        F.array(
            _rect_ring(cx, cy, w + 0.5, h + 0.5),
            _rect_ring(cx, cy, w - 1.5, h - 1.5),
        ),
        # part 2: disjoint solid rectangle 30+ units east (no overlap:
        # max shell half-extent 6.5 + 2.5 < 30)
        F.array(_rect_ring(p2x, cy, F.lit(2.5), F.lit(2.5))),
    )
    geom_src = g.select("doc_id", parts.alias("parts"))
    # geometry -> WKB MultiPolygon binary -> back: the holed round trip
    decoded = wkb_to_rings(multipolygons_to_wkb(geom_src, "parts"), "wkb")
    ring = decoded.select("doc_id", F.explode("rings").alias("ring")).select(
        "doc_id",
        "ring",
        F.array_min(F.transform("ring", lambda v: v["x"])).alias("x1"),
        F.array_min(F.transform("ring", lambda v: v["y"])).alias("y1"),
        F.array_max(F.transform("ring", lambda v: v["x"])).alias("x2"),
        F.array_max(F.transform("ring", lambda v: v["y"])).alias("y2"),
    )
    ring_cells = ring.withColumn(
        "cx",
        F.explode(F.sequence(F.floor(F.col("x1") / _U), F.floor(F.col("x2") / _U))),
    ).withColumn(
        "cy",
        F.explode(F.sequence(F.floor(F.col("y1") / _U), F.floor(F.col("y2") / _U))),
    )
    points = spread(
        spark,
        t.events.select(
            "event_id",
            ((F.col("event_id") * 7919) % 900 - 450).cast("double").alias("px"),
            ((F.col("event_id") * 104729) % 425 - 212).cast("double").alias("py"),
        ),
    ).withColumns(
        {
            "cx": F.floor(F.col("px") / _U),
            "cy": F.floor(F.col("py") / _U),
        }
    )
    bbox_hit = F.col("px").between(F.col("x1"), F.col("x2")) & F.col(
        "py"
    ).between(F.col("y1"), F.col("y2"))
    # one row per (doc, point, containing ring); XOR rings via parity —
    # holes cancel their shell, disjoint parts contribute independently
    contained = (
        points.join(F.broadcast(ring_cells), ["cx", "cy"])
        .filter(bbox_hit)
        .filter(unrolled_ray_cast(F.col("ring"), F.col("px"), F.col("py"), 4))
        .groupBy("doc_id", "event_id")
        .agg(F.count(F.lit(1)).alias("n_rings"))
        .filter(F.col("n_rings") % 2 == 1)
    )
    return contained.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_points"))


@register(
    "geo10_wkb_polyline_length",
    oracle="""
        SELECT doc_id,
               CAST(5 AS BIGINT) AS n_pts,
               round(list_sum(list_transform(range(1, 5), k ->
                   sqrt(
                       (CAST((doc_id * 31 + k * 17) % 500 AS DOUBLE)
                        - CAST((doc_id * 31 + (k - 1) * 17) % 500 AS DOUBLE))
                     * (CAST((doc_id * 31 + k * 17) % 500 AS DOUBLE)
                        - CAST((doc_id * 31 + (k - 1) * 17) % 500 AS DOUBLE))
                     + (CAST((doc_id * 57 + k * 29) % 300 AS DOUBLE)
                        - CAST((doc_id * 57 + (k - 1) * 29) % 300 AS DOUBLE))
                     * (CAST((doc_id * 57 + k * 29) % 300 AS DOUBLE)
                        - CAST((doc_id * 57 + (k - 1) * 29) % 300 AS DOUBLE))
                   ))), 4) AS length
        FROM documents
        WHERE doc_id % 3 = 0
        ORDER BY doc_id
    """,
    tags=("geo", "linestring", "wkb", "geoparquet"),
)
def geo10_wkb_polyline_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document polyline length where the geometry travels as WKB
    LINESTRING (type 2): a deterministic 5-vertex path per selected
    document is encoded by ``linestrings_to_wkb`` and decoded back by
    ``wkb_to_linestrings`` (sources/wkb_source.py) before the length
    fold runs — with geo08 (Point/Polygon) and geo09 (MultiPolygon +
    holes) this puts every supported WKB geometry type behind a hash
    gate.  The oracle computes from the raw vertex arithmetic and
    never sees WKB.

    Scale shape: the codec is a narrow passthrough mapInPandas stage;
    the length is a per-row left-to-right ``aggregate`` fold over the
    decoded vertex array (segment order fixed on both engines, one
    4-dp round at the end) — no shuffle at all before the final sort."""
    from geospatial_data_lake_spark.sources.wkb_source import (
        linestrings_to_wkb,
        wkb_to_linestrings,
    )

    t = tables(spark, sf_dir)
    vx = lambda k: ((F.col("doc_id") * 31 + k * 17) % 500).cast("double")  # noqa: E731
    vy = lambda k: ((F.col("doc_id") * 57 + k * 29) % 300).cast("double")  # noqa: E731
    src = t.documents.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.array(
            *[
                F.struct(vx(k).alias("x"), vy(k).alias("y"))
                for k in range(5)
            ]
        ).alias("path"),
    )
    # geometry -> WKB LineString binary -> back: the polyline round trip
    decoded = wkb_to_linestrings(
        linestrings_to_wkb(src, "path").drop("path"), "wkb"
    )
    path = F.col("path")
    seg = lambda i: F.sqrt(  # noqa: E731
        (F.element_at(path, i + 1)["x"] - F.element_at(path, i)["x"])
        * (F.element_at(path, i + 1)["x"] - F.element_at(path, i)["x"])
        + (F.element_at(path, i + 1)["y"] - F.element_at(path, i)["y"])
        * (F.element_at(path, i + 1)["y"] - F.element_at(path, i)["y"])
    )
    # guard: a single-vertex LineString is legal WKB; an unguarded
    # sequence(1, 0) descends and element_at(path, 0) raises
    length = F.round(
        F.when(
            F.size(path) >= 2,
            F.aggregate(
                F.sequence(F.lit(1), F.size(path) - 1),
                F.lit(0.0),
                lambda acc, i: acc + seg(i),
            ),
        ).otherwise(F.lit(0.0)),
        4,
    )
    return decoded.select(
        "doc_id",
        F.size(path).cast("bigint").alias("n_pts"),
        length.alias("length"),
    ).orderBy("doc_id")


_GEOPARQUET_STORE: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" = (
    weakref.WeakKeyDictionary()
)


def _geoparquet_events(spark: SparkSession, sf_dir: str) -> str:
    """events -> a GEOPARQUET dataset (per session, per sf_dir): point
    geometry as WKB, range-partitioned on x into multiple files so
    each file's stamped per-file bbox covers a distinct x-slice — the
    layout that makes footer-bbox file pruning meaningful."""
    import tempfile

    from geospatial_data_lake_spark.sources.geoparquet import (
        write_geoparquet,
    )
    from geospatial_data_lake_spark.sources.wkb_source import points_to_wkb

    cache = _GEOPARQUET_STORE.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    t = tables(spark, sf_dir)
    pts = t.events.select(
        "event_id",
        (((F.col("event_id") * 7919) % 900) / 10.0 - 45.0).alias("px"),
        (((F.col("event_id") * 104729) % 425) / 10.0 - 21.25).alias("py"),
    )
    wkb = points_to_wkb(pts, "px", "py").drop("px", "py")
    path = tempfile.mkdtemp(prefix="gdl_geoparquet_")
    write_geoparquet(
        wkb.repartitionByRange(8, (F.col("event_id") * 7919) % 900),
        path,
        {"wkb": ["Point"]},
    )
    cache[sf_dir] = path
    return path


@register(
    "geo11_geoparquet_roundtrip",
    oracle="""
        SELECT CAST(floor(((event_id * 7919) % 900) / CAST(10 AS DOUBLE)
                    - 45.0) AS BIGINT) AS cx,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        WHERE ((event_id * 7919) % 900) / CAST(10 AS DOUBLE) - 45.0
                  BETWEEN -10 AND 10
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("geo", "geoparquet", "wkb", "source", "pruning"),
)
def geo11_geoparquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GEOPARQUET FILE CONTRACT end-to-end: events points write as
    a spec GeoParquet dataset (WKB geometry column + per-file ``geo``
    footer metadata with stamped bboxes — sources/geoparquet.py), a
    window query PRUNES FILES from the footers alone
    (``file_bbox_filter`` — zero data IO, the reader-side analog of
    manifest min/max pruning, guarded in-query), and the surviving
    files decode through the WKB kernels into the per-cell counts the
    oracle computes from raw coordinates.  Any drift in the write, the
    footer stamps, the pruning, or the decode breaks the hash.

    Scale shape: footer pruning is O(files) metadata reads; the scan
    reads only intersecting files; decode is the narrow passthrough
    map stage geo08 pins; one partial-aggregated exchange for the
    cell counts."""
    from geospatial_data_lake_spark.sources.geoparquet import (
        file_bbox_filter,
        read_geoparquet_meta,
    )
    from geospatial_data_lake_spark.sources.wkb_source import wkb_to_points

    path = _geoparquet_events(spark, sf_dir)
    meta = read_geoparquet_meta(path)
    if meta.columns["wkb"]["encoding"] != "WKB":  # validated contract
        raise RuntimeError("geoparquet metadata lost the WKB encoding")
    import os

    total = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    pruned = file_bbox_filter(path, "wkb", -10.0, -90.0, 10.0, 90.0)
    # the x-window covers ~2/9 of the range-partitioned slices; footer
    # pruning must discard files (survive python -O: no assert)
    if not (0 < len(pruned) < total):
        raise RuntimeError(
            f"geoparquet footer pruning disengaged: {len(pruned)}/{total}"
        )
    pts = wkb_to_points(spark.read.parquet(*pruned), "wkb")
    return (
        pts.filter(F.col("x").between(-10.0, 10.0))
        .groupBy(F.floor("x").cast("bigint").alias("cx"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cx")
    )


@register(
    "geo12_st_functions",
    oracle="""
        WITH d AS (""" + _DIAMOND_SQL + """),
        r AS (
            SELECT doc_id,
                   [{'x': CAST(ccx + w AS DOUBLE), 'y': CAST(ccy AS DOUBLE)},
                    {'x': CAST(ccx AS DOUBLE), 'y': CAST(ccy + h AS DOUBLE)},
                    {'x': CAST(ccx - w AS DOUBLE), 'y': CAST(ccy AS DOUBLE)},
                    {'x': CAST(ccx AS DOUBLE), 'y': CAST(ccy - h AS DOUBLE)},
                    {'x': CAST(ccx + w AS DOUBLE), 'y': CAST(ccy AS DOUBLE)}]
                       AS ring
            FROM d WHERE doc_id % 4 = 0
        ),
        m AS (
            SELECT doc_id, ring,
                   list_sum(list_transform(range(1, 5), i ->
                       ring[i].x * ring[i+1].y - ring[i+1].x * ring[i].y))
                       / 2 AS a2
            FROM r
        )
        SELECT doc_id,
               round(abs(a2), 4) AS area,
               round(list_sum(list_transform(range(1, 5), i ->
                   sqrt((ring[i+1].x - ring[i].x) * (ring[i+1].x - ring[i].x)
                      + (ring[i+1].y - ring[i].y) * (ring[i+1].y - ring[i].y)))),
                   4) AS perimeter,
               round(list_sum(list_transform(range(1, 5), i ->
                   (ring[i].x + ring[i+1].x)
                   * (ring[i].x * ring[i+1].y - ring[i+1].x * ring[i].y)))
                   / (3 * 2 * a2), 4) AS cx,
               round(list_sum(list_transform(range(1, 5), i ->
                   (ring[i].y + ring[i+1].y)
                   * (ring[i].x * ring[i+1].y - ring[i+1].x * ring[i].y)))
                   / (3 * 2 * a2), 4) AS cy
        FROM m
        ORDER BY doc_id
    """,
    tags=("geo", "functions", "sedona", "st"),
)
def geo12_st_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ST_* scalar catalog (functions/geometry.py — the Sedona-
    parity surface) over the document diamonds: shoelace area, edge
    perimeter, and the area-weighted polygon centroid, every fold a
    fixed left-to-right codegen expression the oracle replays with the
    identical DuckDB list fold — bit-for-bit doubles before one final
    4-dp round.

    Scale shape: pure per-row expressions — no shuffle at all before
    the presentation sort; at 100 TB this is a narrow projection over
    the geometry column, the shape every ST_* pipeline stage should
    compile to."""
    from geospatial_data_lake_spark.functions.geometry import (
        st_area,
        st_centroid,
        st_perimeter,
    )

    t = tables(spark, sf_dir)
    d = _doc_diamonds(t.documents).filter(F.col("doc_id") % 4 == 0)
    ring = F.array(
        F.struct(
            (F.col("ccx") + F.col("w")).cast("double").alias("x"),
            F.col("ccy").cast("double").alias("y"),
        ),
        F.struct(
            F.col("ccx").cast("double").alias("x"),
            (F.col("ccy") + F.col("h")).cast("double").alias("y"),
        ),
        F.struct(
            (F.col("ccx") - F.col("w")).cast("double").alias("x"),
            F.col("ccy").cast("double").alias("y"),
        ),
        F.struct(
            F.col("ccx").cast("double").alias("x"),
            (F.col("ccy") - F.col("h")).cast("double").alias("y"),
        ),
        F.struct(
            (F.col("ccx") + F.col("w")).cast("double").alias("x"),
            F.col("ccy").cast("double").alias("y"),
        ),
    )
    src = d.select("doc_id", ring.alias("ring"))
    cx, cy = st_centroid(F.col("ring"))
    return src.select(
        "doc_id",
        F.round(st_area(F.col("ring")), 4).alias("area"),
        F.round(st_perimeter(F.col("ring")), 4).alias("perimeter"),
        F.round(cx, 4).alias("cx"),
        F.round(cy, 4).alias("cy"),
    ).orderBy("doc_id")
