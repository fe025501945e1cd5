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
