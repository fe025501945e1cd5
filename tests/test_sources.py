"""Source/sink connector tests — S5 (json+corrupt), S6 (binary), S7
(manifest csv), S8 (keyed upsert)."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from geospatial_data_lake_spark.sources.binary_source import (
    read_binary_files,
    with_sha256,
)
from geospatial_data_lake_spark.sources.json_source import read_json_documents
from geospatial_data_lake_spark.sources.sinks import upsert_parquet, write_manifest_csv

DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def should_split_good_and_corrupt_json(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": "a", "type": "Collection", "n": 1}\n'
        "{this is not json}\n"
        '{"id": "b", "type": "Feature", "n": 2}\n'
    )
    good, corrupt = read_json_documents(spark, str(p), DOC_SCHEMA)
    assert {r.id for r in good.collect()} == {"a", "b"}
    assert corrupt.count() == 1
    assert "not json" in corrupt.collect()[0][0]


def should_read_binary_files_and_digest(spark, tmp_path):
    data = b"hello spark binary source"
    (tmp_path / "x.bin").write_bytes(data)
    (tmp_path / "y.bin").write_bytes(data * 2)
    inline, oversized = read_binary_files(spark, str(tmp_path), glob="*.bin")
    assert oversized.count() == 0
    rows = {
        os.path.basename(r.path): r.sha256 for r in with_sha256(inline).collect()
    }
    assert rows["x.bin"] == hashlib.sha256(data).hexdigest()
    assert rows["y.bin"] == hashlib.sha256(data * 2).hexdigest()


def should_route_oversized_binaries_separately(spark, tmp_path):
    (tmp_path / "small.bin").write_bytes(b"x" * 10)
    (tmp_path / "big.bin").write_bytes(b"x" * 1000)
    inline, oversized = read_binary_files(
        spark, str(tmp_path), glob="*.bin", max_inline_bytes=100
    )
    assert [os.path.basename(r.path) for r in inline.collect()] == ["small.bin"]
    assert [os.path.basename(r.path) for r in oversized.collect()] == ["big.bin"]


def should_write_manifest_csv_rows(spark, tmp_path):
    manifest = spark.createDataFrame(
        [("bucket-a", "k/1"), ("bucket-a", "k 2,with comma")],
        "bucket string, key string",
    )
    out = tmp_path / "manifest"
    write_manifest_csv(manifest, str(out))
    back = spark.read.csv(str(out)).collect()
    assert {(r[0], r[1]) for r in back} == {
        ("bucket-a", "k/1"),
        ("bucket-a", "k 2,with comma"),
    }


def should_upsert_replace_and_insert(spark, tmp_path):
    path = str(tmp_path / "tbl.parquet")
    base = spark.createDataFrame(
        [("a", 1, "old"), ("b", 2, "old")], "id string, v int, src string"
    )
    base.write.parquet(path)
    updates = spark.createDataFrame(
        [("b", 20, "new"), ("c", 30, "new")], "id string, v int, src string"
    )
    upsert_parquet(spark, path, updates, key_cols=["id"])
    result = {r.id: (r.v, r.src) for r in spark.read.parquet(path).collect()}
    assert result == {"a": (1, "old"), "b": (20, "new"), "c": (30, "new")}


def should_upsert_create_when_missing(spark, tmp_path):
    path = str(tmp_path / "fresh.parquet")
    updates = spark.createDataFrame([("a", 1)], "id string, v int")
    upsert_parquet(spark, path, updates, key_cols=["id"])
    assert spark.read.parquet(path).count() == 1


def should_upsert_rewrite_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "part.parquet")
    base = spark.createDataFrame(
        [("p1", "a", 1), ("p1", "b", 2), ("p2", "c", 3)],
        "pt string, id string, v int",
    )
    base.write.partitionBy("pt").parquet(path)
    before = {
        f: os.path.getmtime(os.path.join(path, "pt=p2", f))
        for f in os.listdir(os.path.join(path, "pt=p2"))
        if f.endswith(".parquet")
    }
    updates = spark.createDataFrame([("p1", "a", 10)], "pt string, id string, v int")
    upsert_parquet(spark, path, updates, key_cols=["id"], partition_by=["pt"])
    result = {
        (r.pt, r.id): r.v for r in spark.read.parquet(path).collect()
    }
    assert result == {("p1", "a"): 10, ("p1", "b"): 2, ("p2", "c"): 3}
    after = {
        f: os.path.getmtime(os.path.join(path, "pt=p2", f))
        for f in os.listdir(os.path.join(path, "pt=p2"))
        if f.endswith(".parquet")
    }
    assert before == after, "untouched partition p2 must not be rewritten"


def should_upsert_remove_old_row_when_key_changes_partition(spark, tmp_path):
    """MERGE semantics across a partition move: updating key 'a' from
    partition p1 to p2 must delete the p1 copy even though no update row
    lands in p1 (the old partition still holds key 'b')."""
    path = str(tmp_path / "move.parquet")
    base = spark.createDataFrame(
        [("p1", "a", 1), ("p1", "b", 2), ("p2", "c", 3)],
        "pt string, id string, v int",
    )
    base.write.partitionBy("pt").parquet(path)
    updates = spark.createDataFrame([("p2", "a", 10)], "pt string, id string, v int")
    upsert_parquet(spark, path, updates, key_cols=["id"], partition_by=["pt"])
    result = {(r.pt, r.id): r.v for r in spark.read.parquet(path).collect()}
    assert result == {("p1", "b"): 2, ("p2", "a"): 10, ("p2", "c"): 3}


def should_upsert_drop_partition_emptied_by_key_move(spark, tmp_path):
    """If the moved key was its old partition's only row, that partition's
    directory must disappear (dynamic overwrite alone never rewrites an
    empty partition, so the stale file would resurrect the row)."""
    path = str(tmp_path / "empty.parquet")
    base = spark.createDataFrame(
        [("p1", "a", 1), ("p2", "c", 3)], "pt string, id string, v int"
    )
    base.write.partitionBy("pt").parquet(path)
    updates = spark.createDataFrame([("p2", "a", 10)], "pt string, id string, v int")
    upsert_parquet(spark, path, updates, key_cols=["id"], partition_by=["pt"])
    result = {(r.pt, r.id): r.v for r in spark.read.parquet(path).collect()}
    assert result == {("p2", "a"): 10, ("p2", "c"): 3}
    assert not os.path.exists(os.path.join(path, "pt=p1"))


def should_prune_partitions_on_version_scan(spark, tmp_path):
    import contextlib
    import io

    from pyspark.sql import functions as F

    from geospatial_data_lake_spark.sources.sinks import write_assets_partitioned

    assets = spark.createDataFrame(
        [
            (f"d{i % 3}", f"v{i % 2}", "DATA", i, f"s3://b/{i}", None)
            for i in range(60)
        ],
        "dataset_id string, version_id string, item_type string, "
        "item_index long, url string, multihash string",
    )
    root = str(tmp_path / "assets")
    write_assets_partitioned(assets, root)

    scan = spark.read.parquet(root).filter(
        (F.col("dataset_id") == "d1") & (F.col("version_id") == "v0")
    )
    assert scan.count() == 10
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    (pf_line,) = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert "dataset_id" in pf_line and "version_id" in pf_line, plan


def should_merge_evolved_schemas_across_file_generations(spark, tmp_path):
    """Schema evolution: a column added in later file generations must be
    readable across the whole table (old files yield NULL), with explicit
    mergeSchema — the lake-format behavior version upgrades rely on."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, title string"
    ).write.parquet(root + "/gen=1")
    spark.createDataFrame(
        [(3, "c", "2024-01-01")], "id long, title string, created string"
    ).write.parquet(root + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert set(merged.columns) >= {"id", "title", "created"}
    rows = {r.id: r.created for r in merged.collect()}
    assert rows[3] == "2024-01-01" and rows[1] is None and rows[2] is None


def should_survive_corrupt_files_when_configured(spark, tmp_path):
    """Operational tolerance: one corrupt parquet part must not kill a
    10,000-file scan when ignoreCorruptFiles is on — and MUST fail loudly
    when it is off (silent data loss is worse than a failed job)."""
    import pytest

    root = tmp_path / "mixed"
    spark.createDataFrame([(i,) for i in range(10)], "id long").coalesce(
        1
    ).write.parquet(str(root))
    (root / "part-corrupt.snappy.parquet").write_bytes(b"not a parquet file")

    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        assert spark.read.parquet(str(root)).count() == 10
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)

    with pytest.raises(Exception):
        spark.read.schema("id long").parquet(str(root)).count()


def _write_events_fixture(dirpath, ts_array):
    """Write a minimal events.parquet with the driver fixture's column set
    and a caller-chosen physical encoding for ``ts``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "event_type": pa.array(["click", "view", "click"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(['{"a": 1}', "{}", "{}"]),
        }
    )
    pq.write_table(table, str(dirpath / "events.parquet"), version="2.6")


def should_load_events_under_both_timestamp_encodings(spark, tmp_path):
    """Fixture-drift guard: the driver has regenerated events.parquet with
    ``ts`` as both int64 TIMESTAMP(NANOS) (rounds 1-2) and
    TIMESTAMP(MICROS) (round 3+).  The Tables loader must normalize both
    physical encodings to a Spark timestamp with identical values."""
    import pyarrow as pa

    from geospatial_data_lake_spark.tables import Tables

    base_us = [1_700_000_000_000_000 + i * 1_000_000 for i in range(3)]
    micros_dir = tmp_path / "micros"
    nanos_dir = tmp_path / "nanos"
    micros_dir.mkdir()
    nanos_dir.mkdir()
    _write_events_fixture(micros_dir, pa.array(base_us, pa.timestamp("us")))
    _write_events_fixture(
        nanos_dir, pa.array([v * 1000 + 999 for v in base_us], pa.timestamp("ns"))
    )

    out = {}
    for label, d in (("micros", micros_dir), ("nanos", nanos_dir)):
        df = Tables(spark, str(d)).events
        assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz"), label
        out[label] = [
            r.s
            for r in df.orderBy("event_id")
            .select(F.col("ts").cast("string").alias("s"))
            .collect()
        ]
    # nanos floor-truncate to micros == the micros encoding's exact values
    assert out["micros"] == out["nanos"]


def should_load_every_fixture_table_at_every_scale(spark):
    """Fixture-drift tripwire: every table at every sf loads through the
    Tables accessor, has its expected column set, and lands numeric/
    temporal columns on workable logical types.  Round 3 was lost to a
    silent physical-type change in one column — this fails loudly at
    the first local run instead."""
    import os

    from geospatial_data_lake_spark.tables import TABLE_NAMES, Tables

    expected_cols = {
        "region": {"r_regionkey", "r_name"},
        "nation": {"n_nationkey", "n_name", "n_regionkey"},
        "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
        "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
        "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
        "orders": {
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        },
        "lineitem": {
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        },
        "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
        "documents": {"doc_id", "text", "lang", "source", "n_chars"},
        "embeddings": {"vec_id", "embedding", "label"},
    }
    temporal = {("events", "ts"), ("lineitem", "l_shipdate"), ("orders", "o_orderdate")}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        t = Tables(spark, sf_dir)
        for name in TABLE_NAMES:
            df = getattr(t, name)
            assert set(df.columns) >= expected_cols[name], (sf, name, df.columns)
            dtypes = dict(df.dtypes)
            for tbl, col in temporal:
                if tbl == name:
                    assert dtypes[col] in ("timestamp", "timestamp_ntz", "date"), (
                        sf, name, col, dtypes[col],
                    )
            assert df.limit(1).count() >= 0  # scan actually executes


def should_roundtrip_wkb_geometries_and_accept_big_endian(spark):
    """WKB codec: encode->decode is identity for points and closed
    polygon rings; decode also accepts big-endian blobs (the other
    spec-legal byte order); malformed input raises."""
    import struct

    import pytest

    from geospatial_data_lake_spark.sources.wkb_source import (
        decode_wkb,
        encode_wkb_point,
        encode_wkb_polygon,
        points_to_wkb,
        polygons_to_wkb,
        wkb_to_points,
        wkb_to_polygons,
    )

    # pure-codec roundtrip
    assert decode_wkb(encode_wkb_point(3.5, -7.25)) == (1, [(3.5, -7.25)])
    ring = [(0.0, 0.0), (4.0, 0.0), (2.0, 3.0), (0.0, 0.0)]
    assert decode_wkb(encode_wkb_polygon(ring)) == (3, ring)

    # big-endian point: byte order 0, same payload
    be = struct.pack(">BIdd", 0, 1, 1.5, 2.5)
    assert decode_wkb(be) == (1, [(1.5, 2.5)])

    with pytest.raises(ValueError):
        decode_wkb(b"\x01\x07\x00\x00\x00")  # unsupported type / short
    with pytest.raises(ValueError):
        decode_wkb(struct.pack("<BI", 1, 9))  # unsupported geometry

    # DataFrame kernels: passthrough columns survive, values roundtrip
    pts = spark.createDataFrame(
        [(1, 10.5, -4.0), (2, -0.25, 8.0)], "id long, px double, py double"
    )
    back = {
        r.id: (r.x, r.y)
        for r in wkb_to_points(
            points_to_wkb(pts, "px", "py").drop("px", "py"), "wkb"
        ).collect()
    }
    assert back == {1: (10.5, -4.0), 2: (-0.25, 8.0)}

    from pyspark.sql import functions as F

    polys = spark.createDataFrame([(7,)], "doc long").select(
        "doc",
        F.expr(
            "array(struct(0.0D as x, 0.0D as y), struct(2.0D as x, 0.0D as y),"
            " struct(1.0D as x, 1.0D as y), struct(0.0D as x, 0.0D as y))"
        ).alias("ring"),
    )
    out = wkb_to_polygons(
        polygons_to_wkb(polys, "ring").drop("ring"), "wkb"
    ).collect()
    assert [(v.x, v.y) for v in out[0].ring] == [
        (0.0, 0.0), (2.0, 0.0), (1.0, 1.0), (0.0, 0.0),
    ]


def should_decode_full_wkb_surface_and_enforce_error_contract(spark):
    """WKB codec, full surface: LineString, Polygon with interior
    rings, MultiPolygon round trips; the error contract (ValueError on
    bad byte-order byte, truncated buffers, adversarial counts —
    checked BEFORE allocation); and the ragged mapInArrow kernels."""
    import struct
    import time

    import pytest

    from geospatial_data_lake_spark.sources.wkb_source import (
        decode_wkb,
        decode_wkb_rings,
        encode_wkb_linestring,
        encode_wkb_multipolygon,
        encode_wkb_polygon_rings,
        multipolygons_to_wkb,
        wkb_to_linestrings,
        wkb_to_rings,
    )

    # LineString round trip (pure codec + kernel)
    path = [(0.0, 0.0), (3.0, 4.0), (3.0, 9.5)]
    assert decode_wkb_rings(encode_wkb_linestring(path)) == (2, [path])
    assert decode_wkb(encode_wkb_linestring(path)) == (2, path)

    # Polygon with an interior hole: ALL rings survive
    shell = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    hole = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]
    gtype, rings = decode_wkb_rings(encode_wkb_polygon_rings([shell, hole]))
    assert (gtype, rings) == (3, [shell, hole])
    # compat decoder still yields the outer ring only
    assert decode_wkb(encode_wkb_polygon_rings([shell, hole])) == (3, shell)

    # MultiPolygon: parts flatten outer-before-holes, ragged part sizes
    part2 = [(20.0, 0.0), (22.0, 0.0), (21.0, 2.0), (20.0, 0.0)]
    mp = encode_wkb_multipolygon([[shell, hole], [part2]])
    assert decode_wkb_rings(mp) == (6, [shell, hole, part2])

    # --- error contract: always ValueError, never struct.error ---
    with pytest.raises(ValueError, match="byte-order"):
        decode_wkb_rings(b"\x02" + b"\x00" * 20)  # byte order must be 0/1
    with pytest.raises(ValueError, match="truncated"):
        decode_wkb_rings(struct.pack("<BIdd", 1, 1, 0.0, 0.0)[:-3])
    # polygon header claiming more points than the buffer holds
    with pytest.raises(ValueError, match="truncated"):
        decode_wkb_rings(struct.pack("<BIII", 1, 3, 1, 99) + b"\x00" * 64)
    # adversarial count (2^31 points) must fail fast, without building
    # a gigabyte format string or allocating
    start = time.perf_counter()
    with pytest.raises(ValueError, match="truncated"):
        decode_wkb_rings(struct.pack("<BIII", 1, 3, 1, 2**31) + b"\x00" * 64)
    assert time.perf_counter() - start < 0.1
    with pytest.raises(ValueError):
        decode_wkb_rings(struct.pack("<BII", 1, 6, 0))  # empty multipolygon
    # multipolygon whose nested part is not a polygon
    bad_part = struct.pack("<BII", 1, 6, 1) + encode_wkb_linestring(path)
    with pytest.raises(ValueError, match="expected 3"):
        decode_wkb_rings(bad_part)

    # --- DataFrame kernels over ragged nesting ---
    from pyspark.sql import functions as F

    def rect(cx, cy, hx, hy):
        return (
            f"array(struct({cx - hx}D as x, {cy - hy}D as y),"
            f" struct({cx + hx}D as x, {cy - hy}D as y),"
            f" struct({cx + hx}D as x, {cy + hy}D as y),"
            f" struct({cx - hx}D as x, {cy + hy}D as y),"
            f" struct({cx - hx}D as x, {cy - hy}D as y))"
        )

    src = spark.createDataFrame([(1,), (2,)], "doc long").select(
        "doc",
        F.expr(
            # doc-invariant: part1 = shell+hole, part2 = solid (ragged)
            f"array(array({rect(0, 0, 5, 5)}, {rect(0, 0, 2, 2)}),"
            f" array({rect(20, 0, 1, 1)}))"
        ).alias("parts"),
    )
    out = wkb_to_rings(multipolygons_to_wkb(src, "parts"), "wkb").collect()
    assert len(out) == 2
    for row in out:
        assert len(row.rings) == 3  # shell, hole, part2 — flattened
        assert [len(r) for r in row.rings] == [5, 5, 5]
        assert (row.rings[1][0].x, row.rings[1][0].y) == (-2.0, -2.0)
        assert (row.rings[2][0].x, row.rings[2][0].y) == (19.0, -1.0)

    # LineString kernel: decode + type guard
    bin_df = spark.createDataFrame(
        [(9, bytearray(encode_wkb_linestring([(0.0, 0.0), (1.0, 2.0)])))],
        "id long, wkb binary",
    )
    got = wkb_to_linestrings(bin_df, "wkb").collect()[0]
    assert [(v.x, v.y) for v in got.path] == [(0.0, 0.0), (1.0, 2.0)]
    with pytest.raises(Exception, match="expected WKB LineString"):
        wkb_to_linestrings(
            spark.createDataFrame(
                [(1, bytearray(struct.pack("<BIdd", 1, 1, 0.0, 0.0)))],
                "id long, wkb binary",
            ),
            "wkb",
        ).collect()


def should_write_and_read_geoparquet_with_footer_bboxes(spark, sf_dir, tmp_path):
    """GeoParquet file contract: the writer stamps each file's footer
    with the spec 'geo' document (WKB encoding, geometry types, and a
    PER-FILE bbox); the reader validates and parses it; footer-bbox
    file pruning keeps exactly the intersecting files; plain parquet
    is rejected as not-GeoParquet."""
    import json
    import os

    import pyarrow.parquet as pq
    import pytest
    from pyspark.sql import functions as F

    from geospatial_data_lake_spark.sources.geoparquet import (
        GEO_KEY,
        file_bbox_filter,
        read_geoparquet,
        read_geoparquet_meta,
        write_geoparquet,
    )
    from geospatial_data_lake_spark.sources.wkb_source import (
        points_to_wkb,
        wkb_to_points,
    )

    pts = spark.createDataFrame(
        [(i, float(i), float(i % 7)) for i in range(100)],
        "id long, px double, py double",
    )
    wkb = points_to_wkb(pts, "px", "py").drop("px", "py")
    path = str(tmp_path / "gp")
    n = write_geoparquet(
        wkb.repartitionByRange(4, "id"), path, {"wkb": ["Point"]}
    )
    assert n == 4

    meta = read_geoparquet_meta(path)
    assert meta.version == "1.0.0"
    assert meta.primary_column == "wkb"
    assert meta.columns["wkb"]["encoding"] == "WKB"
    assert meta.columns["wkb"]["geometry_types"] == ["Point"]

    # per-file bboxes are this file's true extent
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        fp = os.path.join(path, f)
        doc = json.loads(pq.read_schema(fp).metadata[GEO_KEY].decode())
        bbox = doc["columns"]["wkb"]["bbox"]
        ids = pq.read_table(fp).column("id").to_pylist()
        assert bbox[0] == float(min(ids)) and bbox[2] == float(max(ids))

    # footer pruning: a window over ids 10..30 keeps a strict subset
    pruned = file_bbox_filter(path, "wkb", 10.0, -1.0, 30.0, 10.0)
    assert 0 < len(pruned) < 4
    got = {
        r.id
        for r in wkb_to_points(spark.read.parquet(*pruned), "wkb")
        .filter(F.col("x").between(10.0, 30.0))
        .collect()
    }
    assert got == set(range(10, 31))

    # full read: values round trip through the dataset
    df, meta2 = read_geoparquet(spark, path)
    back = wkb_to_points(df, "wkb")
    assert back.count() == 100
    assert meta2 == meta

    # plain parquet is not GeoParquet
    plain = str(tmp_path / "plain")
    pts.write.parquet(plain)
    with pytest.raises(ValueError, match="not GeoParquet"):
        read_geoparquet_meta(plain)
    # unknown geometry column on write
    with pytest.raises(ValueError, match="not in DataFrame"):
        write_geoparquet(wkb, str(tmp_path / "x"), {"nope": ["Point"]})


def should_stamp_partitioned_geoparquet_writes_recursively(spark, tmp_path):
    """partitionBy writes put files in subdirectories; the stamping
    pass, the metadata reader, and the bbox pruner must all walk
    recursively (a flat listing would stamp nothing and prune
    nothing)."""
    from pyspark.sql import functions as F

    from geospatial_data_lake_spark.sources.geoparquet import (
        file_bbox_filter,
        read_geoparquet_meta,
        write_geoparquet,
    )
    from geospatial_data_lake_spark.sources.wkb_source import (
        points_to_wkb,
        wkb_to_points,
    )

    pts = spark.createDataFrame(
        [
            (i, "east" if i >= 20 else "west", float(i), float(i % 5))
            for i in range(40)
        ],
        "id long, region string, px double, py double",
    )
    wkb = points_to_wkb(pts, "px", "py").drop("px", "py")
    path = str(tmp_path / "gp_part")
    n = write_geoparquet(
        wkb, path, {"wkb": ["Point"]}, partition_by=["region"]
    )
    assert n >= 2  # at least one file per partition directory, stamped
    meta = read_geoparquet_meta(path)  # reads a nested footer
    assert meta.columns["wkb"]["encoding"] == "WKB"
    # bbox pruning across subdirectories: the east window keeps only
    # east files
    pruned = file_bbox_filter(path, "wkb", 25.0, -1.0, 100.0, 10.0)
    assert pruned and all("region=east" in f for f in pruned)
    got = {
        r.id
        for r in wkb_to_points(spark.read.parquet(*pruned), "wkb")
        .filter(F.col("x") >= 25.0)
        .collect()
    }
    assert got == set(range(25, 40))


def should_prune_files_inside_read_geoparquet_with_bbox(spark, tmp_path):
    """read_geoparquet(bbox=...) plans the spatially pruned scan itself:
    partition columns survive (basePath), an all-outside window returns
    a schema-stable empty scan, and the pruned read composes with the
    exact window filter."""
    from pyspark.sql import functions as F

    from geospatial_data_lake_spark.sources.geoparquet import (
        read_geoparquet,
        write_geoparquet,
    )
    from geospatial_data_lake_spark.sources.wkb_source import (
        points_to_wkb,
        wkb_to_points,
    )

    pts = spark.createDataFrame(
        [
            (i, "east" if i >= 20 else "west", float(i), float(i % 5))
            for i in range(40)
        ],
        "id long, region string, px double, py double",
    )
    wkb = points_to_wkb(pts, "px", "py").drop("px", "py")
    path = str(tmp_path / "gp")
    write_geoparquet(wkb, path, {"wkb": ["Point"]}, partition_by=["region"])

    df, meta = read_geoparquet(spark, path, bbox=(25.0, -1.0, 100.0, 10.0))
    assert "region" in df.columns  # basePath keeps partition columns
    rows = wkb_to_points(df, "wkb").filter(F.col("x") >= 25.0).collect()
    assert {r.id for r in rows} == set(range(25, 40))
    assert all(r.region == "east" for r in rows)

    empty, _ = read_geoparquet(spark, path, bbox=(500.0, 500.0, 600.0, 600.0))
    assert empty.count() == 0
    assert set(empty.columns) == set(df.columns)


def should_stamp_footer_bboxes_via_vectorized_batch_kernel(spark, tmp_path):
    """The footer-stamp bbox pass must run the VECTORIZED Arrow batch
    kernel (zero-copy buffer slices + np.frombuffer), not a per-vertex
    Python loop: (a) arrow_column_bbox agrees with a decode_wkb_rings
    reference across every geometry type, nulls, holes, and both byte
    orders; (b) write_geoparquet's stamp closure references the batch
    kernel and no longer the per-row decoder; (c) the stamped footer
    bboxes are unchanged."""
    import inspect
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from geospatial_data_lake_spark.sources import geoparquet as gp
    from geospatial_data_lake_spark.sources.wkb_source import (
        arrow_column_bbox,
        decode_wkb_rings,
        encode_wkb_linestring,
        encode_wkb_multipolygon,
        encode_wkb_point,
        encode_wkb_polygon_rings,
        wkb_bbox,
    )

    blobs = [
        encode_wkb_point(3.5, -2.0),
        encode_wkb_linestring([(0.0, 0.0), (9.0, 4.0), (-1.5, 2.0)]),
        # polygon WITH an interior hole: the hole's vertices count
        encode_wkb_polygon_rings(
            [
                [(0.0, 0.0), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0), (0.0, 0.0)],
                [(2.0, 2.0), (3.0, 2.0), (3.0, 9.5), (2.0, 2.0)],
            ]
        ),
        encode_wkb_multipolygon(
            [
                [[(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 10.0)]],
                [[(-6.0, -6.0), (-5.0, -6.0), (-5.0, -5.0), (-6.0, -6.0)]],
            ]
        ),
        None,
    ]

    def ref_bbox(bufs):
        xs, ys = [], []
        for b in bufs:
            if b is None:
                continue
            _gt, rings = decode_wkb_rings(b)
            for ring in rings:
                for x, y in ring:
                    xs.append(x)
                    ys.append(y)
        return [min(xs), min(ys), max(xs), max(ys)]

    arr = pa.chunked_array(
        [pa.array(blobs[:3], type=pa.binary()), pa.array(blobs[3:])]
    )
    assert arrow_column_bbox(arr) == ref_bbox(blobs)
    for b in blobs[:4]:
        assert list(wkb_bbox(b)) == ref_bbox([b])
    # big-endian blob, sliced array, all-null column
    import struct

    be = struct.pack(">BIdd", 0, 1, 7.0, 8.0)
    assert wkb_bbox(be) == (7.0, 8.0, 7.0, 8.0)
    flat = pa.array([b for b in blobs if b is not None])
    assert arrow_column_bbox(flat.slice(2, 2)) == ref_bbox(blobs[2:4])
    assert arrow_column_bbox(pa.array([None], type=pa.binary())) is None

    # the stamp path itself: uses the batch kernel, not the row decoder
    src = inspect.getsource(gp.write_geoparquet)
    assert "arrow_column_bbox" in src
    assert "decode_wkb_rings" not in src
    assert "to_pylist" not in src

    # e2e: footers carry exactly the reference bboxes
    from geospatial_data_lake_spark.sources.wkb_source import points_to_wkb

    pts = spark.createDataFrame(
        [(i, float(i), float(i % 7)) for i in range(50)],
        "id long, px double, py double",
    )
    wkb = points_to_wkb(pts, "px", "py").drop("px", "py")
    path = str(tmp_path / "gp_vec")
    gp.write_geoparquet(wkb.coalesce(1), path, {"wkb": ["Point"]})
    (fp,) = gp._parquet_files(path)
    doc = json.loads(pq.read_schema(fp).metadata[gp.GEO_KEY].decode())
    assert doc["columns"]["wkb"]["bbox"] == [0.0, 0.0, 49.0, 6.0]


def should_reject_heterogeneous_geoparquet_footers(spark, tmp_path):
    """Cross-file footer consistency: a dataset whose files disagree on
    the geo contract (drifted geometry declaration from a different
    writer, or a file missing the stamp entirely) raises on read
    instead of being silently read under the first footer's contract;
    per-file bbox differences are NOT drift; validate_all=False opts
    out."""
    import json
    import shutil

    import pyarrow.parquet as pq
    import pytest

    from geospatial_data_lake_spark.sources.geoparquet import (
        GEO_KEY,
        _parquet_files,
        read_geoparquet_meta,
        write_geoparquet,
    )
    from geospatial_data_lake_spark.sources.wkb_source import points_to_wkb

    pts = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(40)],
        "id long, px double, py double",
    )
    wkb = points_to_wkb(pts, "px", "py").drop("px", "py")
    path = str(tmp_path / "gp_mixed")
    write_geoparquet(wkb.repartitionByRange(3, "id"), path, {"wkb": ["Point"]})
    files = _parquet_files(path)
    assert len(files) == 3
    read_geoparquet_meta(path)  # consistent: fine (bboxes differ per file)

    # drift one file's contract (a different writer's declaration)
    victim = files[-1]
    table = pq.read_table(victim)
    meta = dict(table.schema.metadata)
    doc = json.loads(meta[GEO_KEY].decode())
    doc["columns"]["wkb"]["geometry_types"] = ["LineString"]
    meta[GEO_KEY] = json.dumps(doc).encode()
    backup = victim + ".bak"
    shutil.copy(victim, backup)
    pq.write_table(table.replace_schema_metadata(meta), victim)
    with pytest.raises(ValueError, match="heterogeneous"):
        read_geoparquet_meta(path)
    assert read_geoparquet_meta(path, validate_all=False) is not None

    # a file missing the stamp entirely is also heterogeneous
    meta.pop(GEO_KEY)
    pq.write_table(table.replace_schema_metadata(meta), victim)
    with pytest.raises(ValueError, match="no 'geo' footer"):
        read_geoparquet_meta(path)
    shutil.move(backup, victim)
    read_geoparquet_meta(path)


def should_read_geoparquet_datasets_through_filesystem_uris(spark, tmp_path):
    """Object-store seam: listing and footer reads route through
    pyarrow.fs, so a GeoParquet dataset addressed by URI (file:// here;
    s3://, gs://, hdfs:// by the same interface) lists, validates, and
    bbox-prunes without local-FS assumptions — and the returned file
    refs keep the scheme so Spark's own connectors resolve them.  The
    write path stays a POSIX contract and rejects URIs loudly."""
    import pytest

    from geospatial_data_lake_spark.sources.fsio import (
        is_local,
        list_parquet_files,
        scheme_of,
    )
    from geospatial_data_lake_spark.sources.geoparquet import (
        file_bbox_filter,
        read_geoparquet_meta,
        write_geoparquet,
    )
    from geospatial_data_lake_spark.sources.wkb_source import (
        points_to_wkb,
        wkb_to_points,
    )

    pts = spark.createDataFrame(
        [(i, float(i), float(i % 5)) for i in range(40)],
        "id long, px double, py double",
    )
    wkb = points_to_wkb(pts, "px", "py").drop("px", "py")
    path = str(tmp_path / "gp_uri")
    write_geoparquet(wkb.repartitionByRange(4, "id"), path, {"wkb": ["Point"]})

    uri = "file://" + path
    assert scheme_of(uri) == "file://" and is_local(uri)
    files = list_parquet_files(uri)
    assert len(files) == 4 and all(f.startswith("file:///") for f in files)

    meta = read_geoparquet_meta(uri)  # footer reads through pyarrow.fs
    assert meta.primary_column == "wkb"
    pruned = file_bbox_filter(uri, "wkb", 10.0, -1.0, 30.0, 10.0)
    assert 0 < len(pruned) < 4 and all(f.startswith("file://") for f in pruned)
    got = {
        r.id
        for r in wkb_to_points(spark.read.parquet(*pruned), "wkb")
        .filter(F.col("x").between(10.0, 30.0))
        .collect()
    }
    assert got == set(range(10, 31))

    # URI-rooted WRITE: the stamp is a stage-write + swap through the
    # fsio seam, so a file:// destination stamps identically (and no
    # .stamp.tmp staging residue survives the swap)
    wuri = "file://" + str(tmp_path / "gp_uri_w")
    n = write_geoparquet(wkb.repartitionByRange(3, "id"), wuri, {"wkb": ["Point"]})
    assert n == 3
    meta_w = read_geoparquet_meta(wuri)
    assert meta_w.primary_column == "wkb"
    assert all(
        "bbox" in c for c in meta_w.columns.values()
    )
    import os as _os

    residue = [
        f
        for _d, _s, fs in _os.walk(str(tmp_path / "gp_uri_w"))
        for f in fs
        if f.endswith(".stamp.tmp")
    ]
    assert residue == []
    got_all = {
        r.id
        for r in wkb_to_points(spark.read.parquet(wuri), "wkb").collect()
    }
    assert got_all == set(range(40))
