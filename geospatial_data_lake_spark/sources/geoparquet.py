"""GeoParquet reader/writer — the named interchange format end-to-end.

BASELINE.json's north star names Parquet/GeoParquet as the spatial
interchange surface.  The WKB codec (wkb_source.py) covers the COLUMN
contract; this module covers the FILE contract: the GeoParquet
specification (opengeospatial/geoparquet, v1.0.0) stores a JSON
document under the ``geo`` key of the parquet FILE metadata declaring
the geometry columns, their encoding (WKB), their geometry types, and
the file's bbox — that metadata is what makes a parquet file a
GeoParquet file to GDAL/QGIS/GeoPandas.

Writer shape (``write_geoparquet``): Spark writes the parquet files
(any partitioning, any size — the normal distributed write), then ONE
distributed pass stamps each file's footer with its own ``geo``
document (per-file bbox computed from that file's rows — the
per-file bbox is what lets a GeoParquet reader prune files spatially,
the manifest-stats analog).  The stamping job is a parallelized
per-file pyarrow STAGE-WRITE + SWAP through the fsio seam (atomic
rename on local/file:// paths, server-side move on object-store URIs):
O(data) once, executed on the cluster, never through the driver.

Reader shape (``read_geoparquet``): the driver parses ONE footer
(cheap metadata read) to learn the geometry columns, validates the
spec, and returns the ordinary distributed ``spark.read.parquet`` scan
plus the parsed metadata — decode stays lazy via the wkb kernels, so
predicate pushdown on non-geometry columns still reaches the scan
before any geometry work (the geo08-pinned order).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from geospatial_data_lake_spark.sources.fsio import (
    list_parquet_files as _parquet_files,
    read_parquet_schema,
)

GEO_KEY = b"geo"
_VERSION = "1.0.0"


@dataclass(frozen=True)
class GeoParquetMeta:
    version: str
    primary_column: str
    columns: dict  # {name: {"encoding": "WKB", "geometry_types": [...], "bbox": [...]}}


def _geo_doc(
    columns: dict[str, list[str]], bboxes: dict[str, list[float]]
) -> dict:
    return {
        "version": _VERSION,
        "primary_column": next(iter(columns)),
        "columns": {
            name: {
                "encoding": "WKB",
                "geometry_types": sorted(types),
                **({"bbox": bboxes[name]} if name in bboxes else {}),
                "crs": None,  # spec: null = OGC:CRS84 (lon/lat)
            }
            for name, types in columns.items()
        },
    }


def write_geoparquet(
    df: DataFrame,
    path: str,
    geometry_columns: dict[str, list[str]],
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> int:
    """Write ``df`` as GeoParquet: a normal distributed parquet write,
    then a distributed per-file footer stamp adding the spec ``geo``
    metadata with a PER-FILE bbox for each geometry column (computed
    from that file's own rows — the spatial file-pruning stats).

    ``geometry_columns`` maps column name -> declared geometry types
    (e.g. ``{"geometry": ["Point"]}``); the columns must hold WKB
    binary (see wkb_source encoders).  Returns the number of stamped
    files.

    DEPLOYMENT CONTRACT: the stamp stage is a per-file STAGE-WRITE +
    SWAP through the fsio seam — each stamped file is written to a
    sibling ``.stamp.tmp`` name and swapped in (``os.replace`` on
    local/file:// paths: atomic, readers never see a torn file; a
    server-side move on object-store URIs, where the final object
    appears all-or-nothing).  ``path`` must resolve to the SAME store
    for every executor and the driver (local/NFS path, file:// URI, or
    an object-store URI with the cluster's pyarrow.fs credentials).
    The post-stamp verification below makes a violated contract LOUD:
    every listed file is re-checked for the ``geo`` footer key and a
    missing stamp raises rather than leaving a silently unprunable
    (but readable) dataset."""
    for col in geometry_columns:
        if col not in df.columns:
            raise ValueError(f"geometry column {col!r} not in DataFrame")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    spark = df.sparkSession
    files = _parquet_files(path)
    geom_cols = dict(geometry_columns)

    def stamp(file_path: str) -> int:
        # executor-side: compute this file's bbox per geometry column
        # with the VECTORIZED batch kernel (zero-copy Arrow buffer
        # slices + np.frombuffer vertex reads — never a Python tuple
        # per vertex), then stage-write the stamped copy and swap it in
        import pyarrow.parquet as pq

        from geospatial_data_lake_spark.sources import fsio
        from geospatial_data_lake_spark.sources.wkb_source import (
            arrow_column_bbox,
        )

        fs, p = fsio.resolve_fs(file_path)
        table = pq.read_table(p, filesystem=fs)
        bboxes: dict[str, list[float]] = {}
        for name in geom_cols:
            bbox = arrow_column_bbox(table.column(name))
            if bbox is not None:
                bboxes[name] = bbox
        doc = _geo_doc(geom_cols, bboxes)
        meta = dict(table.schema.metadata or {})
        meta[GEO_KEY] = json.dumps(doc).encode()
        stamped = table.replace_schema_metadata(meta)
        lp = fsio.local_path(file_path)
        if lp is not None:
            # stage + atomic rename: a crash mid-stamp leaves the
            # original file intact, never a torn parquet
            tmp = lp + ".stamp.tmp"
            pq.write_table(stamped, tmp)
            os.replace(tmp, lp)
            # the swap invalidates the Spark write's Hadoop checksum
            # sidecar; drop it so local-fs readers don't fail the read
            d, base = os.path.split(lp)
            crc = os.path.join(d, f".{base}.crc")
            if os.path.exists(crc):
                os.remove(crc)
        else:
            # object store: stage under a sibling key, server-side
            # move to the final key (single-object operations are
            # all-or-nothing; the driver-side verification pass below
            # backstops a lost move)
            tmp = p + ".stamp.tmp"
            pq.write_table(stamped, tmp, filesystem=fs)
            fs.move(tmp, p)
        return 1

    # one task per file: the stamp runs where the data is, not on the
    # driver; file count is the write's output parallelism
    n = (
        spark.sparkContext.parallelize(files, max(1, len(files)))
        .map(stamp)
        .sum()
    )
    # verify the stamps actually landed where the DRIVER reads them —
    # on a non-shared filesystem the executor-side rewrites hit other
    # copies of the path and the dataset would stay valid parquet but
    # silently unstamped (no spatial pruning, wrong file contract)
    unstamped = [
        fp
        for fp in _parquet_files(path)
        if GEO_KEY not in (read_parquet_schema(fp).metadata or {})
    ]
    if unstamped:
        raise RuntimeError(
            f"GeoParquet stamp lost on {len(unstamped)} file(s) (e.g. "
            f"{unstamped[0]!r}): executors and driver do not resolve "
            f"{path!r} to the same store — write_geoparquet requires "
            f"one store visible to all (see docstring)"
        )
    return int(n)


def _contract_view(doc: dict) -> dict:
    """The per-file-INVARIANT part of a ``geo`` doc: everything except
    the per-file bbox stats.  Files of one dataset must agree on this
    view; bboxes legitimately differ per file (they are the pruning
    stats)."""
    return {
        "version": doc.get("version"),
        "primary_column": doc.get("primary_column"),
        "columns": {
            name: {k: v for k, v in col.items() if k != "bbox"}
            for name, col in doc.get("columns", {}).items()
        },
    }


def read_geoparquet_meta(path: str, validate_all: bool = True) -> GeoParquetMeta:
    """Parse the ``geo`` footer documents of a GeoParquet dataset
    (driver-side metadata reads — no data IO), validate the spec
    surface this engine supports, and — unless ``validate_all=False``
    — verify EVERY file's footer agrees on the dataset contract
    (version, primary column, column set, encodings; per-file bboxes
    are expected to differ).  A dataset assembled by mixed writers
    with drifting geometry declarations raises instead of being read
    under the first file's contract."""
    files = _parquet_files(path)
    if not files:
        raise ValueError(f"no parquet files under {path}")
    schema = read_parquet_schema(files[0])
    meta = schema.metadata or {}
    if GEO_KEY not in meta:
        raise ValueError(
            f"{path} is not GeoParquet: no 'geo' file metadata"
        )
    doc = json.loads(meta[GEO_KEY].decode())
    for field in ("version", "primary_column", "columns"):
        if field not in doc:
            raise ValueError(f"geo metadata missing {field!r}")
    for name, col in doc["columns"].items():
        if col.get("encoding") != "WKB":
            raise ValueError(
                f"unsupported geometry encoding {col.get('encoding')!r} "
                f"for column {name!r} (this engine reads WKB)"
            )
    if validate_all and len(files) > 1:
        contract = _contract_view(doc)
        for fp in files[1:]:
            fmeta = read_parquet_schema(fp).metadata or {}
            if GEO_KEY not in fmeta:
                raise ValueError(
                    f"heterogeneous GeoParquet dataset: {fp!r} carries "
                    f"no 'geo' footer while {files[0]!r} does"
                )
            other = _contract_view(json.loads(fmeta[GEO_KEY].decode()))
            if other != contract:
                raise ValueError(
                    f"heterogeneous GeoParquet dataset: {fp!r} declares "
                    f"{other} but {files[0]!r} declares {contract} — "
                    f"mixed writers; re-stamp the dataset under one "
                    f"contract before reading"
                )
    return GeoParquetMeta(
        version=doc["version"],
        primary_column=doc["primary_column"],
        columns=doc["columns"],
    )


def read_geoparquet(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float] | None = None,
    column: str | None = None,
) -> tuple[DataFrame, GeoParquetMeta]:
    """Open a GeoParquet dataset: validate + parse the ``geo`` footer
    metadata (one driver-side footer read), return the LAZY distributed
    scan plus the metadata.  Geometry stays as WKB binary — decode with
    the wkb_source kernels AFTER pushing down non-geometry predicates,
    the order geo08 pins.

    ``bbox=(x1, y1, x2, y2)`` plans a SPATIALLY FILE-PRUNED scan over
    ``column`` (default: the primary geometry column) using the
    per-file footer bboxes — zero data IO to prune; ``basePath`` is
    preserved so hive partition columns survive the file-list read.
    The bbox prunes FILES only; re-apply the exact window on the
    decoded coordinates for row-exact results."""
    meta = read_geoparquet_meta(path)
    if bbox is None:
        return spark.read.parquet(path), meta
    col = column or meta.primary_column
    files = file_bbox_filter(path, col, *bbox)
    if not files:
        # schema-stable empty scan: plan over the dataset, keep no rows
        df = spark.read.parquet(path).limit(0)
        return df, meta
    return (
        spark.read.option("basePath", path).parquet(*files),
        meta,
    )


def file_bbox_filter(
    path: str, column: str, x1: float, y1: float, x2: float, y2: float
) -> list[str]:
    """Spatial FILE PRUNING from the per-file bbox stamps: the files of
    a GeoParquet dataset whose ``column`` bbox intersects the query
    window (files without a bbox are conservatively kept) — the reader-
    side analog of manifest min/max pruning, O(files) footer reads with
    zero data IO."""
    keep: list[str] = []
    for fp in _parquet_files(path):
        meta = read_parquet_schema(fp).metadata or {}
        if GEO_KEY not in meta:
            keep.append(fp)
            continue
        doc = json.loads(meta[GEO_KEY].decode())
        bbox = doc.get("columns", {}).get(column, {}).get("bbox")
        if not bbox:
            keep.append(fp)
            continue
        bx1, by1, bx2, by2 = bbox
        if bx1 <= x2 and x1 <= bx2 and by1 <= y2 and y1 <= by2:
            keep.append(fp)
    return keep


__all__ = [
    "GeoParquetMeta",
    "write_geoparquet",
    "read_geoparquet",
    "read_geoparquet_meta",
    "file_bbox_filter",
]
