"""Filesystem seam for dataset listing and footer reads.

The GeoParquet reader's metadata operations (recursive file listing,
parquet footer/schema reads) were FS-API-bound (``os.walk`` + local
paths) — the documented known-limit blocking object-store datasets.
This module routes them through ``pyarrow.fs`` instead, which resolves
``s3://`` / ``gs://`` / ``hdfs://`` / ``file://`` URIs and plain local
paths behind one interface, so a reader pointed at an object-store
GeoParquet dataset lists and validates footers without any local-FS
assumption.  Returned file references preserve the caller's scheme, so
they feed straight into ``spark.read.parquet(*files)`` (Spark resolves
the same URIs through its own connectors).

WRITE paths are deliberately not routed here: the GeoParquet footer
stamp rewrites files in place and stays a shared-POSIX-filesystem
contract (see ``write_geoparquet``), enforced by an early scheme guard
plus post-stamp verification.
"""

from __future__ import annotations

import re

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")


def scheme_of(path: str) -> str:
    """The ``scheme://`` prefix of a URI, or '' for a plain path."""
    m = _SCHEME_RE.match(path)
    return m.group(0) if m else ""


def is_local(path: str) -> bool:
    sch = scheme_of(path)
    return sch in ("", "file://")


def resolve_fs(path: str):
    """(pyarrow FileSystem, fs-internal path) for a URI or local path."""
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(path)


def list_parquet_files(path: str) -> list[str]:
    """Every ``*.parquet`` data file under ``path``, recursively, in
    the caller's scheme (URIs stay URIs, local paths stay paths) —
    partitioned writes put files in subdirectories, so a flat listing
    would silently skip them."""
    from pyarrow import fs as pafs

    fs, p = resolve_fs(path)
    sch = scheme_of(path)
    infos = fs.get_file_info(
        pafs.FileSelector(p, recursive=True, allow_not_found=True)
    )
    return sorted(
        sch + i.path
        for i in infos
        if i.type == pafs.FileType.File and i.path.endswith(".parquet")
    )


def read_parquet_schema(path: str):
    """One parquet FOOTER read (schema + key-value metadata, no data
    IO) through the resolved filesystem — works on object-store URIs."""
    import pyarrow.parquet as pq

    fs, p = resolve_fs(path)
    return pq.read_schema(p, filesystem=fs)


__all__ = [
    "scheme_of",
    "is_local",
    "resolve_fs",
    "list_parquet_files",
    "read_parquet_schema",
]
