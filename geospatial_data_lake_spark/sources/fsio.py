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

It also hosts the MANIFEST/COMMIT-LOG seam for ``ManifestTable``: every
metadata operation the commit protocol needs (atomic-create CAS via
``put_if_absent``, listing, blob read/write, recursive delete, the GC
walks) behind functions that accept plain paths, ``file://`` URIs, and
object-store URIs.  Local paths and ``file://`` keep today's exact
``os.*`` semantics — in particular ``put_if_absent`` is
``O_CREAT|O_EXCL``, a true atomic compare-and-set, which is what makes
the commit protocol serializable on a shared filesystem (the DynamoDB
conditional-put analog: reference ``backend/datasets/create.py:37-39``
uses ``attribute_not_exists`` the same way).  Non-local URIs route
through ``pyarrow.fs``; there ``put_if_absent`` prefers a PLUGGABLE
true conditional-put backend (``register_conditional_put`` — S3
``If-None-Match: *`` / GCS ``ifGenerationMatch=0`` / ADLS ETag
mappings documented on the registration hook) and only falls back to
an existence-check + write + read-back-verify EMULATION when no
backend is registered for the scheme: pyarrow exposes no conditional
write, so the fallback DETECTS a lost race via the writer-unique
payload nonce instead of preventing it.
"""

from __future__ import annotations

import os
import re
import shutil

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")


def scheme_of(path: str) -> str:
    """The ``scheme://`` prefix of a URI, or '' for a plain path."""
    m = _SCHEME_RE.match(path)
    return m.group(0) if m else ""


def is_local(path: str) -> bool:
    sch = scheme_of(path)
    return sch in ("", "file://")


# Custom filesystem registration: {scheme (no '://') -> factory(uri) ->
# (pyarrow FileSystem, fs-internal path)}.  Production uses this to slot
# in a store pyarrow.from_uri cannot mint (a conditional-put-capable S3
# wrapper, an on-prem object store); tests use it to drive the entire
# non-local branch of this module against an in-memory object store
# with real flat-keyspace semantics.
_FS_FACTORIES: dict = {}


def register_fs(scheme: str, factory) -> None:
    """Route ``scheme://`` URIs through ``factory(uri) -> (fs, path)``
    instead of ``pyarrow.fs.FileSystem.from_uri``.  Pass ``None`` to
    unregister."""
    if factory is None:
        _FS_FACTORIES.pop(scheme, None)
    else:
        _FS_FACTORIES[scheme] = factory


# Conditional-put backends: {scheme -> backend(uri, payload: bytes)}.
# The seam where a TRUE server-side create-if-absent slots in, replacing
# the check-then-write emulation for that scheme (see put_if_absent).
_CONDITIONAL_PUTS: dict = {}


def register_conditional_put(scheme: str, backend) -> None:
    """Back ``put_if_absent`` on ``scheme://`` URIs with a TRUE
    server-side conditional create.  ``backend(uri, payload: bytes)``
    must create the object iff nothing is at ``uri`` and raise
    ``FileExistsError`` when the store rejects the precondition — that
    makes the commit protocol serializable on that store, which the
    check-then-write emulation can NOT guarantee.  Production mappings
    (each a ~5-line client wrapper; none installable in this
    environment, so they are documented rather than shipped):

    - **S3**: ``put_object(Bucket=..., Key=..., Body=payload,
      IfNoneMatch="*")`` — atomic server-side since 2024-08; map the
      412 ``PreconditionFailed`` ClientError to ``FileExistsError``.
    - **GCS**: ``blob.upload_from_string(payload,
      if_generation_match=0)``; map
      ``google.api_core.exceptions.PreconditionFailed`` (412).
    - **ADLS**: ``DataLakeFileClient.upload_data(payload,
      overwrite=False)`` (an ``If-None-Match: *`` ETag condition); map
      ``ResourceExistsError``.

    Reference analog: DynamoDB ``attribute_not_exists`` conditional put
    (``backend/datasets/create.py:37-39``).  Pass ``None`` to
    unregister."""
    if backend is None:
        _CONDITIONAL_PUTS.pop(scheme, None)
    else:
        _CONDITIONAL_PUTS[scheme] = backend


def resolve_fs(path: str):
    """(pyarrow FileSystem, fs-internal path) for a URI or local path."""
    from pyarrow import fs as pafs

    sch = scheme_of(path)
    if sch and sch[:-3] in _FS_FACTORIES:
        return _FS_FACTORIES[sch[:-3]](path)
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


# -- manifest/commit-log seam ------------------------------------------------
#
# Path convention: callers keep building paths with os.path.join — URI
# schemes survive string joins ("file:///t" + "commits" ->
# "file:///t/commits"), so one code path serves both.  Every function
# below dispatches on the scheme: local/''/file:// -> os.*, else
# pyarrow.fs.


def local_path(path: str) -> str | None:
    """The local-filesystem path for '' / ``file://`` URIs, else None."""
    sch = scheme_of(path)
    if sch == "":
        return path
    if sch == "file://":
        return path[len("file://"):] or "/"
    return None


def _pafs(path: str):
    from pyarrow import fs as pafs

    fs, p = resolve_fs(path)
    return pafs, fs, p


def listdir(path: str) -> list[str]:
    """Immediate child names of ``path`` (files and directories) —
    ``os.listdir`` semantics: raises FileNotFoundError when missing."""
    lp = local_path(path)
    if lp is not None:
        return os.listdir(lp)
    pafs, fs, p = _pafs(path)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.NotFound:
        raise FileNotFoundError(path)
    return [
        i.base_name
        for i in fs.get_file_info(pafs.FileSelector(p, recursive=False))
    ]


def mkdirs(path: str) -> None:
    lp = local_path(path)
    if lp is not None:
        os.makedirs(lp, exist_ok=True)
        return
    _, fs, p = _pafs(path)
    fs.create_dir(p, recursive=True)


def mkdir_exclusive(path: str) -> None:
    """Create ``path`` as a CAS: exactly one racer wins, losers get
    FileExistsError.  Local: ``os.makedirs(exist_ok=False)``.  Object
    stores have no exclusive directory create, so the race rides an
    exclusive ``.created`` marker object inside the prefix."""
    lp = local_path(path)
    if lp is not None:
        os.makedirs(lp, exist_ok=False)
        return
    _, fs, p = _pafs(path)
    fs.create_dir(p, recursive=True)
    put_if_absent(path.rstrip("/") + "/.created", b"")


def read_text(path: str) -> str:
    """Blob contents as text; FileNotFoundError when missing."""
    lp = local_path(path)
    if lp is not None:
        with open(lp) as fh:
            return fh.read()
    pafs, fs, p = _pafs(path)
    if fs.get_file_info(p).type == pafs.FileType.NotFound:
        raise FileNotFoundError(path)
    with fs.open_input_stream(p) as fh:
        return fh.read().decode("utf-8")


def write_text(path: str, data: str) -> None:
    """Unconditional blob write (no CAS — use for content-addressed
    names that cannot race, e.g. uuid-suffixed manifest documents)."""
    lp = local_path(path)
    if lp is not None:
        with open(lp, "w") as fh:
            fh.write(data)
        return
    _, fs, p = _pafs(path)
    with fs.open_output_stream(p) as fh:
        fh.write(data.encode("utf-8"))


def put_if_absent(path: str, data: bytes | str) -> None:
    """Create-exclusive CAS: write ``data`` to ``path`` iff nothing is
    there; raise FileExistsError when something is.  THE commit-protocol
    primitive — a commit pointer published through this is serializable
    because exactly one racer's create succeeds.

    Three backends, strongest available wins:

    1. local/``file://`` — a true ``O_CREAT|O_EXCL``;
    2. a scheme with a registered conditional-put backend
       (``register_conditional_put``) — a true server-side CAS;
    3. anything else — the check-then-write EMULATION, hardened with a
       post-write read-back: if the bytes on the store are not ours,
       another racer's write interleaved and we LOST — raise instead of
       silently double-committing.  The commit protocol makes payloads
       writer-unique (manifest names embed a uuid4 — the writer nonce
       the read-back compares), so an interleaved pair is detected
       whenever the loser's read-back runs after the winner's write.
       Detection is not prevention: an adversarial schedule where both
       read-backs land before the other's write still double-commits —
       that residue is exactly what backend (2) exists to close, and
       why production object stores MUST register one (mappings in
       ``register_conditional_put``)."""
    payload = data.encode("utf-8") if isinstance(data, str) else data
    lp = local_path(path)
    if lp is not None:
        fd = os.open(lp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "wb") as fh:
            fh.write(payload)
        return
    backend = _CONDITIONAL_PUTS.get(scheme_of(path).rstrip(":/"))
    if backend is not None:
        backend(path, payload)
        return
    pafs, fs, p = _pafs(path)
    if fs.get_file_info(p).type != pafs.FileType.NotFound:
        raise FileExistsError(path)
    with fs.open_output_stream(p) as fh:
        fh.write(payload)
    with fs.open_input_stream(p) as fh:
        if fh.read() != payload:
            raise FileExistsError(path)


def unlink(path: str, missing_ok: bool = False) -> None:
    lp = local_path(path)
    if lp is not None:
        try:
            os.unlink(lp)
        except FileNotFoundError:
            if not missing_ok:
                raise
        return
    pafs, fs, p = _pafs(path)
    try:
        fs.delete_file(p)
    except (FileNotFoundError, OSError):
        if not missing_ok:
            raise


def rmtree(path: str, ignore_errors: bool = False) -> None:
    lp = local_path(path)
    if lp is not None:
        shutil.rmtree(lp, ignore_errors=ignore_errors)
        return
    _, fs, p = _pafs(path)
    try:
        fs.delete_dir(p)
    except (FileNotFoundError, OSError):
        if not ignore_errors:
            raise


def mtime(path: str) -> float:
    """Modification time as a POSIX timestamp; OSError when missing
    (``os.stat`` contract)."""
    lp = local_path(path)
    if lp is not None:
        return os.stat(lp).st_mtime
    pafs, fs, p = _pafs(path)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.NotFound:
        raise FileNotFoundError(path)
    return info.mtime.timestamp() if info.mtime is not None else 0.0


def walk_files(root: str) -> list[tuple[str, float]]:
    """Every FILE under ``root`` recursively as (full path in the
    caller's scheme, mtime) — the vacuum/GC walk.  Missing root -> []."""
    lp = local_path(root)
    if lp is not None:
        sch = scheme_of(root)
        out = []
        for dirpath, _dirs, files in os.walk(lp):
            for fname in files:
                full = os.path.join(dirpath, fname)
                try:
                    out.append((sch + full if sch else full, os.stat(full).st_mtime))
                except OSError:
                    continue
        return out
    pafs, fs, p = _pafs(root)
    sch = scheme_of(root)
    infos = fs.get_file_info(
        pafs.FileSelector(p, recursive=True, allow_not_found=True)
    )
    return [
        (
            sch + i.path,
            i.mtime.timestamp() if i.mtime is not None else 0.0,
        )
        for i in infos
        if i.type == pafs.FileType.File
    ]


def sweep_empty_dirs(root: str) -> None:
    """Bottom-up removal of empty directories under ``root`` (root
    itself stays).  Object stores have no empty directories, so the
    non-local branch is a no-op."""
    lp = local_path(root)
    if lp is None:
        return
    for dirpath, dirnames, filenames in os.walk(lp, topdown=False):
        if dirpath != lp and not dirnames and not filenames:
            try:
                os.rmdir(dirpath)
            except OSError:
                pass


__all__ = [
    "scheme_of",
    "is_local",
    "register_fs",
    "register_conditional_put",
    "resolve_fs",
    "list_parquet_files",
    "read_parquet_schema",
    "local_path",
    "listdir",
    "mkdirs",
    "mkdir_exclusive",
    "read_text",
    "write_text",
    "put_if_absent",
    "unlink",
    "rmtree",
    "mtime",
    "walk_files",
    "sweep_empty_dirs",
]
