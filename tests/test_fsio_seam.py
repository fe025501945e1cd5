"""fsio manifest/commit-log seam: the CAS + blob primitives the
ManifestTable commit protocol rides, exercised over plain paths and
file:// URIs (the local stand-ins for the documented object-store
mapping — S3 conditional PUT / GCS ifGenerationMatch)."""

from __future__ import annotations

import os

import pytest

from geospatial_data_lake_spark.sources import fsio


@pytest.mark.parametrize("rooting", ["plain", "file_uri"])
def should_put_if_absent_be_exclusive(tmp_path, rooting):
    root = str(tmp_path)
    if rooting == "file_uri":
        root = "file://" + root
    target = root + "/commits/00000001"
    fsio.mkdirs(root + "/commits")
    fsio.put_if_absent(target, "m1.json")
    with pytest.raises(FileExistsError):
        fsio.put_if_absent(target, "m2.json")
    assert fsio.read_text(target) == "m1.json"  # loser wrote nothing


@pytest.mark.parametrize("rooting", ["plain", "file_uri"])
def should_round_trip_blob_and_listing(tmp_path, rooting):
    root = str(tmp_path)
    if rooting == "file_uri":
        root = "file://" + root
    fsio.mkdirs(root + "/d/e")
    fsio.write_text(root + "/d/e/a.txt", "A")
    fsio.write_text(root + "/d/b.txt", "B")
    assert sorted(fsio.listdir(root + "/d")) == ["b.txt", "e"]
    assert fsio.read_text(root + "/d/e/a.txt") == "A"
    with pytest.raises(FileNotFoundError):
        fsio.listdir(root + "/missing")
    with pytest.raises(FileNotFoundError):
        fsio.read_text(root + "/d/missing.txt")
    assert fsio.mtime(root + "/d/b.txt") > 0
    walked = dict(fsio.walk_files(root + "/d"))
    assert set(walked) == {root + "/d/e/a.txt", root + "/d/b.txt"}
    fsio.unlink(root + "/d/e/a.txt")
    with pytest.raises(FileNotFoundError):
        fsio.unlink(root + "/d/e/a.txt")
    fsio.unlink(root + "/d/e/a.txt", missing_ok=True)
    fsio.sweep_empty_dirs(root + "/d")
    assert fsio.listdir(root + "/d") == ["b.txt"]
    fsio.rmtree(root + "/d")
    with pytest.raises(FileNotFoundError):
        fsio.listdir(root + "/d")


@pytest.mark.parametrize("rooting", ["plain", "file_uri"])
def should_mkdir_exclusive_admit_one_winner(tmp_path, rooting):
    root = str(tmp_path)
    if rooting == "file_uri":
        root = "file://" + root
    fsio.mkdir_exclusive(root + "/branches/exp")
    with pytest.raises(FileExistsError):
        fsio.mkdir_exclusive(root + "/branches/exp")


def should_strip_file_scheme():
    assert fsio.local_path("/a/b") == "/a/b"
    assert fsio.local_path("file:///a/b") == "/a/b"
    assert fsio.local_path("s3://bucket/k") is None


# -- the NON-LOCAL branch, driven end-to-end against an in-memory object
# store with real flat-keyspace semantics (registered via register_fs —
# the same hook a production conditional-put S3 wrapper would use) -----


def _mem_store():
    """A pyarrow FileSystemHandler over a flat key space: no real
    directories (prefix-inferred, like S3), per-object mtimes,
    all-or-nothing single-object writes."""
    import io
    import threading
    from datetime import datetime, timezone

    import pyarrow as pa
    from pyarrow.fs import FileInfo, FileSystemHandler, FileType

    class MemStore(FileSystemHandler):
        def __init__(self):
            self.objects: dict[str, tuple[bytes, object]] = {}
            self.dirs: set[str] = set()
            self.lock = threading.Lock()

        def get_type_name(self):
            return "mem"

        def normalize_path(self, p):
            return p

        def _info(self, p):
            p = p.rstrip("/")
            if p in self.objects:
                data, mt = self.objects[p]
                return FileInfo(p, FileType.File, mtime=mt, size=len(data))
            pref = p + "/"
            if p in self.dirs or any(
                k.startswith(pref) for k in list(self.objects) + list(self.dirs)
            ):
                return FileInfo(p, FileType.Directory)
            return FileInfo(p, FileType.NotFound)

        def get_file_info(self, paths):
            return [self._info(p) for p in paths]

        def get_file_info_selector(self, selector):
            base = selector.base_dir.rstrip("/")
            info = self._info(base)
            if info.type == FileType.NotFound:
                if selector.allow_not_found:
                    return []
                raise FileNotFoundError(base)
            pref = base + "/"
            out, seen = [], set()
            for k in sorted(set(self.objects) | self.dirs):
                if not k.startswith(pref):
                    continue
                rest = k[len(pref):]
                if selector.recursive:
                    if k in self.objects:
                        out.append(self._info(k))
                    elif k in self.dirs:
                        out.append(FileInfo(k, FileType.Directory))
                else:
                    child = pref + rest.split("/", 1)[0]
                    if child not in seen:
                        seen.add(child)
                        out.append(self._info(child))
            return out

        def create_dir(self, path, recursive):
            self.dirs.add(path.rstrip("/"))

        def delete_dir(self, path):
            p = path.rstrip("/")
            if self._info(p).type != FileType.Directory:
                raise FileNotFoundError(path)
            pref = p + "/"
            with self.lock:
                for k in [k for k in self.objects if k.startswith(pref)]:
                    del self.objects[k]
                self.dirs = {d for d in self.dirs if d != p and not d.startswith(pref)}

        def delete_dir_contents(self, path, missing_dir_ok=False):
            try:
                self.delete_dir(path)
            except FileNotFoundError:
                if not missing_dir_ok:
                    raise
            self.dirs.add(path.rstrip("/"))

        def delete_root_dir_contents(self):
            self.objects.clear()
            self.dirs.clear()

        def delete_file(self, path):
            with self.lock:
                if path not in self.objects:
                    raise FileNotFoundError(path)
                del self.objects[path]

        def move(self, src, dest):
            with self.lock:
                self.objects[dest] = self.objects.pop(src)

        def copy_file(self, src, dest):
            self.objects[dest] = self.objects[src]

        def open_input_stream(self, path):
            if path not in self.objects:
                raise FileNotFoundError(path)
            return pa.BufferReader(self.objects[path][0])

        def open_input_file(self, path):
            return self.open_input_stream(path)

        def open_output_stream(self, path, metadata):
            store = self

            class _Buf(io.BytesIO):
                def close(self):
                    with store.lock:
                        store.objects[path] = (
                            self.getvalue(),
                            datetime.now(timezone.utc),
                        )
                    super().close()

            return pa.PythonFile(_Buf(), mode="w")

        def open_append_stream(self, path, metadata):
            raise NotImplementedError("object stores do not append")

    return MemStore()


@pytest.fixture()
def mem_root():
    from pyarrow.fs import PyFileSystem

    store = _mem_store()
    fs = PyFileSystem(store)
    fsio.register_fs("mem", lambda uri: (fs, uri[len("mem://"):]))
    yield "mem://bucket"
    fsio.register_fs("mem", None)


def should_put_if_absent_on_object_store(mem_root):
    target = mem_root + "/commits/00000001"
    fsio.mkdirs(mem_root + "/commits")
    fsio.put_if_absent(target, "m1.json")
    with pytest.raises(FileExistsError):
        fsio.put_if_absent(target, "m2.json")
    assert fsio.read_text(target) == "m1.json"


def should_round_trip_blobs_on_object_store(mem_root):
    fsio.mkdirs(mem_root + "/d/e")
    fsio.write_text(mem_root + "/d/e/a.txt", "A")
    fsio.write_text(mem_root + "/d/b.txt", "B")
    assert sorted(fsio.listdir(mem_root + "/d")) == ["b.txt", "e"]
    assert fsio.read_text(mem_root + "/d/e/a.txt") == "A"
    with pytest.raises(FileNotFoundError):
        fsio.listdir(mem_root + "/missing")
    with pytest.raises(FileNotFoundError):
        fsio.read_text(mem_root + "/d/missing.txt")
    assert fsio.mtime(mem_root + "/d/b.txt") > 0
    walked = dict(fsio.walk_files(mem_root + "/d"))
    assert set(walked) == {mem_root + "/d/e/a.txt", mem_root + "/d/b.txt"}
    fsio.unlink(mem_root + "/d/e/a.txt")
    fsio.unlink(mem_root + "/d/e/a.txt", missing_ok=True)
    fsio.sweep_empty_dirs(mem_root + "/d")  # no-op on object stores
    fsio.rmtree(mem_root + "/d")
    with pytest.raises(FileNotFoundError):
        fsio.listdir(mem_root + "/d")


def should_mkdir_exclusive_on_object_store(mem_root):
    fsio.mkdir_exclusive(mem_root + "/branches/exp")
    with pytest.raises(FileExistsError):
        fsio.mkdir_exclusive(mem_root + "/branches/exp")


def should_run_commit_pointer_protocol_on_object_store(mem_root):
    """The exact manifest-publish sequence ManifestTable._publish runs,
    replayed over the object store: content-addressed manifest write,
    CAS commit pointer, loser cleanup — two racers, one winner."""
    import json

    commits = mem_root + "/commits"
    manifests = mem_root + "/manifests"
    fsio.mkdirs(commits)
    fsio.mkdirs(manifests)

    def publish(gen, tag):
        name = f"{gen:020d}-{tag}.json"
        fsio.write_text(manifests + "/" + name, json.dumps({"w": tag}))
        try:
            fsio.put_if_absent(f"{commits}/{gen:020d}", name)
            return True
        except FileExistsError:
            fsio.unlink(manifests + "/" + name, missing_ok=True)
            return False

    assert publish(1, "a") is True
    assert publish(1, "b") is False  # lost race: pointer CAS refused
    assert fsio.listdir(manifests) == [f"{1:020d}-a.json"]  # loser cleaned
    winner = fsio.read_text(f"{commits}/{1:020d}")
    assert json.loads(fsio.read_text(manifests + "/" + winner)) == {"w": "a"}


@pytest.mark.parametrize("op_seed", [0, 1, 2])
def should_agree_between_plain_and_file_uri_roots(tmp_path, op_seed):
    """Behavioral agreement: the same operation sequence against a
    plain-path root and a file:// root must produce identical listings,
    contents, and errors — the property the ManifestTable relies on
    when handed either form."""
    import hashlib

    def seq(root):
        out = []
        names = [
            hashlib.md5(f"{op_seed}-{i}".encode()).hexdigest()[:6]
            for i in range(6)
        ]
        fsio.mkdirs(root + "/a/b")
        for i, n in enumerate(names):
            tgt = root + ("/a/" if i % 2 else "/a/b/") + n
            fsio.write_text(tgt, f"v{i}")
        out.append(sorted(fsio.listdir(root + "/a")))
        out.append(sorted(fsio.listdir(root + "/a/b")))
        try:
            fsio.put_if_absent(root + "/a/" + names[1], "x")
            out.append("no-raise")
        except FileExistsError:
            out.append("exists")
        fsio.unlink(root + "/a/b/" + names[0])
        out.append(sorted(n for n, _ in (
            (p.rsplit("/", 1)[1], m) for p, m in fsio.walk_files(root + "/a")
        )))
        fsio.rmtree(root + "/a")
        try:
            fsio.listdir(root + "/a")
            out.append("listed")
        except FileNotFoundError:
            out.append("gone")
        return out

    plain = seq(str(tmp_path / "p"))
    uri = seq("file://" + str(tmp_path / "u"))
    assert plain == uri


# -- conditional-put protocol: detection through the emulation, true
# serialization through a registered backend -------------------------------


def should_detect_interleaved_double_commit_through_emulation():
    """The emulation's worst case, DETECTED: two racers BOTH pass the
    existence check (the non-atomic window), writes land A-then-B, and
    A's post-write read-back finds B's writer nonce instead of its own
    — so A raises FileExistsError instead of silently double-committing
    while B (the last writer, whose bytes are the pointer) wins.  The
    schedule is forced deterministically by an orchestrating store
    handler that sequences the two named racer threads."""
    import io
    import threading
    from datetime import datetime, timezone

    import pyarrow as pa
    from pyarrow.fs import FileSystemHandler, PyFileSystem

    inner = _mem_store()
    key = "bucket/commits/00000001"
    both_checked = threading.Barrier(2)
    a_wrote = threading.Event()
    b_wrote = threading.Event()

    def _me():
        return threading.current_thread().name

    class Orchestrated(FileSystemHandler):
        # delegation boilerplate: everything rides the real MemStore
        def get_type_name(self):
            return "mem"

        def normalize_path(self, p):
            return inner.normalize_path(p)

        def get_file_info_selector(self, s):
            return inner.get_file_info_selector(s)

        def create_dir(self, p, recursive):
            return inner.create_dir(p, recursive)

        def delete_dir(self, p):
            return inner.delete_dir(p)

        def delete_dir_contents(self, p, missing_dir_ok=False):
            return inner.delete_dir_contents(p, missing_dir_ok)

        def delete_root_dir_contents(self):
            return inner.delete_root_dir_contents()

        def delete_file(self, p):
            return inner.delete_file(p)

        def move(self, s, d):
            return inner.move(s, d)

        def copy_file(self, s, d):
            return inner.copy_file(s, d)

        def open_input_file(self, p):
            return self.open_input_stream(p)

        def open_append_stream(self, p, metadata):
            return inner.open_append_stream(p, metadata)

        # the three orchestrated calls:
        def get_file_info(self, paths):
            infos = inner.get_file_info(paths)
            if paths == [key] and not b_wrote.is_set():  # race window only
                both_checked.wait(timeout=30)  # neither writes until
            return infos  # BOTH have seen NotFound

        def open_output_stream(self, p, metadata):
            if p != key:
                return inner.open_output_stream(p, metadata)
            if _me() == "racer-B":
                assert a_wrote.wait(timeout=30)  # B writes after A
            me = _me()

            class _Buf(io.BytesIO):
                def close(self):
                    with inner.lock:
                        inner.objects[p] = (
                            self.getvalue(),
                            datetime.now(timezone.utc),
                        )
                    (a_wrote if me == "racer-A" else b_wrote).set()
                    super().close()

            return pa.PythonFile(_Buf(), mode="w")

        def open_input_stream(self, p):
            if p == key and _me() == "racer-A":
                assert b_wrote.wait(timeout=30)  # A reads back LAST
            return inner.open_input_stream(p)

    fs = PyFileSystem(Orchestrated())
    fsio.register_fs("mem", lambda uri: (fs, uri[len("mem://"):]))
    try:
        outcome: dict[str, object] = {}

        def race(tag):
            try:
                fsio.put_if_absent("mem://" + key, f"nonce-{tag}")
                outcome[tag] = "won"
            except FileExistsError:
                outcome[tag] = "detected"

        ts = [
            threading.Thread(target=race, args=(t,), name=f"racer-{t}")
            for t in ("A", "B")
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        assert outcome == {"A": "detected", "B": "won"}
        assert fsio.read_text("mem://" + key) == "nonce-B"
    finally:
        fsio.register_fs("mem", None)


def should_serialize_racing_commits_through_registered_backend(mem_root):
    """With a TRUE conditional-put backend registered for the scheme
    (the documented S3 If-None-Match / GCS ifGenerationMatch slot),
    put_if_absent bypasses the emulation entirely — no existence probe,
    no read-back — and N unsynchronized racers get exactly one winner
    under ANY schedule, because check+create is one atomic step."""
    import threading
    from datetime import datetime, timezone

    from geospatial_data_lake_spark.sources.fsio import _FS_FACTORIES

    fs, _ = _FS_FACTORIES["mem"](mem_root + "/x")
    # reach the handler's MemStore to build the atomic backend on it
    store = fs.handler
    probes = []

    def cas(uri, payload):
        k = uri[len("mem://"):]
        with store.lock:  # one atomic check+create — the server's job
            if k in store.objects:
                raise FileExistsError(uri)
            store.objects[k] = (payload, datetime.now(timezone.utc))

    fsio.register_conditional_put("mem", cas)
    orig_info = store.get_file_info
    store.get_file_info = lambda paths: (probes.append(paths), orig_info(paths))[1]
    target = mem_root + "/commits/00000007"
    wins, losses = [], []
    try:
        start = threading.Barrier(8)

        def race(i):
            start.wait(timeout=30)
            try:
                fsio.put_if_absent(target, f"nonce-{i}")
                wins.append(i)
            except FileExistsError:
                losses.append(i)

        ts = [threading.Thread(target=race, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
    finally:
        fsio.register_conditional_put("mem", None)
        store.get_file_info = orig_info
    assert len(wins) == 1 and len(losses) == 7
    assert fsio.read_text(target) == f"nonce-{wins[0]}"
    # the emulation's existence probe never ran for the contested key
    assert not any(target.endswith(p[0]) for p in probes if p)
