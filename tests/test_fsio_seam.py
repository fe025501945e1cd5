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
