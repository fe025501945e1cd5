"""Property-based tests (hypothesis) — generative inputs in the spirit of
the reference's any_* generators (SURVEY §5.4), with shrinking the
reference lacks. Each property batches all generated rows into ONE
DataFrame per example to keep Spark round-trips bounded."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from geospatial_data_lake_spark.operators.asof import asof_join

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    lefts=st.lists(st.integers(0, 50), min_size=1, max_size=12),
    rights=st.lists(st.integers(0, 50), min_size=0, max_size=12),
)
def should_asof_match_naive_semantics(spark, lefts, rights):
    """asof_join == 'greatest right_ts strictly below left_ts', per key."""
    left = spark.createDataFrame(
        [("k", i, t) for i, t in enumerate(lefts)], "key string, lid int, lts int"
    )
    right = spark.createDataFrame(
        [("k", t, t * 10) for t in set(rights)], "key string, rts int, val int"
    )
    got = {
        r.lid: r.asof_val
        for r in asof_join(
            left, right, on=["key"], left_ts="lts", right_ts="rts",
            right_value_cols=["val"],
        ).collect()
    }
    for i, lt in enumerate(lefts):
        preceding = [t for t in set(rights) if t < lt]
        want = max(preceding) * 10 if preceding else None
        assert got[i] == want, (lefts, rights, i)


@settings(**_SETTINGS)
@given(
    hrefs=st.lists(
        st.one_of(
            st.from_regex(r"s3://[a-z]{3,8}/[a-z]{1,6}/[a-z]{1,8}\.json", fullmatch=True),
            st.from_regex(r"[a-z]{1,8}(/[a-z]{1,8}){0,2}\.json", fullmatch=True),
        ),
        min_size=1,
        max_size=10,
    )
)
def should_href_resolution_be_absolute_and_idempotent(spark, hrefs):
    """Every resolved href is absolute; absolute hrefs pass through
    unchanged; relative ones live under the parent's directory (ref
    semantics: backend/check_stac_metadata/utils.py:43-48)."""
    parent = "s3://bucket/data/collection.json"
    df = spark.createDataFrame([(h,) for h in hrefs], "href string")
    resolved = df.select(
        "href",
        F.when(F.col("href").startswith("s3://"), F.col("href"))
        .otherwise(
            F.concat(
                F.regexp_replace(F.lit(parent), r"/[^/]*$", ""),
                F.lit("/"),
                F.col("href"),
            )
        )
        .alias("abs"),
    ).collect()
    for r in resolved:
        assert r.abs.startswith("s3://"), r
        if r.href.startswith("s3://"):
            assert r.abs == r.href
        else:
            assert r.abs == f"s3://bucket/data/{r.href}"


@settings(**_SETTINGS)
@given(
    ids=st.lists(
        st.tuples(st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="#"),
            min_size=1, max_size=12,
        ), st.integers(0, 10**6)),
        min_size=1,
        max_size=10,
        unique=True,
    )
)
def should_composite_key_roundtrip_any_unicode(spark, ids):
    """DATASET#<id>#VERSION#<n> build/split is lossless for any unicode id
    without the delimiter (ref key format: check_stac_metadata/task.py:50)."""
    df = spark.createDataFrame(ids, "dataset_id string, version int")
    back = (
        df.select(
            "dataset_id",
            "version",
            F.concat_ws(
                "#", F.lit("DATASET"), "dataset_id", F.lit("VERSION"),
                F.col("version").cast("string"),
            ).alias("pk"),
        )
        .select(
            "dataset_id",
            "version",
            F.split("pk", "#").getItem(1).alias("id2"),
            F.split("pk", "#").getItem(3).cast("int").alias("v2"),
        )
        .collect()
    )
    for r in back:
        assert r.id2 == r.dataset_id and r.v2 == r.version


def should_mm03_frames_be_deterministic_and_contracting(spark, sf_dir):
    from geospatial_data_lake_spark import load_all_queries

    registry = load_all_queries()
    df = registry["mm03_frame_sample"].fn(spark, sf_dir)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "frame_idx", "frame_off", "width", "mean_px",
    ]
    # every 2nd frame only
    assert all(r[1] % 2 == 0 for r in a)


# --- ray casting: both implementations vs a pure-Python reference ------------

def _py_point_in_ring(ring, px, py):
    """Reference even-odd crossing test (same division-free form)."""
    crossings = 0
    for (ax, ay), (bx, by) in zip(ring, ring[1:]):
        if (ay > py) != (by > py) and (
            ((px - ax) * (by - ay) < (bx - ax) * (py - ay)) == (by > ay)
        ):
            crossings += 1
    return crossings % 2 == 1


@st.composite
def _convex_ring_and_points(draw):
    """A random convex lattice polygon (closed ring, 3..8 distinct
    vertices sorted by angle) plus query points landing in/near it."""
    import math

    n = draw(st.integers(min_value=3, max_value=8))
    pts = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=-50, max_value=50),
                st.integers(min_value=-50, max_value=50),
            ),
            min_size=n,
            max_size=n,
            unique=True,
        )
    )
    cx = sum(p[0] for p in pts) / len(pts)
    cy = sum(p[1] for p in pts) / len(pts)
    ring = sorted(pts, key=lambda p: math.atan2(p[1] - cy, p[0] - cx))
    ring.append(ring[0])  # close
    queries = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=-60, max_value=60),
                st.integers(min_value=-60, max_value=60),
            ),
            min_size=1,
            max_size=20,
        )
    )
    return ring, queries


@settings(**_SETTINGS)
@given(data=_convex_ring_and_points())
def should_ray_cast_match_pure_python_reference(spark, data):
    # Both the interpreted-HOF and the codegen-unrolled crossing sums
    # must agree with a reference implementation on arbitrary convex
    # lattice rings — pinning the 1-based array indexing and the
    # edge-orientation handling of the division-free form.
    from geospatial_data_lake_spark.operators.geo import (
        point_in_ring,
        unrolled_ray_cast,
    )

    ring, queries = data
    n_edges = len(ring) - 1
    rows = [
        {"px": px, "py": py, "ring": [{"x": x, "y": y} for x, y in ring]}
        for px, py in queries
    ]
    df = spark.createDataFrame(
        rows, "px long, py long, ring array<struct<x: long, y: long>>"
    )
    out = df.select(
        "px",
        "py",
        point_in_ring(F.col("ring"), F.col("px"), F.col("py")).alias("hof"),
        unrolled_ray_cast(
            F.col("ring"), F.col("px"), F.col("py"), n_edges
        ).alias("unrolled"),
    ).collect()
    for r in out:
        expected = _py_point_in_ring(ring, r.px, r.py)
        assert r.hof == expected, (ring, r.px, r.py)
        assert r.unrolled == expected, (ring, r.px, r.py)


# --- upsert sink: model-based MERGE semantics --------------------------------

@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),   # key
                st.integers(min_value=0, max_value=2),   # partition value
                st.integers(min_value=0, max_value=99),  # payload
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=3,
    )
)
def should_upsert_match_dict_merge_model(spark, tmp_path_factory, batches):
    # Apply a random sequence of upsert batches (keys move freely across
    # partitions) and compare the final table to a dict model: last
    # write per key wins, everything else survives. Guards the
    # partition-move rewrite path (a key's OLD partition must be
    # rewritten too, or the stale row survives).
    from geospatial_data_lake_spark.sources.sinks import upsert_parquet

    path = str(tmp_path_factory.mktemp("upsert_prop") / "t")
    model: dict[int, tuple[int, int]] = {}
    for batch in batches:
        dedup: dict[int, tuple[int, int]] = {}
        for k, p, v in batch:
            dedup[k] = (p, v)  # upsert dedups batch rows by key
        df = spark.createDataFrame(
            [(k, p, v) for k, (p, v) in dedup.items()], "k long, p long, v long"
        )
        upsert_parquet(spark, path, df, key_cols=["k"], partition_by=["p"])
        model.update(dedup)
    got = {
        r.k: (r.p, r.v) for r in spark.read.parquet(path).collect()
    }
    assert got == model, (got, model, batches)


# --- winnowing: Spark expression vs pure-Python MOSS reference ---------------

def _py_winnow_count(text, k=5, w=4):
    import hashlib

    if len(text) < k + w - 1:
        return None
    hs = [
        hashlib.md5(text[i : i + k].encode()).hexdigest()
        for i in range(len(text) - k + 1)
    ]
    return len({min(hs[i : i + w]) for i in range(len(hs) - w + 1)})


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=8,
            max_size=60,
        ),
        min_size=1,
        max_size=10,
    )
)
def should_winnow_expression_match_python_reference(spark, texts):
    # tx07's in-row sliding-min expression vs a literal MOSS reference:
    # pins the 1-based substring/slice indexing (k=5, w=4) and the
    # distinct-selection semantics for arbitrary lowercase inputs.
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    out = (
        df.select(
            "i",
            F.expr(
                "transform(sequence(1, length(text) - 4),"
                " p -> md5(substring(text, p, 5)))"
            ).alias("hs"),
        )
        .select(
            "i",
            F.expr(
                "CAST(size(array_distinct("
                " transform(sequence(1, size(hs) - 3),"
                "  i -> array_min(slice(hs, i, 4))))) AS BIGINT)"
            ).alias("n"),
        )
        .collect()
    )
    for r in out:
        assert r.n == _py_winnow_count(texts[r.i]), texts[r.i]


@settings(**_SETTINGS)
@given(
    tick_offsets_ms=st.lists(
        st.integers(0, 5), min_size=2, max_size=40
    ),  # 0 = same-millisecond mint, >0 = clock advance
)
def should_mint_lexicographically_monotonic_version_ids(tick_offsets_ms):
    """ULID monotonicity (ref backend/datasets_model.py:13-23): ids minted
    at non-decreasing wall-clock instants — including many inside the SAME
    millisecond — are strictly increasing lexicographically, hence unique
    and sortable in mint order."""
    from datetime import datetime, timedelta, timezone

    from geospatial_data_lake_spark.plans.catalog import mint_version_id

    now = datetime(2026, 8, 13, 12, 0, 0, 0, tzinfo=timezone.utc)
    ids = []
    for off in tick_offsets_ms:
        now = now + timedelta(milliseconds=off)
        ids.append(mint_version_id(now=now))
    assert ids == sorted(ids)
    assert len(set(ids)) == len(ids)


def should_mint_unique_ids_across_threads():
    """The monotonic state is lock-serialized: concurrent minters in one
    process never collide, even when they all land in one millisecond."""
    from concurrent.futures import ThreadPoolExecutor
    from datetime import datetime, timezone

    from geospatial_data_lake_spark.plans.catalog import mint_version_id

    frozen = datetime(2026, 8, 13, 12, 0, 0, 500000, tzinfo=timezone.utc)
    with ThreadPoolExecutor(max_workers=8) as pool:
        ids = list(pool.map(lambda _: mint_version_id(now=frozen), range(400)))
    # mint order (lock acquisition order) is arbitrary across workers;
    # the guarantee is zero collisions within the shared millisecond
    assert len(set(ids)) == 400


# -- manifest-table model check ----------------------------------------------

_mt_row = st.tuples(
    st.integers(0, 9),  # id
    # partition value domain deliberately OVERLAPS v's cast-to-string
    # domain ("0"/"1" vs long 0..99): after a same-arity column swap
    # (['part'] -> ['v']) an old-era directory {"part": "0"} and a
    # new-era directory {"v": "0"} hold the SAME value string under
    # different columns — the r11 collision class the manifest key's
    # column names must keep distinct through any rewrite sequence
    st.sampled_from(["0", "1", None]),  # partition (NULL included)
    st.integers(0, 99),  # v
)

_mt_op = st.one_of(
    st.tuples(st.just("append"), st.lists(_mt_row, min_size=1, max_size=4)),
    st.tuples(
        st.just("upsert"),
        st.lists(_mt_row, min_size=1, max_size=4, unique_by=lambda r: r[0]),
    ),
    st.tuples(st.just("delete"), st.integers(2, 4), st.integers(0, 3)),
    st.tuples(st.just("compact")),
    st.tuples(st.just("optimize")),
    st.tuples(
        st.just("txn_upsert"),
        st.lists(_mt_row, min_size=1, max_size=3, unique_by=lambda r: r[0]),
        st.integers(0, 3),  # txn batch version (may replay/regress)
    ),
    st.tuples(st.just("restore"), st.integers(0, 10)),  # rollback target pick
    st.tuples(st.just("delete_eq"), st.integers(2, 4), st.integers(0, 3)),
    # positional delete: ROW-granular — the model filters row tuples
    # directly (duplicate keys from raw appends survive unless their
    # own row matches), unlike delete_eq's key-granular contract
    st.tuples(st.just("delete_pos"), st.integers(2, 4), st.integers(0, 3)),
    # zorder clustering: content-invariant rewrite, like optimize
    st.tuples(st.just("zorder")),
    # partition-spec evolution: new truncate width (hidden layout) —
    # content-invariant by definition, and every later op must keep
    # behaving identically across the spec boundary
    st.tuples(st.just("evolve"), st.sampled_from([8, 16, 64])),
    # partition-COLUMN evolution (explicit layout only): add/remove/
    # same-arity-swap the column list; content-invariant metadata-only
    # commit, and every later rewrite must stay era-exact
    st.tuples(
        st.just("evolve_cols"),
        st.sampled_from([("part",), ("v",), ("part", "v"), ("v", "part")]),
    ),
)


@pytest.mark.parametrize("layout", ["explicit", "hidden"])
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_mt_op, min_size=1, max_size=5))
def should_manifest_table_match_multiset_model(spark, layout, ops):
    """Model check: any sequence of append/upsert/delete/compact/
    optimize/txn-upsert/restore leaves the manifest table holding exactly the
    multiset a trivial in-memory model predicts — and every
    intermediate version stays readable as its own historical snapshot
    (time travel over the whole history).  optimize must be content-
    preserving; a txn-upsert whose (app, version) is not newer than the
    recorded cursor must be a committed no-op (the replay contract)."""
    import tempfile

    from geospatial_data_lake_spark.sources.manifest_table import ManifestTable

    if layout == "explicit":
        mt = ManifestTable(
            spark,
            tempfile.mkdtemp(prefix="gdl_mt_prop_"),
            key_cols=["id"],
            partition_by=["part"],
        )
    else:
        # hidden partitioning: the derived truncate column is invisible
        # to the model — every op must behave identically
        mt = ManifestTable(
            spark,
            tempfile.mkdtemp(prefix="gdl_mt_prop_"),
            key_cols=["id"],
            partition_by=["vt"],
            partition_transforms={"vt": ("truncate", "v", 32)},
        )
    model: list[tuple] = []  # multiset of (id, part, v)
    snapshots: dict[int, list[tuple]] = {}
    last_txn = -1  # the model's txn cursor for app "prop"

    def df_of(rows):
        return spark.createDataFrame(rows, "id long, part string, v long")

    for op in ops:
        if op[0] == "append":
            v = mt.append(df_of(op[1]))
            model = model + list(op[1])
        elif op[0] == "upsert":
            v = mt.upsert(df_of(op[1]))
            keys = {r[0] for r in op[1]}
            model = [r for r in model if r[0] not in keys] + list(op[1])
        elif op[0] == "delete":
            _, m, rem = op
            if mt.current_version() == 0:  # delete before any commit
                import pytest

                from geospatial_data_lake_spark.plans.catalog import (
                    NotFoundError,
                )

                with pytest.raises(NotFoundError):
                    mt.delete_where(F.col("id") % m == rem)
                continue
            v = mt.delete_where(F.col("id") % m == rem)
            model = [r for r in model if r[0] % m != rem]
        elif op[0] == "optimize":
            v = mt.optimize(sort_by=["id"], target_files=2)
            if v is None:
                continue  # empty table: nothing to cluster
        elif op[0] == "zorder":
            v = mt.optimize(
                sort_by=["id", "v"], target_files=2, strategy="zorder"
            )
            if v is None:
                continue  # empty table: nothing to cluster
        elif op[0] == "delete_pos":
            _, m, rem = op
            if mt.current_version() == 0:
                import pytest

                from geospatial_data_lake_spark.plans.catalog import (
                    NotFoundError,
                )

                with pytest.raises(NotFoundError):
                    mt.delete_where_pos(F.col("v") % m == rem)
                continue
            before = mt.current_version()
            v = mt.delete_where_pos(F.col("v") % m == rem)
            # ROW-granular: exactly the matching row tuples disappear
            model = [r for r in model if r[2] % m != rem]
            if v == before:
                continue  # nothing matched: no commit, no snapshot
        elif op[0] == "delete_eq":
            _, m, rem = op
            if mt.current_version() == 0:
                import pytest

                from geospatial_data_lake_spark.plans.catalog import (
                    NotFoundError,
                )

                with pytest.raises(NotFoundError):
                    mt.delete_where_eq(F.col("v") % m == rem)
                continue
            before = mt.current_version()
            v = mt.delete_where_eq(F.col("v") % m == rem)
            # KEY-granular: every row sharing a matched row's key goes
            keys = {r[0] for r in model if r[2] % m == rem}
            model = [r for r in model if r[0] not in keys]
            if v == before:
                continue  # nothing matched: no commit, no snapshot
        elif op[0] == "restore":
            if not snapshots:  # nothing committed yet: must refuse
                import pytest

                from geospatial_data_lake_spark.plans.catalog import (
                    NotFoundError,
                )

                with pytest.raises(NotFoundError):
                    mt.restore(1)
                continue
            versions = sorted(snapshots)
            target = versions[op[1] % len(versions)]
            v = mt.restore(target)
            model = list(snapshots[target])
        elif op[0] == "evolve":
            if mt.current_version() == 0:
                import pytest

                from geospatial_data_lake_spark.plans.catalog import (
                    NotFoundError,
                )

                with pytest.raises(NotFoundError):
                    mt.evolve_partition_spec(
                        {"vt": ("truncate", "v", op[1])}
                        if layout == "hidden"
                        else {}
                    )
                continue
            v = mt.evolve_partition_spec(
                {"vt": ("truncate", "v", op[1])}
                if layout == "hidden"
                else {}
            )
            # metadata-only: the model's multiset is untouched
        elif op[0] == "evolve_cols":
            if layout != "explicit":
                continue  # hidden layout keeps its transform column
            if mt.current_version() == 0:
                import pytest

                from geospatial_data_lake_spark.plans.catalog import (
                    NotFoundError,
                )

                with pytest.raises(NotFoundError):
                    mt.evolve_partition_spec({}, partition_by=list(op[1]))
                continue
            v = mt.evolve_partition_spec({}, partition_by=list(op[1]))
            # metadata-only: the model's multiset is untouched
        elif op[0] == "txn_upsert":
            _, rows, k = op
            before = mt.current_version()
            v = mt.upsert(df_of(rows), txn=("prop", k))
            if k <= last_txn:
                assert v == before, (ops, k)  # replayed batch: no-op
                continue
            last_txn = k
            keys = {r[0] for r in rows}
            model = [r for r in model if r[0] not in keys] + list(rows)
        else:
            v = mt.compact()
            if v is None:
                continue
        snapshots[v] = list(model)

    if not snapshots:  # every op skipped (delete before first commit)
        assert mt.current_version() == 0
        return
    canon = repr  # None/str mix is not <-comparable; repr is a total order
    cols = ["id", "part", "v"]  # model columns (derived vt excluded)
    got = sorted(
        (tuple(r) for r in mt.read().select(*cols).collect()), key=canon
    )
    assert got == sorted(snapshots[max(snapshots)], key=canon), ops
    for v, snap in snapshots.items():
        at_v = sorted(
            (tuple(r) for r in mt.read(version=v).select(*cols).collect()),
            key=canon,
        )
        assert at_v == sorted(snap, key=canon), (ops, v)
    # a pruned source-column read stays exact across any sequence of
    # spec evolutions (per-era predicate mapping must never lose rows)
    want = sorted(
        (r for r in snapshots[max(snapshots)] if 10 <= r[2] <= 60),
        key=canon,
    )
    got_w = sorted(
        (
            tuple(r)
            for r in mt.read(where={"v": (10, 60)}).select(*cols).collect()
        ),
        key=canon,
    )
    assert got_w == want, ops
    # IN-list spec: same exactness contract under any history
    probe = [0, 17, 42, 99]
    want_in = sorted(
        (r for r in snapshots[max(snapshots)] if r[2] in probe), key=canon
    )
    got_in = sorted(
        (
            tuple(r)
            for r in mt.read(where={"v": probe}).select(*cols).collect()
        ),
        key=canon,
    )
    assert got_in == want_in, ops


# -- WKB codec property check -------------------------------------------------

_coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
_ring = st.lists(st.tuples(_coord, _coord), min_size=3, max_size=8).map(
    lambda pts: pts + [pts[0]]  # close the ring
)
_polygon = st.lists(_ring, min_size=1, max_size=3)  # shell + holes
_multipolygon = st.lists(_polygon, min_size=1, max_size=3)


@settings(max_examples=200, deadline=None)
@given(parts=_multipolygon, data=st.data())
def should_roundtrip_any_wkb_multipolygon_and_reject_truncations(parts, data):
    """WKB codec property: encode->decode is the identity on ANY
    multipolygon (parts flatten to rings, shells before holes), and
    EVERY strict prefix of a valid encoding raises ValueError — the
    hardened error contract holds on all truncation points, never
    struct.error, never a hang."""
    from geospatial_data_lake_spark.sources.wkb_source import (
        decode_wkb_rings,
        encode_wkb_multipolygon,
    )

    buf = encode_wkb_multipolygon(parts)
    gtype, rings = decode_wkb_rings(buf)
    assert gtype == 6
    assert rings == [ring for rings_ in parts for ring in rings_]

    # any strict prefix is malformed
    cut = data.draw(st.integers(min_value=0, max_value=len(buf) - 1))
    import pytest

    with pytest.raises(ValueError):
        decode_wkb_rings(buf[:cut])


@settings(**_SETTINGS)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(0, 2),        # user
            st.integers(0, 72),       # hour offset from epoch base
            st.integers(0, 9999),     # reading in cents
        ),
        min_size=1,
        max_size=24,
    )
)
def should_locf_fill_match_naive_reference(spark, obs):
    """The interval-explode LOCF core == the naive python gap-fill: per
    user, a dense hourly series from first to last observed bucket where
    every bucket carries the latest observation at-or-before it (ties on
    the same (user, hour) resolved by max event_id), and ts03's daily
    integer-DIV mean matches the python fold over that series."""
    from datetime import datetime, timedelta

    from geospatial_data_lake_spark.operators.timeseries import (
        _hourly_buckets,
        _locf_fill,
        _twa_daily,
    )

    base = datetime(2024, 3, 1)
    rows = [
        (eid, u, base + timedelta(hours=h), cents / 100.0)
        for eid, (u, h, cents) in enumerate(obs)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    filled = _locf_fill(_hourly_buckets(ev)).collect()

    # naive reference
    last_per_bucket: dict[tuple[int, int], tuple[int, float]] = {}
    for eid, u, ts, v in rows:
        h = int((ts - base).total_seconds() // 3600)
        cur = last_per_bucket.get((u, h))
        if cur is None or eid > cur[0]:
            last_per_bucket[(u, h)] = (eid, v)
    want: dict[tuple[int, int], tuple[float, bool]] = {}
    for u in {k[0] for k in last_per_bucket}:
        hs = sorted(h for (uu, h) in last_per_bucket if uu == u)
        carried = None
        for h in range(hs[0], hs[-1] + 1):
            if (u, h) in last_per_bucket:
                carried = last_per_bucket[(u, h)][1]
                want[(u, h)] = (carried, False)
            else:
                want[(u, h)] = (carried, True)

    got = {
        (r.user_id, int((r.fill_bucket - base).total_seconds() // 3600)): (
            r.reading,
            r.is_gap,
        )
        for r in filled
    }
    assert got == want, (obs, got, want)

    # ts03's daily mean == python integer fold over the same series
    twa = {
        (r.user_id, r.day): (r.n_hours, r.n_filled, r.twa)
        for r in _twa_daily(
            _locf_fill(_hourly_buckets(ev))
        ).collect()
    }
    from collections import defaultdict

    days = defaultdict(list)
    for (u, h), (v, gap) in want.items():
        day = (base + timedelta(hours=h)).strftime("%Y-%m-%d")
        days[(u, day)].append((v, gap))
    for key, vals in days.items():
        cents = sum(round(v * 100) for v, _ in vals)
        n = len(vals)
        expect = (cents * 10000 // n) / 1_000_000.0
        nh, nf, tw = twa[key]
        assert nh == n and nf == sum(1 for _, g in vals if g)
        assert tw == expect, (key, tw, expect)
