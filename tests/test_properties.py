"""Property-based tests (hypothesis) — generative inputs in the spirit of
the reference's any_* generators (SURVEY §5.4), with shrinking the
reference lacks. Each property batches all generated rows into ONE
DataFrame per example to keep Spark round-trips bounded."""

from __future__ import annotations

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
        "doc_id", "frame_idx", "frame_off", "frame_digest",
    ]
    # every 4th frame only
    assert all(r[1] % 4 == 0 for r in a)
