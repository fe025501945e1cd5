"""Quickstart: the engine's main surfaces in one runnable script.

A user of the reference catalog switching to this engine touches four
surfaces: the versioned lake table (ingest/MERGE/time travel), the
declared-query registry (every operator, oracle-checked), the
training-data pipeline operators (dedup / ANN / text), and the
geospatial interchange formats (WKB + GeoParquet).  This script runs
each against the sf0.001 fixtures.

Run:  python examples/quickstart.py  [SF_DIR]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    """Run the tour; returns {section: headline number} for smoke tests."""
    out: dict[str, int] = {}

    # 1. Versioned lake table: append, MERGE, time travel, data skipping
    from geospatial_data_lake_spark.sources.manifest_table import ManifestTable
    from geospatial_data_lake_spark.tables import tables

    t = tables(spark, sf_dir)
    mt = ManifestTable(
        spark,
        tempfile.mkdtemp(prefix="quickstart_lake_"),
        key_cols=["o_orderkey"],
        partition_by=["o_orderpriority"],
    )
    mt.append(t.orders.select("o_orderkey", "o_orderpriority", "o_totalprice"))
    v1 = mt.current_version()
    mt.upsert(
        t.orders.limit(100).select(
            "o_orderkey",
            "o_orderpriority",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
        )
    )
    assert mt.read(version=v1).count() == mt.read().count()
    out["lake_rows"] = mt.read(
        where={"o_orderpriority": ["1-URGENT", "2-HIGH"]}  # IN-list skip
    ).count()
    # r12 surfaces: row-granular positional delete (merge-on-read),
    # ZORDER clustering, metadata inspection tables, age-based expiry
    mt.delete_where_pos(F.col("o_totalprice") < 1500.0)
    mt.optimize(
        ["o_orderkey", "o_totalprice"], target_files=4, strategy="zorder"
    )
    out["lake_files"] = mt.files_meta().count()
    counted = mt.partitions_meta().agg(F.sum("record_count")).first()[0]
    assert counted == mt.read().count()  # metadata-only count, truthful
    mt.expire_snapshots(older_than_seconds=86400.0)  # young commits stay
    # r14 surfaces: content-mode CDC (the duplicate-key-safe multiset
    # diff — here it also nets out the pos-delete + zorder rewrite) and
    # the apply-changelog consumer: a replica seeded from v1 converges
    # through ONE net feed, exactly-once under crash replay via txn
    feed = mt.changes(v1, mt.current_version(), mode="content")
    replica = ManifestTable(
        spark,
        tempfile.mkdtemp(prefix="quickstart_replica_"),
        key_cols=["o_orderkey"],
        partition_by=["o_orderpriority"],
    )
    replica.append(mt.read(version=v1))
    # atomic=True (r15): both phases land as ONE WAP fast-forward
    # commit, so replica readers never see deletes-without-inserts
    replica.apply_content_changes(feed, txn=("quickstart", 1), atomic=True)
    replica.apply_content_changes(
        feed, txn=("quickstart", 1), atomic=True
    )  # replay: no-op
    assert replica.read().count() == mt.read().count()
    out["cdc_feed_rows"] = feed.count()

    # 2. The registry: run any declared query; each has a DuckDB oracle
    from geospatial_data_lake_spark import load_all_queries

    registry = load_all_queries()
    out["registry_queries"] = len(registry)
    out["dedup_pairs"] = (
        registry["dd04_minhash_lsh_pairs"].fn(spark, sf_dir).count()
    )
    out["ann_topk_rows"] = (
        registry["ss09_ivfpq_refined_search"].fn(spark, sf_dir).count()
    )
    out["gapfilled_hours"] = (
        registry["ts01_gap_fill_locf"].fn(spark, sf_dir).count()
    )
    out["semdedup_clusters"] = (
        registry["sd01_semantic_dedup"].fn(spark, sf_dir).count()
    )

    # 3. GeoParquet interchange: WKB points -> spec footer metadata ->
    #    spatial file pruning -> decode
    from geospatial_data_lake_spark.sources.geoparquet import (
        read_geoparquet,
        write_geoparquet,
    )
    from geospatial_data_lake_spark.sources.wkb_source import (
        points_to_wkb,
        wkb_to_points,
    )

    pts = t.events.select(
        "event_id",
        (((F.col("event_id") * 7919) % 900) / 10.0 - 45.0).alias("px"),
        (((F.col("event_id") * 104729) % 425) / 10.0 - 21.25).alias("py"),
    )
    gp_path = tempfile.mkdtemp(prefix="quickstart_gp_")
    write_geoparquet(
        points_to_wkb(pts, "px", "py").drop("px", "py"),
        gp_path,
        {"wkb": ["Point"]},
    )
    window_df, meta = read_geoparquet(
        spark, gp_path, bbox=(-10.0, -30.0, 10.0, 30.0)
    )
    out["geo_window_rows"] = (
        wkb_to_points(window_df, "wkb")
        .filter(F.col("x").between(-10.0, 10.0))
        .count()
    )
    assert meta.columns["wkb"]["encoding"] == "WKB"
    return out


if __name__ == "__main__":
    import pathlib

    # running as a script: python adds examples/ to sys.path, not the
    # repo root the package lives under
    _repo = str(pathlib.Path(__file__).resolve().parent.parent)
    if _repo not in sys.path:
        sys.path.insert(0, _repo)

    from geospatial_data_lake_spark.session import get_spark

    session = get_spark(app_name="quickstart")
    session.sparkContext.setLogLevel("ERROR")
    results = main(
        session, sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    )
    for k, v in results.items():
        print(f"{k}: {v}")
    session.stop()
