#!/usr/bin/env python
"""A/B harness for the r15 dd11-prefilter and a14-single-buffer
optimizations: OLD and NEW plans in ONE session (the dd11 band index is
session-cached, so both arms probe the identical persisted index),
interleaved noop runs, per-variant MIN; equivalence pinned via exceptAll.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from geospatial_data_lake_spark.session import get_spark  # noqa: E402
from geospatial_data_lake_spark.tables import spread, tables  # noqa: E402
from geospatial_data_lake_spark.operators.dedup import (  # noqa: E402
    _build_band_index,
    _band_keys,
    _hashed_tokens,
    dd11_indexed_incremental_dedup,
)
from geospatial_data_lake_spark.operators.udafs import (  # noqa: E402
    a14_sketch_percentiles,
)


def dd11_old(spark, sf_dir):
    mt, store = _build_band_index(spark, sf_dir)
    t = tables(spark, sf_dir)
    batch = spread(spark, t.documents.filter(F.col("doc_id") % 13 == 0))
    probe = _band_keys(batch).select(
        F.col("doc_id").alias("new_id"), "band", "key"
    )
    idx = mt.read().select(F.col("doc_id").alias("old_id"), "band", "key")
    cands = (
        probe.join(idx, ["band", "key"]).select("new_id", "old_id").distinct()
    )
    bh = batch.select(F.col("doc_id").alias("new_id"), _hashed_tokens()).select(
        "new_id", F.col("h").alias("h1")
    )
    ch = (
        spark.read.parquet(store)
        .select(F.col("doc_id").alias("old_id"), F.col("h").alias("h2"))
        .join(cands.select("old_id").distinct(), "old_id", "leftsemi")
    )
    nc = F.size(F.array_intersect("h1", "h2"))
    return (
        cands.join(F.broadcast(bh), "new_id")
        .join(ch, "old_id")
        .withColumn("nc", nc)
        .withColumn(
            "jaccard",
            F.col("nc") / (F.size("h1") + F.size("h2") - F.col("nc")),
        )
        .filter(F.col("jaccard") >= 0.8)
        .select("new_id", "old_id", F.round("jaccard", 4).alias("jaccard"))
    )


def a14_old(spark, sf_dir):
    t = tables(spark, sf_dir)
    agg = t.lineitem.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", [0.5, 0.95, 0.99], 10000
        ).alias("pcts"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("e50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("e95"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("e99"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    within = lambda i, e: (  # noqa: E731
        F.abs(F.element_at("pcts", i) - F.col(e)) <= F.abs(F.col(e)) * 0.005
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        within(1, "e50").alias("p50_within_bound"),
        within(2, "e95").alias("p95_within_bound"),
        within(3, "e99").alias("p99_within_bound"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    spark = get_spark(app_name="gdl-ab-r15d")
    variants = {
        "dd11_old": dd11_old(spark, sf_dir),
        "dd11_new": dd11_indexed_incremental_dedup(spark, sf_dir),
        "a14_old": a14_old(spark, sf_dir),
        "a14_new": a14_sketch_percentiles(spark, sf_dir),
    }
    for base in ("dd11", "a14"):
        a, b = variants[f"{base}_old"], variants[f"{base}_new"]
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"{base} old-vs-new diff rows: {diff}", flush=True)
        assert diff == 0, f"{base} variants diverge"
    for name, df in variants.items():
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        df.write.format("noop").mode("overwrite").save()
    out = {name: [] for name in variants}
    for r in range(rounds):
        for name, df in variants.items():
            spark.sparkContext.setJobDescription(f"{name}: round {r}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[name].append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {name: {"runs": runs, "min": min(runs)} for name, runs in out.items()}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
