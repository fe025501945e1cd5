#!/usr/bin/env python
"""A/B harness for the r15 similarity optimizations (ss02, ss03):
OLD (wide distinct / per-pair norms) vs NEW (score-then-distinct /
scan-side norms) built in ONE session, interleaved noop runs, MIN of N.
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

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from geospatial_data_lake_spark.session import get_spark  # noqa: E402
from geospatial_data_lake_spark.tables import tables  # noqa: E402
from geospatial_data_lake_spark.operators.similarity import (  # noqa: E402
    _dot,
    _hyperplanes,
    ss02_lsh_ann_topk,
    ss03_ivf_ann_topk,
)

_PROBE_MASKS = [0, 1, 2, 4, 8, 3, 5, 6, 9, 10, 12]


def _lit_dot(row):
    """Pre-r15 interpreted HOF fold (the committed-baseline shape)."""
    arr = F.array(*[F.lit(float(x)) for x in row])
    return F.aggregate(
        F.zip_with(F.col("v"), arr, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _sig_expr():
    """Pre-r15 interpreted sign projection (committed-baseline shape)."""
    planes = _hyperplanes()
    sig = F.lit(0).cast("long")
    for pi, row in enumerate(planes):
        d = _lit_dot(row)
        sig = sig + F.when(d > 0, F.lit(1 << pi).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def ss02_old(t):
    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("sig", _sig_expr())
    bands = e.select(
        "vec_id",
        "v",
        *[
            F.shiftright(F.col("sig"), 4 * i).bitwiseAND(F.lit(0xF)).alias(f"band{i}")
            for i in range(4)
        ],
    )
    band_long = bands.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), F.col(f"band{i}").alias("key"))
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "v", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    queries = (
        band_long.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            "band",
            F.explode(
                F.array(*[F.col("key").bitwiseXOR(F.lit(m)) for m in _PROBE_MASKS])
            ).alias("key"),
        )
    )
    candidates = (
        band_long.join(F.broadcast(queries), ["band", "key"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "qv", F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
        .distinct()
    )
    scored = candidates.select(
        "q_id",
        "c_id",
        (
            _dot(F.col("qv"), F.col("cv"))
            / (
                F.sqrt(_dot(F.col("qv"), F.col("qv")))
                * F.sqrt(_dot(F.col("cv"), F.col("cv")))
            )
        ).alias("cos_raw"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("c_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("q_id", "c_id", F.round("cos_raw", 4).alias("cosine"), "rnk")
    )


def ss03_old(spark, t):
    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    k, nprobe = 16, 4
    seed_rows = e.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    cents = []
    for r in seed_rows:
        v = [float(x) for x in r.v]
        n = sum(y * y for y in v) ** 0.5
        cents.append([x / n for x in v])
    best = F.array_max(
        F.array(
            *[
                F.struct(_lit_dot(c).alias("d"), F.lit(-cid).alias("negcid"))
                for cid, c in enumerate(cents)
            ]
        )
    )
    corpus = e.withColumn("list_id", (-best["negcid"]).cast("int"))
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "v"
    )
    qd = queries.select(
        "q_id",
        "qv",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(cid).alias("cid"), _lit_dot(c).alias("dotp"))
                    for cid, c in enumerate(cents)
                ]
            )
        ).alias("cd"),
    ).select("q_id", "qv", F.col("cd.cid").alias("list_id"), F.col("cd.dotp").alias("dotp"))
    pw = Window.partitionBy("q_id").orderBy(F.desc("dotp"), "list_id")
    probed = (
        qd.withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "qv", "list_id")
    )
    candidates = (
        corpus.join(F.broadcast(probed), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "qv", F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
    )
    scored = candidates.select(
        "q_id",
        "c_id",
        (
            _dot(F.col("qv"), F.col("cv"))
            / (
                F.sqrt(_dot(F.col("qv"), F.col("qv")))
                * F.sqrt(_dot(F.col("cv"), F.col("cv")))
            )
        ).alias("cos_raw"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("c_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("q_id", "c_id", F.round("cos_raw", 4).alias("cosine"), "rnk")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    spark = get_spark(app_name="gdl-ab-r15c")
    t = tables(spark, sf_dir)
    variants = {
        "ss02_old": ss02_old(t),
        "ss02_new": ss02_lsh_ann_topk(spark, sf_dir),
        "ss03_old": ss03_old(spark, t),
        "ss03_new": ss03_ivf_ann_topk(spark, sf_dir),
    }
    # equivalence pin: old and new emit identical rows
    for base in ("ss02", "ss03"):
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
