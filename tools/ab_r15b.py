#!/usr/bin/env python
"""A/B harness for the second batch of r15 optimizations (ct01, tx10,
geo07, sd02's census): OLD and NEW plans built in ONE session, timed
noop-sink runs interleaved A/B/A/B (guide §1.4) so a host throttle
window hits both variants alike; per-variant MIN reported.
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
from geospatial_data_lake_spark.operators.clustering import (  # noqa: E402
    _SD_TARGET_CELL,
    _embedding_broadcast_bytes,
    kmeans_fit,
    semdedup_auto_k,
)
from geospatial_data_lake_spark.operators.dedup import (  # noqa: E402
    _broadcast_budget,
)
from geospatial_data_lake_spark.operators.pipeline_ops import (  # noqa: E402
    _GRAM_N,
)
from geospatial_data_lake_spark.operators.similarity import (  # noqa: E402
    _dot as _cg_dot,
)
from geospatial_data_lake_spark.operators.textops import (  # noqa: E402
    _pair_starts,
    gram_starts as _gram_starts,
)

_KNN_R = 2.0


def geo07_shape(t, cell: float):
    px = ((F.col("event_id") * 7919) % 900) / 10.0 - 45.0
    py = ((F.col("event_id") * 104729) % 425) / 10.0 - 21.25
    points = t.events.select(
        "event_id", px.alias("px"), py.alias("py")
    ).withColumns(
        {"cx": F.floor(F.col("px") / cell), "cy": F.floor(F.col("py") / cell)}
    )
    qx = ((F.col("doc_id") * 7919) % 900) / 10.0 - 45.0
    qy = ((F.col("doc_id") * 104729) % 425) / 10.0 - 21.25
    ring = F.array(
        *[
            F.struct(
                (F.floor(F.col("qx") / cell) + dx).alias("cx"),
                (F.floor(F.col("qy") / cell) + dy).alias("cy"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    centers = (
        t.documents.select("doc_id", qx.alias("qx"), qy.alias("qy"))
        .select("doc_id", "qx", "qy", F.explode(ring).alias("cell"))
        .select("doc_id", "qx", "qy", "cell.cx", "cell.cy")
    )
    d2 = (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx")) + (
        F.col("py") - F.col("qy")
    ) * (F.col("py") - F.col("qy"))
    best = (
        points.join(F.broadcast(centers), ["cx", "cy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= F.lit(_KNN_R * _KNN_R))
        .groupBy("event_id")
        .agg(F.min(F.struct("d2", "doc_id")).alias("b"))
    )
    return best.select(
        "event_id",
        F.col("b.doc_id").alias("nearest_doc"),
        F.round(F.sqrt("b.d2"), 6).alias("dist"),
    ).orderBy("event_id")


def ct01_shape(t, new: bool):
    tk = F.split(F.col("text"), " ")
    grams = t.documents.select(
        "doc_id",
        F.explode(
            F.transform(
                _gram_starts(tk, _GRAM_N),
                lambda p: F.concat_ws(" ", F.slice(tk, p, _GRAM_N)),
            )
        ).alias("gram"),
    )
    benchmark = (
        grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    if new:
        corpus = grams.filter(F.col("doc_id") % 97 != 0)
        agg = F.count_distinct("gram")
    else:
        corpus = grams.filter(F.col("doc_id") % 97 != 0).dropDuplicates(
            ["doc_id", "gram"]
        )
        agg = F.count(F.lit(1))
    return (
        corpus.join(F.broadcast(benchmark), "gram")
        .groupBy("doc_id")
        .agg(agg.alias("n_shared_grams"))
        .orderBy("doc_id")
    )


def tx10_shape(t, new: bool):
    toks = F.split(F.col("text"), " ")
    b = t.documents.select(
        "doc_id",
        F.explode(
            F.transform(
                _pair_starts(toks),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    c12 = b.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    if new:
        c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    else:
        c1 = b.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    m = c12.join(c1, "w1").select(
        "w1", "w2", (F.col("n12").cast("double") / F.col("n1")).alias("p")
    )
    return (
        b.join(F.broadcast(m), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.col("p").cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_bigram_prob"),
        )
        .select(
            "doc_id",
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            "mean_bigram_prob",
        )
        .orderBy("doc_id")
    )


def census_shape(spark, fin, bound: int, new: bool):
    m = fin.select("vec_id", "v", "cid").withColumn(
        "n", F.sqrt(_cg_dot(F.col("v"), F.col("v")))
    )
    mem = fin.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    if new:
        nsub = mem.select(
            "cid",
            F.ceil(F.col("n_members") / F.lit(bound)).cast("int").alias(
                "__nsub"
            ),
        )
    else:
        nsub = fin.groupBy("cid").agg(
            F.ceil(F.count(F.lit(1)) / F.lit(bound)).cast("int").alias(
                "__nsub"
            )
        )
    m = m.join(F.broadcast(nsub), "cid").withColumn(
        "__salt", F.pmod(F.xxhash64("vec_id"), F.col("__nsub")).cast("int")
    ).drop("__nsub")
    a = spread(spark, m).alias("a")
    b = m.alias("b")
    build = (
        F.broadcast(b)
        if _embedding_broadcast_bytes(m) <= _broadcast_budget(spark)
        else b
    )
    pair_cond = F.col("a.vec_id") < F.col("b.vec_id")
    for kcol in ("cid", "__salt"):
        pair_cond = (F.col(f"a.{kcol}") == F.col(f"b.{kcol}")) & pair_cond
    removed = (
        a.join(build, pair_cond)
        .filter(
            _cg_dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.n") * F.col("b.n"))
            >= 0.4
        )
        .select(F.col("a.cid").alias("cid"), F.col("b.vec_id").alias("dup"))
        .distinct()
        .groupBy("cid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_removed"))
    )
    return (
        mem.join(F.broadcast(removed), "cid", "left")
        .select(
            F.col("cid").cast("bigint").alias("cluster"),
            "n_members",
            F.coalesce("n_removed", F.lit(0)).cast("bigint").alias(
                "n_removed"
            ),
            (
                F.col("n_members") - F.coalesce("n_removed", F.lit(0))
            ).cast("bigint").alias("n_kept"),
        )
        .orderBy("cluster")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    only = set(sys.argv[1:])
    spark = get_spark(app_name="gdl-ab-r15b")
    t = tables(spark, sf_dir)
    variants: dict = {}
    if not only or "geo07" in only:
        variants["geo07_old_cell5"] = geo07_shape(t, 5.0)
        variants["geo07_new_cell2"] = geo07_shape(t, _KNN_R)
    if not only or "ct01" in only:
        variants["ct01_old"] = ct01_shape(t, new=False)
        variants["ct01_new"] = ct01_shape(t, new=True)
    if not only or "tx10" in only:
        variants["tx10_old"] = tx10_shape(t, new=False)
        variants["tx10_new"] = tx10_shape(t, new=True)
    if not only or "sd02" in only:
        e = t.embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        k = semdedup_auto_k(e.count())
        fin, _ = kmeans_fit(e, k=k)  # one training, shared by both arms
        bound = 32 * _SD_TARGET_CELL
        variants["sd02census_old"] = census_shape(spark, fin, bound, False)
        variants["sd02census_new"] = census_shape(spark, fin, bound, True)
    # equivalence spot-check before timing: old vs new row-identical
    pairs = sorted({n.rsplit("_", 1)[0].replace("_old", "").replace("_new", "")
                    for n in variants})
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
