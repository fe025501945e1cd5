#!/usr/bin/env python
"""A/B harness for the r15 dedup optimizations, contention-immune-ish.

Builds the OLD (pre-r15) and NEW plans for dd04's saturated all-pairs
verify and dd14's decontamination in ONE session and interleaves timed
noop-sink runs A/B/A/B (guide §1.4), so a host throttle window hits
both variants alike; report per-variant MIN.
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
    _SPAN_W,
    _allpairs_jaccard_pairs,
    _dd10_windows,
)
from geospatial_data_lake_spark.operators.textops import (  # noqa: E402
    gram_starts as _gram_starts,
)


def _allpairs_old(documents, threshold):
    docs = documents.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(F.transform(F.split("text", " "), lambda w: F.xxhash64(w)))
        ).alias("h"),
    )
    a = docs.select(F.col("doc_id").alias("d1"), F.col("h").alias("h1"))
    b = docs.select(F.col("doc_id").alias("d2"), F.col("h").alias("h2"))
    common = F.size(F.array_intersect("h1", "h2"))
    return (
        a.join(F.broadcast(b), F.col("d1") < F.col("d2"))
        .withColumn("common", common)
        .withColumn(
            "jaccard",
            F.col("common") / (F.size("h1") + F.size("h2") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", F.round("jaccard", 4).alias("jaccard"))
    )


def _windows_old(documents):
    tk = F.split(F.col("text"), " ")
    return documents.select(
        "doc_id",
        F.explode(
            F.transform(
                _gram_starts(tk, _SPAN_W),
                lambda p: F.struct(
                    p.alias("p"),
                    F.md5(F.concat_ws(" ", F.slice(tk, p, _SPAN_W))).alias("h"),
                ),
            )
        ).alias("w"),
    ).select("doc_id", F.col("w.p").alias("p"), F.col("w.h").alias("h"))


def _dd14_shape(docs, windows_fn):
    bench_h = windows_fn(docs.filter(F.col("doc_id") % 17 == 0)).select("h").distinct()
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    hits = (
        windows_fn(corpus)
        .join(F.broadcast(bench_h), "h", "leftsemi")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n"))
    )
    return (
        corpus.select(
            "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
        )
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_shared_ngrams"),
            (F.coalesce("n", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    spark = get_spark(app_name="gdl-ab")
    t = tables(spark, sf_dir)
    raw = spread(spark, t.documents)
    variants = {
        "dd04_allpairs_old": _allpairs_old(raw, 0.8),
        "dd04_allpairs_new": _allpairs_jaccard_pairs(raw, 0.8),
        "dd14_old": _dd14_shape(t.documents, _windows_old),
        "dd14_new": _dd14_shape(t.documents, _dd10_windows),
    }
    for name, df in variants.items():  # warmup: codegen + JIT
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
            {
                name: {"runs": runs, "min": min(runs)}
                for name, runs in out.items()
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
