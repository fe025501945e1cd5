#!/usr/bin/env python
"""Interleaved A/B: tx09 quadratic per-type counts (old) vs sorted
run-length counts (new).  Both variants run in ONE session, alternated
round-robin so host throttle windows land on both sides; per-variant
MIN over N rounds is the reported statistic (bench methodology).
Also asserts output equivalence via exceptAll in both directions.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from geospatial_data_lake_spark import load_all_queries  # noqa: E402
from geospatial_data_lake_spark.session import get_spark  # noqa: E402
from geospatial_data_lake_spark.tables import spread, tables  # noqa: E402


def tx09_old(spark, sf_dir):
    t = tables(spark, sf_dir)
    tk = F.split(F.col("text"), " ")
    d = spread(spark, t.documents).select("doc_id", tk.alias("tk"))
    n = F.size("tk")
    cnts = F.transform(
        F.array_distinct("tk"),
        lambda dd: F.size(F.filter("tk", lambda x: x == dd)),
    )
    c = d.select("doc_id", n.alias("n"), cnts.alias("cnts"))
    return c.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.size("cnts").cast("bigint").alias("n_types"),
        F.round(F.size("cnts") / F.col("n"), 4).alias("type_token_ratio"),
        F.round(F.array_max("cnts") / F.col("n"), 4).alias("top_token_frac"),
        F.round(
            F.lit(1.0)
            - F.aggregate(
                F.transform("cnts", lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            / (F.col("n") * F.col("n")),
            4,
        ).alias("simpson_diversity"),
    ).orderBy("doc_id")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("SPARK_GRAFT_RUNS", "5"))
    spark = get_spark(app_name="gdl-ab-tx09")
    new_df = load_all_queries()["tx09_token_diversity"].fn(spark, sf_dir)
    old_df = tx09_old(spark, sf_dir)

    diff1 = new_df.exceptAll(old_df).count()
    diff2 = old_df.exceptAll(new_df).count()
    print(f"equivalence: new-old={diff1} old-new={diff2}")
    assert diff1 == 0 and diff2 == 0, "variants disagree"

    for df, label in ((old_df, "old"), (new_df, "new")):
        spark.sparkContext.setJobDescription(f"tx09 {label}: warmup")
        df.write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {"old": [], "new": []}
    for i in range(rounds):
        for df, label in ((old_df, "old"), (new_df, "new")):
            spark.sparkContext.setJobDescription(f"tx09 {label}: round {i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[label].append(round(time.perf_counter() - t0, 3))
    for label, runs in times.items():
        print(f"{label}: runs={runs} min={min(runs)}")
    spark.stop()


if __name__ == "__main__":
    main()
