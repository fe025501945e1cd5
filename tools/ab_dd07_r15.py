#!/usr/bin/env python
"""A/B: dd07 over the full dd04 doc-pair expansion (pre-r15) vs the
connectivity-equivalent star edge set (r15).  Each timed run includes
the dispatch, the rep verify, edge materialization, the alternating-
star contraction and the exactness gate — dd07's full construction plus
the final noop write.  Variants interleave inside one session; report
per-variant MIN."""

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
import geospatial_data_lake_spark.operators.dedup as dd  # noqa: E402


def _dd07(spark, sf_dir, edges_fn):
    pairs = edges_fn(spark, sf_dir)
    labels = dd._cc_alternating_stars(pairs)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("group_size"))
    return labels.join(F.broadcast(sizes), "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("group_id"),
        "group_size",
    )


def _edges_old(spark, sf_dir):
    t = tables(spark, sf_dir)
    raw = spread(spark, t.documents)
    if dd._is_saturated(raw):
        if raw.count() <= dd._ALLPAIRS_MAX_DOCS:
            return dd._expand_rep_pairs(
                *dd._allpairs_rep_verified(raw, 0.8)
            ).select("d1", "d2")
        return dd._exact_jaccard_pairs(raw, 0.8).select("d1", "d2")
    return dd._expand_rep_pairs(*dd._minhash_rep_verified(spark, raw)).select(
        "d1", "d2"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    spark = get_spark(app_name="gdl-ab-dd07")
    fns = {
        "dd07_pairs_old": _edges_old,
        "dd07_star_new": dd._dd04_connectivity_edges,
    }
    out = {name: [] for name in fns}
    for r in range(rounds):
        for name in fns:
            spark.sparkContext.setJobDescription(f"{name}: round {r}")
            t0 = time.perf_counter()
            _dd07(spark, sf_dir, fns[name]).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name].append(round(time.perf_counter() - t0, 3))
            print(f"# {name} r{r}: {out[name][-1]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {name: {"runs": runs, "min": min(runs)} for name, runs in out.items()}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
