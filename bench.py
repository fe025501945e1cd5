#!/usr/bin/env python
"""Benchmark runner — driver contract.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is fully materialized via a count-style action (foreach noop) so
the timing covers scan -> shuffle -> result, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from geospatial_data_lake_spark import load_all_queries  # noqa: E402
from geospatial_data_lake_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family, weighted toward the
# shuffle/join/window-heavy shapes that dominate at scale.
HEADLINE = [
    "j01_lookup_join_broadcast",
    "j02_fk_chain_join",
    "j03_left_outer_join",
    "j07_star_join_broadcast",
    "j09_asof_join",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_revenue",
    "a01_count_per_group",
    "a04_grouped_collect",
    "a08_rollup",
    "a10_percentiles",
    "w01_ordinal_assignment",
    "w04_lag_running_sum",
    "t01_tumbling_window",
    "t03_session_window",
    "o04_topk",
    "u01_distinct",
    "dd01_exact_dedup_summary",
    "dd04_minhash_lsh_pairs",
    "ss01_cosine_topk",
    "tx01_token_stats",
    "tx02_quality_score",
    "tx07_winnowing_fingerprints",
    "tpch_q7_nation_volume",
    "geo01_bbox_intersect_pairs",
    "geo02_point_in_bbox",
    "x04_centroid_udaf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="gdl-bench")
    registry = load_all_queries()

    # Untimed warmup: exercise scan/shuffle/broadcast/noop codepaths once so
    # per-query timings measure steady-state cost, not first-query JIT.
    warm = registry["j01_lookup_join_broadcast"].fn(spark, sf_dir)
    warm.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry[name]
        df = spec.fn(spark, sf_dir)
        start = time.perf_counter()
        # noop sink: full materialization JVM-side, no driver collect cost
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
