#!/usr/bin/env python
"""Benchmark runner — driver contract.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is fully materialized into a noop sink so the timing covers
scan -> shuffle -> result, not just plan construction.

Methodology: every query runs once untimed (whole-stage-codegen
compilation + JVM JIT — a per-query constant of ~0.5-3 s that is pure
compilation, not data processing, and is amortized to nothing at the
100 TB design point and in any long-lived session), then
``$SPARK_GRAFT_RUNS`` (default 3) timed steady-state runs; the
recorded per-query value is the MEDIAN and the raw values are emitted
alongside it under ``"runs"``; the per-query MIN is also recorded
(``"queries_min"``) because min-of-N is contamination-RESISTANT under
one-sided noise — on a flagged (contended) artifact, adjudicate
regressions from min, not median. The median exists because this host
shows multi-second CPU-throttle windows (see BENCHNOTES.md: r4 tx07,
r5 dd04, r6 q9/q13/q17) that have twice counterfeited regressions in a
single-shot recording — one noisy window can now distort at most one of
three runs. Data is NOT cached between runs (spark.catalog caching is
never used here); every run re-reads parquet, re-shuffles, and
re-aggregates — OS page cache on a 17 MB fixture is warm either way.
"""

from __future__ import annotations

import json
import os
import statistics
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
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_suppliers",
    "geo01_bbox_intersect_pairs",
    "geo02_point_in_bbox",
    "geo04_point_in_polygon",
    "geo05_polygon_intersect_pairs",
    "x04_centroid_udaf",
    # r11 additions: the new pipeline stages
    "dd14_decontamination",
    "sm05_mixture_quota_sample",
    "ss10_binary_quant_search",
    # r11 additions: the time-series rollup family
    "ts01_gap_fill_locf",
    "ts02_ohlc_downsample",
    "ts03_time_weighted_avg",
    # r12 addition: hybrid fusion served from production ANN arms
    "rk02_rrf_fusion_serve",
    # r14 additions: content-mode CDC over a pos-deleted duplicate-key
    # log (the changed-partition multiset diff is recomputed per run),
    # and the production auto-k IVF search (assignment + probe + rerank
    # per run; training collects happen once at plan-build time)
    "vs25_posdelete_change_feed",
    "ss12_autok_ivf_search",
]


# Fixed-cost calibration probe for the contention sentinel: a tiny
# TakeOrderedAndProject whose steady-state time is dominated by fixed
# session/scheduling cost, so ANY large drift between a start and an
# end measurement indicates the HOST changed (CPU throttle window,
# co-tenant load), not the code.  Three rounds running (r10-r12), a
# contended driver window has counterfeited a regression in the
# recorded artifact; this makes the artifact self-adjudicating.
_CALIBRATION_QUERY = "o04_topk"
_CALIBRATION_DRIFT_LIMIT = 1.5


def _calibrate(spec, spark, sf_dir, n_runs: int) -> float:
    df = spec.fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warmup
    runs = []
    for _ in range(max(3, n_runs)):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="gdl-bench")
    registry = load_all_queries()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_RUNS", "3")))
    load_start = os.getloadavg()
    calib_start = _calibrate(
        registry[_CALIBRATION_QUERY], spark, sf_dir, n_runs
    )
    # r16: per-run query-order ROTATION (r15 verdict item 5).  The fixed
    # HEADLINE order made a host-contention window at run start look
    # like a uniform regression of the join/TPC-H block (they always
    # ran first).  Rotating the starting point per invocation
    # decorrelates throttle windows from any fixed query block across
    # runs; within one invocation the timing methodology is unchanged
    # (same warmup + n_runs timed noop writes per query, consecutive).
    # The rotation used is recorded on both output lines so artifacts
    # remain comparable; SPARK_GRAFT_ROTATION pins it for A/B replay.
    rotation = int(
        os.environ.get("SPARK_GRAFT_ROTATION", str(int(time.time())))
    ) % len(HEADLINE)
    order = HEADLINE[rotation:] + HEADLINE[:rotation]
    timings: dict[str, float] = {}
    minimums: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    for name in order:
        spec = registry[name]
        df = spec.fn(spark, sf_dir)
        # warmup (untimed): whole-stage-codegen compile + JIT
        df.write.format("noop").mode("overwrite").save()
        runs: list[float] = []
        for _ in range(n_runs):
            start = time.perf_counter()
            # timed, noop sink: steady-state scan -> shuffle -> result,
            # full materialization JVM-side, no driver collect cost
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - start, 3))
        raw_runs[name] = runs
        timings[name] = round(statistics.median(runs), 3)
        minimums[name] = round(min(runs), 3)

    calib_end = _calibrate(registry[_CALIBRATION_QUERY], spark, sf_dir, n_runs)
    load_end = os.getloadavg()
    drift = round(
        max(calib_start, calib_end) / max(min(calib_start, calib_end), 1e-9),
        3,
    )
    # Per-query spread sentinel: a start/end calibration probe misses
    # contention windows that open MID-run, but those windows leave a
    # signature inside the query's own raw triple — a >3x max/min
    # spread on a >=1 s query is a flagged measurement, not a plan
    # property.  The median already absorbs one bad run; the suspect
    # list tells the reader which medians may still be inflated (two
    # bad runs out of three).
    suspects = sorted(
        name
        for name, runs in raw_runs.items()
        if max(runs) >= 1.0 and max(runs) / max(min(runs), 1e-9) > 3.0
    )
    contended = drift > _CALIBRATION_DRIFT_LIMIT or bool(suspects)

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Raw per-run values first, on their own line, for spread adjudication.
    # The compact medians-only record goes LAST so the driver's bounded
    # stdout-tail capture always contains the "metric"/"value" line
    # (r7's combined line outgrew the tail window -> parsed: null).
    print(
        json.dumps(
            {
                "raw_runs": raw_runs,
                # per-query MIN of the raw runs: contamination-RESISTANT
                # under this host's one-sided noise (a contention window
                # can only inflate a run, never deflate it), so
                # round-over-round regression adjudication should read
                # min when "contended" is set; medians remain the
                # steady-state estimate on a quiet host.  Lives on THIS
                # line (not the final compact record) so the final line
                # stays small enough for the driver's bounded
                # stdout-tail capture — r14 put it on the final line and
                # the driver recorded parsed: null (the r7 failure mode
                # all over again).
                "queries_min": minimums,
                "order_rotation": rotation,
                "order": order,
                "sf": sf_val,
                "calibration": {
                    "query": _CALIBRATION_QUERY,
                    "start_sec": calib_start,
                    "end_sec": calib_end,
                    "drift": drift,
                    "limit": _CALIBRATION_DRIFT_LIMIT,
                },
                "loadavg_start": load_start,
                "loadavg_end": load_end,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                # host-contention sentinel: True means the fixed-cost
                # calibration probe drifted >limit between the start and
                # end of this run OR some query's raw triple spread >3x
                # — treat those per-query values as suspect and
                # re-measure on a quiet box before calling them
                # regressions (see BENCHNOTES.md).
                "contended": contended,
                "calibration_drift": drift,
                "suspects": suspects,
                "order_rotation": rotation,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
