"""Resumable full-registry parity sweep vs the DuckDB oracle.

Runs every registered query side-by-side with its oracle SQL at a given
scale factor (default sf0.1 — the bench scale, 10x the driver's
correctness gate), persisting one JSON checkpoint entry per query so an
interrupted sweep RESUMES instead of restarting: the heavy DuckDB
oracles (inverted-index joins, iterative replays) cost minutes each at
sf0.1, so a single-session all-or-nothing sweep does not fit a wall
clock — this one survives any number of sessions.

Usage:
    python tools/parity_sweep.py [--sf-dir DIR] [--checkpoint FILE]
                                 [--budget-secs N] [--only-failed]

Ordering: cheap oracles first, the known-heavy set last, so one session
banks the bulk of the registry before paying for the expensive tails.
Checkpoint schema: {name: {status: pass|fail|error|rows_only,
secs, rows, err}}, plus a _meta block with the sf dir and totals.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Oracle-cost waivers: queries whose DuckDB oracle is structurally
# intractable at sf0.1 (NOT a correctness doubt — each is hash-gated at
# sf0.001 by the test suite and sf0.01 by the driver/judge gates; the
# sf0.1 blowup is in the ORACLE's algorithm, not the engine's).
WAIVERS: dict[str, str] = {
    # (empty) dd07's waiver retired in r11: its oracle now computes
    # components via UNROLLED min-label propagation (linear per round,
    # convergence-guarded) instead of the quadratic recursive-CTE
    # transitive closure — measured 108 s total at sf0.1 vs >40 CPU-min
    # unfinished before.
}

# Oracles that cost minutes at sf0.1 (DuckDB inverted-index self-joins,
# iterative replays, window-heavy prefix sums) — swept last.
HEAVY = (
    "dd03_jaccard_pairs",
    "dd04_minhash_lsh_pairs",
    "dd15_canonical_dedup_decision",
    "dd06_embedding_neardup",
    "dd09_incremental_dedup",
    "dd11_indexed_incremental_dedup",
    "dd12_dispatched_incremental",
    "dd10_substring_spans",
    "cl01_kmeans_train",
    "vb02_bpe_merges",
    "ss04_ivf_trained_ann",
    "em02_product_quantization",
    "tx10_bigram_prob_score",
    "tx07_winnowing_fingerprints",
    "geo01_bbox_intersect_pairs",
    "geo04_point_in_polygon",
)


def _load_checkpoint(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _save_checkpoint(path: str, data: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--checkpoint", default="PARITY_SF01.json")
    ap.add_argument("--budget-secs", type=float, default=None)
    ap.add_argument(
        "--only-failed",
        action="store_true",
        help="re-run only fail/error entries (after a fix)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from geospatial_data_lake_spark.registry import load_all_queries
    from tests.oracle import compare

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("parity-sweep")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_all_queries()
    ckpt = _load_checkpoint(args.checkpoint)
    names = [n for n in registry if not n.startswith("_")]
    names.sort(key=lambda n: (n in HEAVY, HEAVY.index(n) if n in HEAVY else -1, n))

    t_start = time.monotonic()
    n_run = 0
    for name in names:
        prior = ckpt.get(name)
        if prior and not (
            args.only_failed and prior.get("status") in ("fail", "error")
        ):
            continue
        if args.budget_secs and time.monotonic() - t_start > args.budget_secs:
            print(f"budget reached after {n_run} queries; resume later")
            break
        spec = registry[name]
        t0 = time.monotonic()
        entry: dict = {}
        try:
            # waivers are sf0.1-only (the blowup is in the ORACLE's
            # algorithm at scale); smaller sf dirs run the full compare
            if name in WAIVERS and "sf0.1" in args.sf_dir.rstrip("/").rsplit("/", 1)[-1]:
                # run the ENGINE side (rows evidence) but skip the
                # intractable oracle, recording the documented reason
                rows = spec.fn(spark, args.sf_dir).count()
                entry = {
                    "status": "waived",
                    "rows": rows,
                    "reason": WAIVERS[name],
                }
                entry["secs"] = round(time.monotonic() - t0, 2)
                ckpt[name] = entry
                n_run += 1
                print(f"{name}: waived ({entry['secs']}s, {rows} rows)")
                _save_checkpoint(args.checkpoint, ckpt)
                continue
            df = spec.fn(spark, args.sf_dir)
            if spec.oracle is None:
                rows = df.count()
                entry = {"status": "rows_only", "rows": rows}
            else:
                compare(df, spec.oracle, args.sf_dir)
                entry = {"status": "pass"}
        except AssertionError as e:
            entry = {"status": "fail", "err": str(e)[:500]}
        except Exception as e:
            entry = {
                "status": "error",
                "err": f"{type(e).__name__}: {e}"[:500],
                "trace": traceback.format_exc()[-1000:],
            }
        entry["secs"] = round(time.monotonic() - t0, 2)
        ckpt[name] = entry
        n_run += 1
        done = sum(1 for n in names if n in ckpt)
        statuses = [v.get("status") for k, v in ckpt.items() if k != "_meta"]
        ckpt["_meta"] = {
            "sf_dir": args.sf_dir,
            "checked": done,
            "total": len(names),
            "pass": statuses.count("pass"),
            "fail": statuses.count("fail"),
            "error": statuses.count("error"),
            "rows_only": statuses.count("rows_only"),
            "waived": statuses.count("waived"),
        }
        _save_checkpoint(args.checkpoint, ckpt)
        print(f"[{done}/{len(names)}] {name}: {entry['status']} ({entry['secs']}s)")

    meta = ckpt.get("_meta", {})
    print(json.dumps(meta))
    return 0 if meta.get("fail", 0) == 0 and meta.get("error", 0) == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
