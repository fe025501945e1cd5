#!/usr/bin/env python
"""Oracle verification of the r15-touched queries at given SFs, plus the
engine-path equivalence check for _exact_jaccard_pairs (the >10k-doc
inverted-index path, not reachable through the dispatcher at bench SFs).

Usage: python tools/verify_touched_r15.py [sf_dir ...]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from geospatial_data_lake_spark import load_all_queries  # noqa: E402
from geospatial_data_lake_spark.session import get_spark  # noqa: E402
from tests import oracle  # noqa: E402

TOUCHED = [
    "dd01_exact_dedup_summary",
    "dd03_jaccard_pairs",
    "dd04_minhash_lsh_pairs",
    "dd10_substring_spans",
    "dd13_substring_removal",
    "dd14_decontamination",
    "pl01_training_pipeline",
]


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark(app_name="gdl-verify-r15")
    registry = load_all_queries()
    failures = 0
    for sf_dir in sf_dirs:
        for name in TOUCHED:
            t0 = time.perf_counter()
            try:
                oracle.compare(
                    registry[name].fn(spark, sf_dir),
                    registry[name].oracle,
                    sf_dir,
                )
                status = "MATCH"
            except Exception as e:  # noqa: BLE001
                status = f"FAIL: {e}"
                failures += 1
            print(
                f"{os.path.basename(sf_dir)} {name}: {status} "
                f"({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )

    # Engine-path equivalence: the inverted-index path must produce the
    # identical pair set as the (oracle-verified) all-pairs path.
    from geospatial_data_lake_spark.operators.dedup import (
        _allpairs_jaccard_pairs,
        _exact_jaccard_pairs,
    )
    from geospatial_data_lake_spark.tables import tables

    for sf_dir in sf_dirs:
        t = tables(spark, sf_dir)
        for thr in (0.8, 0.9):
            t0 = time.perf_counter()
            ap = _allpairs_jaccard_pairs(t.documents, thr)
            ex = _exact_jaccard_pairs(t.documents, thr)
            diff = ap.exceptAll(ex).count() + ex.exceptAll(ap).count()
            n = ap.count()
            status = "MATCH" if diff == 0 else f"FAIL: {diff} differing rows"
            if diff:
                failures += 1
            print(
                f"{os.path.basename(sf_dir)} exact-vs-allpairs@{thr}: {status} "
                f"({n} pairs, {time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
    spark.stop()
    print(f"failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
