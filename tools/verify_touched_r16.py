#!/usr/bin/env python
"""Oracle verification of the r16-touched queries at given SFs.

Usage: python tools/verify_touched_r16.py [sf_dir ...]
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
    "dd01_exact_dedup_summary",   # 128-bit census digest
    "dd10_substring_spans",       # 128-bit window keys
    "dd13_substring_removal",     # 128-bit window keys
    "dd14_decontamination",       # 128-bit window keys
    "pl01_training_pipeline",     # 128-bit dedup group key
    "tx10_bigram_prob_score",     # grouping-sets single model pass
    "sd01_semantic_dedup",        # census assignment localCheckpoint
    "sd02_semantic_dedup_autok",  # census assignment localCheckpoint
]


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    spark = get_spark(app_name="gdl-verify-r16")
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
    spark.stop()
    print(f"failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
