#!/usr/bin/env python
"""Time arbitrary registered queries with the noop sink (guide §1.4).

Usage::

    python tools/time_queries.py [query ...]

With no names, times every bench headliner.  One untimed warmup
(codegen+JIT), then ``$SPARK_GRAFT_RUNS`` (default 3) timed runs; prints
one JSON line with per-query [runs], median and min.  Jobs are labelled
so the timing is attributable in the UI / event logs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from geospatial_data_lake_spark import load_all_queries  # noqa: E402
from geospatial_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_RUNS", "3")))
    spark = get_spark(app_name="gdl-time")
    registry = load_all_queries()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    out = {}
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"{name}: run {i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "runs": runs,
            "median": round(statistics.median(runs), 3),
            "min": round(min(runs), 3),
        }
        print(f"# {name}: min={out[name]['min']} runs={runs}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
