#!/usr/bin/env python
"""One-pass timing census over EVERY registered query (guide §1.1:
measure first — the bench headliners are 44 of 244; this finds hotspots
in the other 200).

For each query: t_build (the ``fn(spark, sf_dir)`` call — plan/table
construction, training collects, stream driving), t_warmup (first noop
materialization: codegen+JIT+first data pass), then
``$SPARK_GRAFT_RUNS`` (default 2) timed steady-state noop runs.
Prints one JSON line per query (resumable via --skip-done against a
previous output file) plus a sorted summary at the end.

Usage::

    python tools/registry_sweep_r15.py [--out FILE] [query ...]
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

from geospatial_data_lake_spark import load_all_queries  # noqa: E402
from geospatial_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    if args and args[0] == "--out":
        out_path = Path(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_RUNS", "2")))
    spark = get_spark(app_name="gdl-registry-sweep")
    registry = load_all_queries()
    names = args or list(registry)
    done: dict[str, dict] = {}
    if out_path and out_path.exists():
        for line in out_path.read_text().splitlines():
            try:
                rec = json.loads(line)
                done[rec["query"]] = rec
            except Exception:  # noqa: BLE001
                pass
    out_f = open(out_path, "a") if out_path else None
    results = dict(done)
    for name in names:
        if name in done:
            continue
        rec: dict = {"query": name}
        try:
            spark.sparkContext.setJobDescription(f"sweep build: {name}")
            t0 = time.perf_counter()
            df = registry[name].fn(spark, sf_dir)
            rec["t_build"] = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(f"sweep warmup: {name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            rec["t_warmup"] = round(time.perf_counter() - t0, 3)
            runs = []
            for i in range(n_runs):
                spark.sparkContext.setJobDescription(f"sweep run {i}: {name}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            rec["runs"] = runs
            rec["t_min"] = min(runs)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        line = json.dumps(rec)
        print(line, flush=True)
        if out_f:
            out_f.write(line + "\n")
            out_f.flush()
        results[name] = rec
    spark.sparkContext.setJobDescription(None)
    timed = [r for r in results.values() if "t_min" in r]
    timed.sort(key=lambda r: -(r["t_min"] + r.get("t_build", 0)))
    print("== slowest by t_min + t_build ==", file=sys.stderr)
    for r in timed[:30]:
        print(
            f"{r['query']}: min={r['t_min']} build={r.get('t_build')} "
            f"warmup={r.get('t_warmup')}",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
