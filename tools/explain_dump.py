#!/usr/bin/env python
"""Dump ``explain("formatted")`` for registered queries to files.

Usage::

    python tools/explain_dump.py OUTDIR [query ...]

With no query names, dumps every bench headliner.  Writes
``OUTDIR/<name>_<suffix>.txt`` (suffix from ``$EXPLAIN_SUFFIX``,
default ``before``).  Plan capture only — nothing is executed.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from geospatial_data_lake_spark import load_all_queries  # noqa: E402
from geospatial_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = Path(sys.argv[1])
    outdir.mkdir(parents=True, exist_ok=True)
    names = sys.argv[2:]
    suffix = os.environ.get("EXPLAIN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="gdl-explain")
    registry = load_all_queries()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
