#!/usr/bin/env python
"""A/B: _dd10_windows current (xxhash64 over the token-STRING slice)
vs hash-of-hashes (per-token xxhash64 once, window hash over the
12-LONG slice).  Interleaved noop-sink runs in one session (guide
§1.4); per-variant MIN reported.  Variants: the raw window derivation
(cleanest signal) and the full dd14 shape (the headliner)."""

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
from geospatial_data_lake_spark.tables import tables  # noqa: E402
from geospatial_data_lake_spark.operators.dedup import (  # noqa: E402
    _SPAN_W,
    _dd10_windows,
)
from geospatial_data_lake_spark.operators.textops import (  # noqa: E402
    gram_starts as _gram_starts,
)
from tools.ab_dedup_r15 import _dd14_shape  # noqa: E402


def _windows_hh(documents):
    tkh = documents.select(
        "doc_id",
        F.transform(F.split("text", " "), lambda tok: F.xxhash64(tok)).alias(
            "tkh"
        ),
    )
    return tkh.select(
        "doc_id",
        F.explode(
            F.transform(
                _gram_starts(F.col("tkh"), _SPAN_W),
                lambda p: F.struct(
                    p.alias("p"),
                    F.xxhash64(F.slice("tkh", p, _SPAN_W)).alias("h"),
                ),
            )
        ).alias("w"),
    ).select("doc_id", F.col("w.p").alias("p"), F.col("w.h").alias("h"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    spark = get_spark(app_name="gdl-ab-win")
    t = tables(spark, sf_dir)
    variants = {
        "windows_cur": _dd10_windows(t.documents),
        "windows_hh": _windows_hh(t.documents),
        "dd14_cur": _dd14_shape(t.documents, _dd10_windows),
        "dd14_hh": _dd14_shape(t.documents, _windows_hh),
    }
    for name, df in variants.items():
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        df.write.format("noop").mode("overwrite").save()
    out = {name: [] for name in variants}
    for r in range(rounds):
        for name, df in variants.items():
            spark.sparkContext.setJobDescription(f"{name}: round {r}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[name].append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {name: {"runs": runs, "min": min(runs)} for name, runs in out.items()}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
