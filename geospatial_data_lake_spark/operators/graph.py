"""Iterative graph traversal to fixpoint — SURVEY.md J6.

The reference walks the STAC link graph recursively with driver-side
cycle suppression (`backend/check_stac_metadata/utils.py:126-130`,
`traversed_urls` dedup at :129). Spark has no recursive CTE, so the
idiomatic equivalent is a bounded driver loop of frontier joins with
``dropDuplicates`` — breadth-first, each hop one distributed join.

Scale notes:
- the frontier is usually tiny relative to the edge table, so the
  frontier side is broadcast — each hop is a broadcast hash join with NO
  shuffle of the edge table;
- ``localCheckpoint`` cuts the lineage each hop, so the plan does not grow
  with depth (a 20-hop traversal would otherwise compile a 20-join plan);
- the visited set stays distributed (no driver collect); only the emptiness
  probe is an action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reachable(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_hops: int = 50,
) -> DataFrame:
    """Return the set of nodes reachable from ``seeds`` following ``edges``
    (seeds included), as a single-column DataFrame named ``node``.

    ``edges``: DataFrame with columns (src, dst). ``seeds``: single-column
    DataFrame named ``node``.
    """
    visited = seeds.select(F.col(node)).distinct().localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_hops):
        next_frontier = (
            edges.join(
                F.broadcast(frontier), on=edges[src] == frontier[node], how="inner"
            )
            .select(F.col(dst).alias(node))
            .distinct()
            .join(visited, on=node, how="left_anti")
            .localCheckpoint(eager=True)
        )
        if next_frontier.isEmpty():
            break
        visited = visited.union(next_frontier).localCheckpoint(eager=True)
        frontier = next_frontier
    return visited
