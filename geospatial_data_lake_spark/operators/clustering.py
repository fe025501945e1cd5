"""Distributed k-means training — the offline step the ANN index assumes.

``ss03_ivf_ann_topk`` (similarity.py) builds its inverted lists from
deterministic seed centroids and notes that "real deployments run
k-means offline".  This module IS that offline step, expressed
Spark-first: Lloyd's algorithm as a fixed number of scan+aggregate
rounds, with the centroid table living on the driver between rounds
(k x dim doubles — bounded, tiny) and pushed back into the plan as
codegen literals.

Per-iteration shape at 100 TB:

- **assignment** is a single pass over the corpus: for each of the k
  centroids a fused ``zip_with``/``aggregate`` expression computes the
  squared distance JVM-side (no UDF, no shuffle), and ``array_min`` over
  ``struct(dist, cid)`` picks the argmin with a deterministic cid
  tie-break;
- **update** is one ``posexplode`` + ``groupBy(cid, pos).avg`` — a
  partial-aggregating shuffle of exactly k x dim cells regardless of
  corpus size (map-side combine reduces each partition to at most
  k x dim rows before the exchange);
- the driver ``collect()`` is k x dim rows per iteration — bounded by
  the model size, never by the data size, the same discipline as
  PageRank's mass probe (joins.py) and the ANN seed collects
  (similarity.py).

Determinism across engines (the oracle replays the identical fixed-
iteration schedule in DuckDB SQL, chained CTEs):

- distances fold the dimension axis left-to-right on both engines
  (Spark ``aggregate`` / DuckDB ``list_sum``) and are rounded to 9 dp
  before the argmin, so assignment never depends on sub-ulp fold noise;
- updated centroid coordinates are rounded to 6 dp on both engines,
  collapsing partial-aggregation-order differences in ``avg``;
- ties in the argmin break toward the smaller cluster id on both sides.

Reference parity: the reference has no ML training surface; this is
part of the training-data-pipeline extension scope (SURVEY.md §2
"beyond the reference"), closing the loop for the IVF index
(similarity.py ss03) whose centroids it would feed.
"""

from __future__ import annotations

import math
import os
import weakref

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import session_tmpdir, tables

_K = 8  # clusters
_ITERS = 3  # Lloyd update rounds (fixed schedule => replayable oracle)
_DIM = 64  # embedding dimensionality (embeddings.parquet contract)


def _sq_expr(vec: str, cent: str, dim: int = _DIM) -> str:
    """DuckDB squared-L2 between two list expressions, folded in index
    order (list_sum) and rounded to 9 dp — the oracle twin of
    ``_sq_dist_to``."""
    return (
        f"round(list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> ({vec}[i] - {cent}[i]) * ({vec}[i] - {cent}[i]))), 9)"
    )


def _kmeans_cte_prefix(k: int = _K, iters: int = _ITERS, dim: int = _DIM) -> tuple[str, str]:
    """The shared WITH-clause replaying the Lloyd schedule: CTEs
    ``v`` (corpus as double lists), ``c0`` (seeds), ``a{i}``/``c{i}``
    per iteration, and ``afin`` (final assignment with distances).
    Returns (with_clause, final_centroid_cte_name)."""
    sq = _sq_expr("v.v", "c.c", dim)
    parts = [
        f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (
  SELECT vec_id AS cid, v AS c FROM v WHERE vec_id < {k}
)"""
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append(
            f""",
a{it} AS (
  SELECT vec_id, v, cid FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (
      SELECT v.vec_id, v.v, c.cid, {sq} AS dist
      FROM v CROSS JOIN {prev} c))
  WHERE rn = 1
),
c{it} AS (
  SELECT cid, list(val ORDER BY pos) AS c FROM (
    SELECT a.cid, p.pos, round(avg(a.v[p.pos]), 6) AS val
    FROM a{it} a CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS pos) p
    GROUP BY a.cid, p.pos)
  GROUP BY cid
)"""
        )
        prev = f"c{it}"
    parts.append(
        f""",
afin AS (
  SELECT vec_id, v, cid, dist FROM (
    SELECT vec_id, v, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (
      SELECT v.vec_id, v.v, c.cid, {sq} AS dist
      FROM v CROSS JOIN {prev} c))
  WHERE rn = 1
)"""
    )
    return "".join(parts), prev


def _kmeans_oracle(k: int = _K, iters: int = _ITERS, dim: int = _DIM) -> str:
    """DuckDB replay of the identical fixed-iteration Lloyd schedule:
    chained CTEs c0 -> a1/c1 -> ... -> afin, same 9-dp distance round,
    same 6-dp centroid round, same (dist, cid) tie-break."""
    prefix, _ = _kmeans_cte_prefix(k, iters, dim)
    return (
        prefix
        + """
SELECT cid AS cluster, CAST(count(*) AS BIGINT) AS n_members,
       round(avg(dist), 4) AS avg_sq_dist
FROM afin GROUP BY cid ORDER BY cluster"""
    )


def _sq_dist_to(centroid: list[float]) -> Column:
    """Squared L2 distance from column ``v`` to a literal centroid —
    a fused higher-order expression, folded left-to-right like the
    oracle's ``list_sum``, rounded to 9 dp before any comparison."""
    c = F.array(*[F.lit(x) for x in centroid])
    return F.round(
        F.aggregate(
            F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
        9,
    )


# Above this cluster count, nearest-centroid assignment switches from
# the fused-expression path to the vectorized numpy path: the
# expression path builds k distance folds in ONE literal array —
# exactly replayable by the SQL oracle, ideal for the pinned k<=8
# queries — but the plan itself becomes the bottleneck at sd02's
# production auto-k (k ~ N/32: thousands of 64-term folds blow past
# whole-stage-codegen limits and compile for minutes before a single
# row moves).
_EXPR_ASSIGN_MAX_K = 64


def _assign(df: DataFrame, cents: dict[int, list[float]]) -> DataFrame:
    """Nearest-centroid assignment: argmin via ``array_min`` over
    ``struct(dist, cid)`` (lexicographic struct order = dist then cid,
    matching the oracle's ``ORDER BY dist, cid``).  Above
    ``_EXPR_ASSIGN_MAX_K`` centroids the same contract runs on the
    vectorized path (``_assign_vectorized``) — identical (dist, cid)
    ordering and 9-dp rounding, matmul speed instead of
    expression-tree speed."""
    if len(cents) > _EXPR_ASSIGN_MAX_K:
        return _assign_vectorized(df, cents)
    structs = [
        F.struct(_sq_dist_to(cv).alias("dist"), F.lit(cid).alias("cid"))
        for cid, cv in sorted(cents.items())
    ]
    best = F.array_min(F.array(*structs))
    return df.select(
        "vec_id", "v", best["cid"].alias("cid"), best["dist"].alias("dist")
    )


def _assign_vectorized(
    df: DataFrame, cents: dict[int, list[float]]
) -> DataFrame:
    """``_assign`` for PRODUCTION cluster counts: broadcast the
    centroid MATRIX (k x dim floats — model-sized) into a mapInPandas
    kernel computing the full distance block per Arrow batch via the
    |v|^2 + |c|^2 - 2 v.c identity (BLAS matmul), argmin with ties to
    the LOWEST cid — the same (dist, cid) struct order and 9-dp
    HALF_UP rounding as the expression path (emulated via
    floor(x*1e9+0.5)/1e9 on the non-negative distances; ``np.round``
    alone would be banker's half-to-even — see the in-kernel note for
    the residual binary-vs-decimal half boundary).  Row chunks are sized so the
    n x k distance block stays ~32 MB regardless of k.  O(n x k x d)
    FLOPs either way; this path runs them at matmul speed and keeps
    the PLAN size O(1) in k.  Sub-9dp float-association differences vs
    the fold are possible in principle — this path is reserved for
    audit-gated production k, never for the oracle-replayed pinned-k
    queries (which stay on the expression path by the threshold)."""
    import numpy as np
    import pandas as pd

    cids = sorted(int(c) for c in cents)
    cid_arr = np.asarray(cids, dtype=np.int64)
    C = np.asarray([cents[c] for c in cids], dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    # ~32 MB of float64 distance block per chunk, whatever k is
    chunk = max(1, 4_000_000 // len(cids))

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            V = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            v2 = (V * V).sum(axis=1)
            out_cid = np.empty(n, dtype=np.int64)
            out_dist = np.empty(n, dtype=np.float64)
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                d2 = v2[s:e, None] + c2[None, :] - 2.0 * (V[s:e] @ C.T)
                np.maximum(d2, 0.0, out=d2)  # identity can go -epsilon
                # 9-dp HALF_UP to mirror Spark's F.round (np.round is
                # banker's half-to-even; exact-half values would round
                # differently).  Values are non-negative after the
                # clamp, so floor(x*1e9 + 0.5)/1e9 is HALF_UP on the
                # BINARY double — F.round goes through BigDecimal's
                # shortest-DECIMAL repr, so a value whose decimal
                # rendering ends in an exact half that the binary
                # product lands just under can still differ by 1 ulp
                # at the 9th place.  Materially closer than banker's
                # rounding; residual divergence is confined to the
                # audit-gated k>64 paths by the dispatch threshold
                # (oracle-replayed queries never take this kernel).
                d2 *= 1e9
                np.floor(d2 + 0.5, out=d2)
                d2 /= 1e9
                idx = d2.argmin(axis=1)  # first min = lowest cid
                out_cid[s:e] = cid_arr[idx]
                out_dist[s:e] = d2[np.arange(e - s), idx]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "v": pdf["v"],
                    "cid": out_cid.astype("int32"),
                    "dist": out_dist,
                }
            )

    return df.select("vec_id", "v").mapInPandas(
        kernel, "vec_id long, v array<double>, cid int, dist double"
    )


def kmeans_fit(
    e: DataFrame, k: int = _K, iters: int = _ITERS, dim: int = _DIM
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Run ``iters`` Lloyd rounds over ``e(vec_id, v: array<double>)``;
    returns (final assignment DataFrame, trained centroids).

    Seeding is deterministic (the k lowest-id vectors) so reruns — and
    the SQL oracle — reproduce the identical trajectory.  A production
    run would swap the seed rule for k-means|| over a sample; every
    other line is unchanged."""
    seed = e.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    cents = {int(r.vec_id): [float(x) for x in r.v] for r in seed}
    for _ in range(iters):
        rows = (
            _assign(e, cents)
            .select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("val"), 6).alias("val"))
            .collect()
        )
        new: dict[int, list[float]] = {}
        for r in rows:
            new.setdefault(int(r.cid), [0.0] * dim)[int(r.pos)] = float(r.val)
        cents = new  # clusters that lost every member drop out, like the oracle
    return _assign(e, cents), cents


@register(
    "cl01_kmeans_train",
    oracle=_kmeans_oracle(),
    tags=("clustering", "pipeline", "iterative"),
)
def cl01_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 3 fixed update rounds,
    deterministic lowest-id seeding) over the embedding corpus; reports
    the final per-cluster size and mean squared distance.

    This is the offline training step ss03's IVF index presumes: its
    output centroids are exactly what ``ss03_ivf_ann_topk`` would load
    as its coarse quantizer.  See the module docstring for the
    per-iteration scale shape (one scan + one k x dim partial-agg
    shuffle per round; driver state bounded by model size)."""
    t = tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    fin, _ = kmeans_fit(e)
    return (
        fin.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.round(F.avg("dist"), 4).alias("avg_sq_dist"),
        )
        .select(
            F.col("cid").cast("bigint").alias("cluster"),
            "n_members",
            "avg_sq_dist",
        )
        .orderBy("cluster")
    )


_NPROBE = 3  # probed inverted lists per query
_N_QUERIES = 5  # query vectors (vec_id < 5, matching ss01/ss03)
_TOPK = 3  # neighbors returned per query


def _ivf_trained_oracle(
    k: int = _K, iters: int = _ITERS, dim: int = _DIM
) -> str:
    """DuckDB replay of the full trained-IVF search: the Lloyd prefix
    (shared with cl01's oracle) gives the trained centroids and the
    corpus inverted lists (afin); queries rank centroids by the same
    9-dp rounded distance, probe the top nprobe lists, and exact-rerank
    by 4-dp rounded cosine with a c_id tie-break."""
    prefix, cfin = _kmeans_cte_prefix(k, iters, dim)
    sq_q = _sq_expr("q.qv", "c.c", dim)
    dot = (
        "list_sum(list_transform(range(1, %d), i -> %s[i] * %s[i]))"
        % (dim + 1, "%s", "%s")
    )
    return (
        prefix
        + f""",
q AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE vec_id < {_N_QUERIES}),
probe AS (
  SELECT q_id, qv, cid FROM (
    SELECT q_id, qv, cid,
           row_number() OVER (PARTITION BY q_id ORDER BY dist, cid) AS rn
    FROM (
      SELECT q.q_id, q.qv, c.cid, {sq_q} AS dist
      FROM q CROSS JOIN {cfin} c))
  WHERE rn <= {_NPROBE}
),
cand AS (
  SELECT p.q_id, p.qv, a.vec_id AS c_id, a.v AS cv
  FROM probe p JOIN afin a ON a.cid = p.cid
  WHERE a.vec_id <> p.q_id
),
scored AS (
  SELECT q_id, c_id,
         round({dot % ("qv", "cv")} /
               (sqrt({dot % ("qv", "qv")}) * sqrt({dot % ("cv", "cv")})),
               4) AS cosine
  FROM cand
)
SELECT q_id, c_id, cosine, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT q_id, c_id, cosine,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, c_id) AS rnk
  FROM scored)
WHERE rnk <= {_TOPK}
ORDER BY q_id, rnk"""
    )


def _dot(a, b):
    """Left-to-right folded dot product — the oracle twin of DuckDB's
    list_sum over the elementwise product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


@register(
    "ss04_ivf_trained_ann",
    oracle=_ivf_trained_oracle(),
    tags=("similarity", "ann", "clustering", "pipeline"),
)
def ss04_ivf_trained_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate-nearest-neighbor search whose coarse quantizer is
    the cl01-TRAINED k-means codebook — the end-to-end index build +
    query pipeline (train -> assign inverted lists -> probe nprobe
    lists -> exact cosine rerank), and, unlike the seeded ss03, every
    step is deterministic codegen arithmetic, so the whole search is
    hash-gated against the DuckDB replay.

    Scale shape: training per-iteration cost is one scan + a k x dim
    partial-agg shuffle (module docstring); list assignment rides the
    final training pass; the query side broadcasts (queries x nprobe)
    probe rows into an equi-join on the list id, so the rerank touches
    ~nprobe/k of the corpus — the canonical IVF trade.  At billions of
    vectors the corpus side is bucketed by list id at write time
    (layout.py), making the probe a pruned scan instead of a shuffle."""
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    fin, cents = kmeans_fit(e)
    corpus = fin.select("vec_id", "v", "cid")
    structs = [
        F.struct(_sq_dist_to(cv).alias("dist"), F.lit(cid).alias("cid"))
        for cid, cv in sorted(cents.items())
    ]
    probed = F.slice(F.array_sort(F.array(*structs)), 1, _NPROBE)
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn(
            "cid", F.explode(F.transform(probed, lambda s: s["cid"]))
        )
        .select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "cid"
        )
    )
    cand = corpus.join(F.broadcast(q), "cid").filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored = cand.select(
        "q_id",
        F.col("vec_id").alias("c_id"),
        F.round(
            _dot(F.col("qv"), F.col("v"))
            / (
                F.sqrt(_dot(F.col("qv"), F.col("qv")))
                * F.sqrt(_dot(F.col("v"), F.col("v")))
            ),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "c_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _TOPK)
        .orderBy("q_id", "rnk")
    )


_PQ_M = 4  # subspaces
_PQ_SUB = 16  # dims per subspace (4 x 16 = 64)
_PQ_K = 4  # codewords per subspace (2-bit codes)
_PQ_ITERS = 2  # Lloyd rounds per subspace codebook


def _pq_cte_blocks(
    m: int = _PQ_M,
    sub: int = _PQ_SUB,
    k: int = _PQ_K,
    iters: int = _PQ_ITERS,
    src: str = "v0",
    include_v0: bool = True,
) -> list[str]:
    """The shared WITH-clause replaying per-subspace PQ codebook
    training: v0 (corpus), v_m{j} (slices), c_m{j}_{it} (per-iteration
    centroids), a_m{j}_fin (final code assignment per vector).  em02
    (codebook audit) and ss05 (ADC search) build on these over the raw
    corpus; ss07 reuses the identical chain over a RESIDUAL table by
    passing ``src="r0", include_v0=False``."""
    blocks = (
        [
            """
WITH v0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)"""
        ]
        if include_v0
        else []
    )
    sq = _sq_expr("v.v", "c.c", sub)
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        blocks.append(
            f""",
v_m{j} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM {src}),
c_m{j}_0 AS (SELECT vec_id AS cid, v AS c FROM v_m{j} WHERE vec_id < {k})"""
        )
        prev = f"c_m{j}_0"
        for it in range(1, iters + 1):
            blocks.append(
                f""",
a_m{j}_{it} AS (
  SELECT vec_id, v, cid FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (
      SELECT v.vec_id, v.v, c.cid, {sq} AS dist
      FROM v_m{j} v CROSS JOIN {prev} c))
  WHERE rn = 1
),
c_m{j}_{it} AS (
  SELECT cid, list(val ORDER BY pos) AS c FROM (
    SELECT a.cid, p.pos, round(avg(a.v[p.pos]), 6) AS val
    FROM a_m{j}_{it} a CROSS JOIN (SELECT unnest(range(1, {sub + 1})) AS pos) p
    GROUP BY a.cid, p.pos)
  GROUP BY cid
)"""
            )
            prev = f"c_m{j}_{it}"
        blocks.append(
            f""",
a_m{j}_fin AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (
      SELECT v.vec_id, c.cid, {sq} AS dist
      FROM v_m{j} v CROSS JOIN {prev} c))
  WHERE rn = 1
)"""
        )
    return blocks


def _pq_oracle(
    m: int = _PQ_M, sub: int = _PQ_SUB, k: int = _PQ_K, iters: int = _PQ_ITERS
) -> str:
    """DuckDB replay of per-subspace codebook training + encoding: the
    cl01 Lloyd schedule run independently on each dimension slice, then
    per-(subspace, code) cell stats."""
    blocks = _pq_cte_blocks(m, sub, k, iters)
    selects = [
        f"""SELECT CAST({j} AS BIGINT) AS subspace, cid AS code,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(avg(dist), 4) AS avg_sq_err
FROM a_m{j}_fin GROUP BY 1, 2"""
        for j in range(m)
    ]
    return (
        "".join(blocks)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY subspace, code"
    )


@register(
    "em02_product_quantization",
    oracle=_pq_oracle(),
    tags=("similarity", "compression", "clustering", "pipeline"),
)
def em02_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook training: the 64-dim embedding is
    split into 4 subspaces of 16 dims; each subspace trains its own
    k=4 Lloyd codebook (2 rounds, lowest-id seeding — the cl01 schedule
    per slice) and every vector is encoded as 4 two-bit codes.  Output
    is the per-(subspace, code) cell population and mean squared
    quantization error — the codebook-quality audit that decides
    whether the compressed index is usable (the PQ analog of em01's
    int8 reconstruction audit).

    PQ is the memory path for billion-scale ANN: 64 doubles (512 B)
    become m log2(k) = 8 bits per vector here, and asymmetric distance
    computation against the codebooks replaces full-vector arithmetic.
    Scale shape: each subspace's training is the cl01 loop on a SLICE —
    the per-iteration shuffle is k x sub cells and the m trainings are
    independent (a production run launches them concurrently; here they
    share one driver loop).  Encoding rides the final assignment pass,
    all fused codegen."""
    t = tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    outs = []
    for j in range(_PQ_M):
        em = e.select(
            "vec_id", F.slice("v", j * _PQ_SUB + 1, _PQ_SUB).alias("v")
        )
        fin, _ = kmeans_fit(em, k=_PQ_K, iters=_PQ_ITERS, dim=_PQ_SUB)
        outs.append(
            fin.groupBy("cid").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
                F.round(F.avg("dist"), 4).alias("avg_sq_err"),
            )
            .select(
                F.lit(j).cast("bigint").alias("subspace"),
                F.col("cid").cast("bigint").alias("code"),
                "n_vectors",
                "avg_sq_err",
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("subspace", "code")


# -- ss05: PQ asymmetric-distance search --------------------------------------

_ADC_NQ = 5  # query vectors (vec_id < 5 — ss01's convention)
_ADC_TOPK = 3


def _pq_adc_oracle(
    m: int = _PQ_M,
    sub: int = _PQ_SUB,
    k: int = _PQ_K,
    iters: int = _PQ_ITERS,
    n_q: int = _ADC_NQ,
    topk: int = _ADC_TOPK,
) -> str:
    """Replay of PQ training + encoding + ADC ranking: codes from
    a_m{j}_fin, codewords from the final per-subspace centroids, the
    asymmetric distance as the fixed-order sum of per-subspace
    9-dp-rounded squared distances (query slice vs codeword), top-k by
    (adc, c_id)."""
    blocks = _pq_cte_blocks(m, sub, k, iters)
    enc_joins = " JOIN ".join(
        [f"a_m0_fin f0"]
        + [f"a_m{j}_fin f{j} USING (vec_id)" for j in range(1, m)]
    )
    enc_cols = ", ".join(f"f{j}.cid AS code{j}" for j in range(m))
    cw_joins = " ".join(
        f"JOIN c_m{j}_{iters} c{j} ON c{j}.cid = e.code{j}" for j in range(m)
    )
    adc = " + ".join(
        _sq_expr(f"(q.v[{j * sub + 1}:{(j + 1) * sub}])", f"c{j}.c", sub)
        for j in range(m)
    )
    return (
        "".join(blocks)
        + f""",
enc AS (
  SELECT f0.vec_id, {enc_cols}
  FROM {enc_joins}
),
q AS (SELECT vec_id AS q_id, v FROM v0 WHERE vec_id < {n_q}),
d AS (
  SELECT q.q_id, e.vec_id AS c_id, {adc} AS adc
  FROM q CROSS JOIN enc e {cw_joins}
  WHERE q.q_id <> e.vec_id
)
SELECT q_id, c_id, round(adc, 4) AS adc_dist, CAST(rn AS BIGINT) AS rnk
FROM (
  SELECT q_id, c_id, adc,
         row_number() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS rn
  FROM d
)
WHERE rn <= {topk}
ORDER BY q_id, rnk"""
    )


def _sq_between(col: Column, centroid: list[float]) -> Column:
    """Squared L2 between an arbitrary array column and a literal
    centroid — `_sq_dist_to` generalized beyond the hardcoded ``v``
    column; same left-to-right fold and 9-dp round as the oracle."""
    c = F.array(*[F.lit(x) for x in centroid])
    return F.round(
        F.aggregate(
            F.zip_with(col, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
        9,
    )


@register(
    "ss05_pq_adc_search",
    oracle=_pq_adc_oracle(),
    tags=("similarity", "compression", "ann", "pipeline"),
)
def ss05_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ASYMMETRIC-DISTANCE top-k search — the query path the em02
    codebooks exist for, completing the quantized-ANN loop (train em02
    -> encode -> search here, as ss04 completed cl01's IVF loop):
    every corpus vector is reduced to m={_PQ_M} codes, and each query
    ranks candidates by the sum of per-subspace squared distances to
    the CODEWORDS (full-precision query vs quantized database — the
    'asymmetric' in ADC), never touching the original vectors.

    Scale shape: after training (vocab-sized driver model), encoding
    is one in-row codegen pass over the corpus; search broadcasts the
    query block and streams the encoded corpus once — per candidate
    the work is m codeword selections + m fixed-order rounded sums,
    independent of the raw dimension (the 16x arithmetic reduction
    that makes billion-scale ANN affordable; a production run also
    caches the |Q| x m x k lookup table, which this in-row form fuses
    into codegen).  At 100 TB this exhaustive-ADC form composes with
    ss04's trained-IVF probe (the FAISS IVFPQ layout): the inverted
    lists cut each query's candidate stream to nprobe lists BEFORE the
    ADC ranking, so the final per-query top-k window runs over
    list-sized, not corpus-sized, input — here the corpus is scanned
    whole because this query IS the exact-ADC oracle baseline for that
    composition.  Every step — codebooks, codes, distances, ranks —
    is deterministic arithmetic, so the entire compressed-index search
    is hash-gated, unlike seeded-projection ANN (ss02/ss03)."""
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents_per_sub = []
    for j in range(_PQ_M):
        em = e.select(
            "vec_id", F.slice("v", j * _PQ_SUB + 1, _PQ_SUB).alias("v")
        )
        _fin, cents = kmeans_fit(em, k=_PQ_K, iters=_PQ_ITERS, dim=_PQ_SUB)
        cents_per_sub.append(cents)
    enc = e
    for j, cents in enumerate(cents_per_sub):
        sl = F.slice("v", j * _PQ_SUB + 1, _PQ_SUB)
        structs = [
            F.struct(
                _sq_between(sl, cw).alias("dist"), F.lit(cid).alias("cid")
            )
            for cid, cw in sorted(cents.items())
        ]
        enc = enc.withColumn(f"code{j}", F.array_min(F.array(*structs))["cid"])
    q = e.filter(F.col("vec_id") < _ADC_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    pairs = enc.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
    adc = None
    for j, cents in enumerate(cents_per_sub):
        qsl = F.slice("qv", j * _PQ_SUB + 1, _PQ_SUB)
        dj = None
        for cid, cw in sorted(cents.items()):
            cond = F.col(f"code{j}") == cid
            term = _sq_between(qsl, cw)
            dj = F.when(cond, term) if dj is None else dj.when(cond, term)
        adc = dj if adc is None else adc + dj
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("c_id").asc())
    return (
        pairs.select("q_id", F.col("vec_id").alias("c_id"), adc.alias("adc"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ADC_TOPK)
        .select(
            "q_id",
            "c_id",
            F.round("adc", 4).alias("adc_dist"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("q_id", "rnk")
    )


# -- ss06: IVFPQ — coarse probe + ADC ranking ---------------------------------


def _ivfpq_oracle() -> str:
    """Replay of the composed index: the Lloyd prefix (coarse quantizer
    + inverted lists, shared with cl01/ss04) merged with the PQ blocks
    (codebooks + codes, shared with em02/ss05), then probe -> candidate
    -> ADC -> top-k.  Heavily-reused CTEs are MATERIALIZED — DuckDB
    inlines CTEs per reference, and this oracle references both
    training chains from two consumers each."""
    km_prefix, cfin = _kmeans_cte_prefix()
    pq = "".join(_pq_cte_blocks())
    sq_q = _sq_expr("q.qv", "c.c", _DIM)
    enc_joins = " JOIN ".join(
        ["a_m0_fin f0"]
        + [f"a_m{j}_fin f{j} USING (vec_id)" for j in range(1, _PQ_M)]
    )
    enc_cols = ", ".join(f"f{j}.cid AS code{j}" for j in range(_PQ_M))
    cw_joins = " ".join(
        f"JOIN c_m{j}_{_PQ_ITERS} cj{j} ON cj{j}.cid = e.code{j}"
        for j in range(_PQ_M)
    )
    adc = " + ".join(
        _sq_expr(
            f"(cand.qv[{j * _PQ_SUB + 1}:{(j + 1) * _PQ_SUB}])",
            f"cj{j}.c",
            _PQ_SUB,
        )
        for j in range(_PQ_M)
    )
    sql = (
        pq
        + ","
        + km_prefix.replace("\nWITH ", "\n", 1)
        + f""",
q AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE vec_id < {_N_QUERIES}),
probe AS (
  SELECT q_id, qv, cid FROM (
    SELECT q.q_id, q.qv, c.cid,
           row_number() OVER (PARTITION BY q.q_id ORDER BY {sq_q}, c.cid)
               AS rn
    FROM q CROSS JOIN {cfin} c)
  WHERE rn <= {_NPROBE}
),
enc AS MATERIALIZED (
  SELECT f0.vec_id, {enc_cols} FROM {enc_joins}
),
cand AS (
  SELECT p.q_id, p.qv, a.vec_id AS c_id
  FROM probe p JOIN afin a ON a.cid = p.cid
  WHERE a.vec_id <> p.q_id
),
d AS (
  SELECT cand.q_id, cand.c_id, {adc} AS adc
  FROM cand JOIN enc e ON e.vec_id = cand.c_id {cw_joins}
)
SELECT q_id, c_id, round(adc, 4) AS adc_dist, CAST(rn AS BIGINT) AS rnk
FROM (
  SELECT q_id, c_id, adc,
         row_number() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS rn
  FROM d)
WHERE rn <= {_ADC_TOPK}
ORDER BY q_id, rnk"""
    )
    for name in (
        ["v0 AS (", "afin AS (", f"{cfin} AS ("]
        + [f"c_m{j}_{_PQ_ITERS} AS (" for j in range(_PQ_M)]
        + [f"a_m{j}_fin AS (" for j in range(_PQ_M)]
    ):
        sql = sql.replace(name, name.replace("AS (", "AS MATERIALIZED ("), 1)
    sql = sql.replace("\nv AS (", "\nv AS MATERIALIZED (", 1)
    return sql


@register(
    "ss06_ivfpq_search",
    oracle=_ivfpq_oracle(),
    tags=("similarity", "ann", "compression", "clustering", "pipeline"),
)
def ss06_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ — the composed billion-scale ANN index (the FAISS layout):
    ss04's TRAINED coarse quantizer cuts each query's candidate stream
    to nprobe inverted lists, and ss05's PQ codes rank the survivors by
    asymmetric distance — probe cost O(nprobe/k of the corpus), per-
    candidate cost m codeword sums independent of the raw dimension,
    memory per vector m log2(k) bits.  This is exactly the composition
    ss05's docstring promises at 100 TB, realized and hash-gated
    end-to-end: coarse training, list assignment, PQ training, codes,
    probe ranking, and ADC ranking all replay in the oracle.

    (Classic IVFPQ encodes RESIDUALS v - coarse_centroid for tighter
    codes; ss07_ivfpq_residual_search IS that refinement — the
    codebooks here train on raw vectors so the PQ chain stays shared
    verbatim with em02/ss05, and the residual variant's lower
    quantization error is pinned by the recall-audit test.)"""
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    fin, coarse = kmeans_fit(e)
    corpus = fin.select("vec_id", "v", "cid")
    cents_per_sub = []
    for j in range(_PQ_M):
        em = e.select(
            "vec_id", F.slice("v", j * _PQ_SUB + 1, _PQ_SUB).alias("v")
        )
        _f, cents = kmeans_fit(em, k=_PQ_K, iters=_PQ_ITERS, dim=_PQ_SUB)
        cents_per_sub.append(cents)
    enc = corpus
    for j, cents in enumerate(cents_per_sub):
        sl = F.slice("v", j * _PQ_SUB + 1, _PQ_SUB)
        structs = [
            F.struct(
                _sq_between(sl, cw).alias("dist"), F.lit(cid).alias("cid")
            )
            for cid, cw in sorted(cents.items())
        ]
        enc = enc.withColumn(f"code{j}", F.array_min(F.array(*structs))["cid"])
    probe_structs = [
        F.struct(_sq_dist_to(cv).alias("dist"), F.lit(cid).alias("cid"))
        for cid, cv in sorted(coarse.items())
    ]
    probed = F.slice(F.array_sort(F.array(*probe_structs)), 1, _NPROBE)
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("cid", F.explode(F.transform(probed, lambda s: s["cid"])))
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "cid")
    )
    cand = enc.join(F.broadcast(q), "cid").filter(
        F.col("vec_id") != F.col("q_id")
    )
    adc = None
    for j, cents in enumerate(cents_per_sub):
        qsl = F.slice("qv", j * _PQ_SUB + 1, _PQ_SUB)
        dj = None
        for cid, cw in sorted(cents.items()):
            cond = F.col(f"code{j}") == cid
            term = _sq_between(qsl, cw)
            dj = F.when(cond, term) if dj is None else dj.when(cond, term)
        adc = dj if adc is None else adc + dj
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("c_id").asc())
    return (
        cand.select("q_id", F.col("vec_id").alias("c_id"), adc.alias("adc"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ADC_TOPK)
        .select(
            "q_id",
            "c_id",
            F.round("adc", 4).alias("adc_dist"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("q_id", "rnk")
    )


# -- ss07: residual-encoded IVFPQ ---------------------------------------------


def _ivfpq_candidates_sql() -> str:
    """The residual-IVFPQ replay's CTE chain, ending at
    ``d(q_id, c_id, adc)`` — every probed-cell candidate with its ADC
    distance.  Shared by ``_ivfpq_residual_oracle`` (ss07/ss08's final
    top-k select) and rk02's fusion oracle (which ranks ``d`` as one
    fusion arm)."""
    km_prefix, cfin = _kmeans_cte_prefix()
    pq = "".join(_pq_cte_blocks(src="r0", include_v0=False))
    sq_q = _sq_expr("q.qv", "c.c", _DIM)
    enc_joins = " JOIN ".join(
        ["a_m0_fin f0"]
        + [f"a_m{j}_fin f{j} USING (vec_id)" for j in range(1, _PQ_M)]
    )
    enc_cols = ", ".join(f"f{j}.cid AS code{j}" for j in range(_PQ_M))
    cw_joins = " ".join(
        f"JOIN c_m{j}_{_PQ_ITERS} cj{j} ON cj{j}.cid = e.code{j}"
        for j in range(_PQ_M)
    )
    adc = " + ".join(
        _sq_expr(
            f"(cand.qr[{j * _PQ_SUB + 1}:{(j + 1) * _PQ_SUB}])",
            f"cj{j}.c",
            _PQ_SUB,
        )
        for j in range(_PQ_M)
    )
    sql = (
        km_prefix
        + f""",
r0 AS (
  SELECT a.vec_id,
         list_transform(range(1, {_DIM + 1}), i -> a.v[i] - c.c[i]) AS v
  FROM afin a JOIN {cfin} c ON c.cid = a.cid
)"""
        + pq
        + f""",
q AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE vec_id < {_N_QUERIES}),
probe AS (
  SELECT q_id, qv, cid FROM (
    SELECT q.q_id, q.qv, c.cid,
           row_number() OVER (PARTITION BY q.q_id ORDER BY {sq_q}, c.cid)
               AS rn
    FROM q CROSS JOIN {cfin} c)
  WHERE rn <= {_NPROBE}
),
qres AS (
  SELECT p.q_id, p.cid,
         list_transform(range(1, {_DIM + 1}), i -> p.qv[i] - c.c[i]) AS qr
  FROM probe p JOIN {cfin} c ON c.cid = p.cid
),
enc AS MATERIALIZED (
  SELECT f0.vec_id, {enc_cols} FROM {enc_joins}
),
cand AS (
  SELECT p.q_id, p.qr, a.vec_id AS c_id
  FROM qres p JOIN afin a ON a.cid = p.cid
  WHERE a.vec_id <> p.q_id
),
d AS (
  SELECT cand.q_id, cand.c_id, {adc} AS adc
  FROM cand JOIN enc e ON e.vec_id = cand.c_id {cw_joins}
)"""
    )
    for name in (
        ["afin AS (", "r0 AS (", f"{cfin} AS ("]
        + [f"c_m{j}_{_PQ_ITERS} AS (" for j in range(_PQ_M)]
        + [f"a_m{j}_fin AS (" for j in range(_PQ_M)]
    ):
        sql = sql.replace(name, name.replace("AS (", "AS MATERIALIZED ("), 1)
    sql = sql.replace("\nWITH v AS (", "\nWITH v AS MATERIALIZED (", 1)
    return sql


def _ivfpq_residual_oracle() -> str:
    """Replay of CLASSIC residual IVFPQ: the Lloyd prefix trains the
    coarse quantizer (shared with cl01/ss04/ss06), r0 subtracts each
    vector's coarse centroid, the PQ chain (_pq_cte_blocks with
    src="r0") trains codebooks ON THE RESIDUALS, and the query side
    re-derives the per-probed-cell query residual before the ADC sums —
    the FAISS IndexIVFPQ encoding, where codes capture the within-cell
    displacement instead of absolute position (tighter codes at equal
    bits).  Residual arithmetic is plain double subtraction of
    6-dp-rounded centroids from parquet doubles, identical across
    engines, so the whole composition stays hash-gated."""
    return (
        _ivfpq_candidates_sql()
        + f"""
SELECT q_id, c_id, round(adc, 4) AS adc_dist, CAST(rn AS BIGINT) AS rnk
FROM (
  SELECT q_id, c_id, adc,
         row_number() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS rn
  FROM d)
WHERE rn <= {_ADC_TOPK}
ORDER BY q_id, rnk"""
    )


def _cent_array_for(cid_col: Column, cents: dict[int, list[float]]) -> Column:
    """The centroid ARRAY for a per-row cluster id — a codegen CASE
    chain over the (model-sized) trained centroids, used to form
    residuals in-row without a join."""
    expr = None
    for cid, cv in sorted(cents.items()):
        arr = F.array(*[F.lit(x) for x in cv])
        expr = (
            F.when(cid_col == cid, arr)
            if expr is None
            else expr.when(cid_col == cid, arr)
        )
    return expr


@register(
    "ss07_ivfpq_residual_search",
    oracle=_ivfpq_residual_oracle(),
    tags=("similarity", "ann", "compression", "clustering", "pipeline"),
)
def ss07_ivfpq_residual_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIDUAL-encoded IVFPQ — ss06 upgraded to the classic FAISS
    IndexIVFPQ encoding: PQ codebooks train on ``v − coarse_centroid(v)``
    and queries rank by ADC against the PER-PROBED-CELL query residual
    ``q − centroid(cell)``.  Residuals cluster tightly around the origin
    regardless of which coarse cell a vector landed in, so the same
    m·log2(k) bits quantize a much smaller spread — the recall-at-
    equal-bits refinement the ss06 docstring deferred (see the
    recall-audit test comparing both against the exact-L2 ground
    truth).

    Scale shape is ss06's unchanged: training state is model-sized
    (k×dim coarse + m×k×sub codebooks on the driver), residual
    formation and encoding are one fused in-row pass over the corpus
    (the CASE chain over centroids is codegen, no join), the probe cuts
    each query to nprobe inverted lists, and per-candidate ADC work is
    m codeword sums independent of the raw dimension.  The only new
    arithmetic is a zip-subtract before slicing — double subtraction of
    6-dp centroid literals, deterministic on both engines, so the full
    residual pipeline hash-gates at every scale."""
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    fin, coarse = kmeans_fit(e)
    corpus = fin.select("vec_id", "v", "cid").withColumn(
        "r",
        F.zip_with(
            "v", _cent_array_for(F.col("cid"), coarse), lambda x, y: x - y
        ),
    )
    cents_per_sub = []
    for j in range(_PQ_M):
        rm = corpus.select(
            "vec_id", F.slice("r", j * _PQ_SUB + 1, _PQ_SUB).alias("v")
        )
        _f, cents = kmeans_fit(rm, k=_PQ_K, iters=_PQ_ITERS, dim=_PQ_SUB)
        cents_per_sub.append(cents)
    enc = corpus
    for j, cents in enumerate(cents_per_sub):
        sl = F.slice("r", j * _PQ_SUB + 1, _PQ_SUB)
        structs = [
            F.struct(
                _sq_between(sl, cw).alias("dist"), F.lit(cid).alias("cid")
            )
            for cid, cw in sorted(cents.items())
        ]
        enc = enc.withColumn(f"code{j}", F.array_min(F.array(*structs))["cid"])
    probe_structs = [
        F.struct(_sq_dist_to(cv).alias("dist"), F.lit(cid).alias("cid"))
        for cid, cv in sorted(coarse.items())
    ]
    probed = F.slice(F.array_sort(F.array(*probe_structs)), 1, _NPROBE)
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("cid", F.explode(F.transform(probed, lambda s: s["cid"])))
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "cid")
        .withColumn(
            "qr",
            F.zip_with(
                "qv",
                _cent_array_for(F.col("cid"), coarse),
                lambda x, y: x - y,
            ),
        )
    )
    cand = enc.join(F.broadcast(q), "cid").filter(
        F.col("vec_id") != F.col("q_id")
    )
    adc = None
    for j, cents in enumerate(cents_per_sub):
        qsl = F.slice("qr", j * _PQ_SUB + 1, _PQ_SUB)
        dj = None
        for cid, cw in sorted(cents.items()):
            cond = F.col(f"code{j}") == cid
            term = _sq_between(qsl, cw)
            dj = F.when(cond, term) if dj is None else dj.when(cond, term)
        adc = dj if adc is None else adc + dj
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("c_id").asc())
    return (
        cand.select("q_id", F.col("vec_id").alias("c_id"), adc.alias("adc"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ADC_TOPK)
        .select(
            "q_id",
            "c_id",
            F.round("adc", 4).alias("adc_dist"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("q_id", "rnk")
    )


# -- ss08: persisted IVFPQ index — build once, search from the store ----------

# {SparkSession -> {sf_dir -> (codes, model)}}: weak session keys, like
# tables._MEMO — id(spark) can be REUSED after a session is GC'd, which
# would serve a dead session's index handles to a new session.
_IVFPQ_STORE: "weakref.WeakKeyDictionary[SparkSession, dict[str, tuple]]" = (
    weakref.WeakKeyDictionary()
)


def encode_with_ivfpq_model(
    e: DataFrame,
    coarse: dict[int, list[float]],
    cents_per_sub: list[dict[int, list[float]]],
) -> DataFrame:
    """Encode ``e(vec_id, v)`` against an ALREADY-TRAINED residual-IVFPQ
    model: assign the coarse cell, form the residual, pick the argmin
    codeword per subspace — one fused in-row codegen pass, shared by the
    index build and incremental maintenance so a vector encodes
    identically whichever path wrote it."""
    enc = _assign(e, coarse).select("vec_id", "v", "cid").withColumn(
        "r",
        F.zip_with(
            "v", _cent_array_for(F.col("cid"), coarse), lambda x, y: x - y
        ),
    )
    for j, cents in enumerate(cents_per_sub):
        sl = F.slice("r", j * _PQ_SUB + 1, _PQ_SUB)
        structs = [
            F.struct(
                _sq_between(sl, cw).alias("dist"), F.lit(cid).alias("cid")
            )
            for cid, cw in sorted(cents.items())
        ]
        enc = enc.withColumn(f"code{j}", F.array_min(F.array(*structs))["cid"])
    return enc.select("vec_id", "cid", *[f"code{j}" for j in range(_PQ_M)])


def append_to_ivfpq_index(
    codes, model, batch: DataFrame, txn: tuple[str, int] | None = None
) -> int:
    """INCREMENTAL index maintenance — the ingest path of a production
    ANN deployment: new vectors are encoded against the STORED model
    (no retraining; coarse assignment + residual PQ codes in one
    codegen pass) and MERGEd into the codes table by vec_id, landing in
    their inverted-list partitions (O(touched partitions), snapshot-
    isolated, re-sending a batch is a no-op state-wise).  Periodic
    retraining remains a rebuild — exactly FAISS's add/train split.
    The shared build stamp is validated first: appending to a codes
    table with a mismatched model would corrupt the index.

    ``txn=(app_id, batch_version)`` passes through to the MERGE for
    per-writer idempotency — the contract a streaming index-maintenance
    sink needs when Structured Streaming replays a micro-batch after a
    crash (st05)."""
    coarse, cents_per_sub = load_ivfpq_model(model, codes=codes)
    return codes.upsert(
        encode_with_ivfpq_model(batch, coarse, cents_per_sub), txn=txn
    )


def build_ivfpq_index(spark: SparkSession, sf_dir: str, root: str):
    """TRAIN the residual-IVFPQ model once and PERSIST it as lake
    tables — the index-build job of a production ANN deployment:

    - ``codes``: one row per corpus vector ``(vec_id, cid, code0..m)``,
      PARTITIONED BY the coarse cell id — the IVF inverted lists ARE
      the table's partitions, so an nprobe search is a partition-pruned
      read, not a scan;
    - ``model``: the coarse centroids + per-subspace codebooks
      (model-sized — k x dim + m x k x sub rows).

    Returns (codes_table, model_table)."""
    from geospatial_data_lake_spark.sources.manifest_table import (
        ManifestTable,
    )

    e = tables(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    fin, coarse = kmeans_fit(e)
    corpus = fin.select("vec_id", "v", "cid")
    res = corpus.withColumn(
        "r",
        F.zip_with(
            "v", _cent_array_for(F.col("cid"), coarse), lambda x, y: x - y
        ),
    )
    cents_per_sub = []
    for j in range(_PQ_M):
        rm = res.select(
            "vec_id", F.slice("r", j * _PQ_SUB + 1, _PQ_SUB).alias("v")
        )
        _f, cents = kmeans_fit(rm, k=_PQ_K, iters=_PQ_ITERS, dim=_PQ_SUB)
        cents_per_sub.append(cents)
    enc = encode_with_ivfpq_model(e, coarse, cents_per_sub)
    codes = ManifestTable(
        spark,
        os.path.join(root, "codes"),
        key_cols=["vec_id"],
        partition_by=["cid"],
    )
    codes.append(
        enc.select(
            "vec_id", "cid", *[f"code{j}" for j in range(_PQ_M)]
        )
    )
    model = ManifestTable(
        spark,
        os.path.join(root, "model"),
        key_cols=["kind", "subspace", "cid"],
        partition_by=["kind"],
    )
    rows = [
        ("coarse", -1, cid, [float(x) for x in cv])
        for cid, cv in sorted(coarse.items())
    ] + [
        ("pq", j, cid, [float(x) for x in cw])
        for j, cents in enumerate(cents_per_sub)
        for cid, cw in sorted(cents.items())
    ]
    model.append(
        spark.createDataFrame(
            rows, "kind string, subspace int, cid int, c array<double>"
        )
    )
    # stamp BOTH tables with a shared build id (deterministic content
    # hash of the trained model) — load-side validation fails loudly on
    # a stale or mismatched model/codes pairing instead of silently
    # decoding codes against the wrong codebooks
    import hashlib

    build_id = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    codes.set_property(_IVFPQ_STAMP_KEY, build_id)
    model.set_property(_IVFPQ_STAMP_KEY, build_id)
    return codes, model


_IVFPQ_STAMP_KEY = "ivfpq.build_id"


def load_ivfpq_model(model, codes=None) -> tuple[dict, list[dict]]:
    """Read the persisted model back into driver literals (model-sized
    collect — the 'load the index metadata' step of every ANN server).

    When ``codes`` is given, the two tables' ``ivfpq.build_id`` stamps
    must agree — a codes table paired with a retrained or foreign model
    would decode every code against the wrong codebooks (silently wrong
    distances), so a mismatch raises instead."""
    if codes is not None:
        ms = model.properties().get(_IVFPQ_STAMP_KEY)
        cs = codes.properties().get(_IVFPQ_STAMP_KEY)
        if ms != cs:
            raise ValueError(
                f"IVFPQ model/codes build stamps disagree "
                f"(model={ms!r}, codes={cs!r}): the pairing is stale — "
                f"rebuild the index or load the matching tables"
            )
    coarse: dict[int, list[float]] = {}
    per_sub: list[dict[int, list[float]]] = [{} for _ in range(_PQ_M)]
    for r in model.read().collect():
        if r.kind == "coarse":
            coarse[int(r.cid)] = [float(x) for x in r.c]
        else:
            per_sub[int(r.subspace)][int(r.cid)] = [float(x) for x in r.c]
    return coarse, per_sub


def delete_from_ivfpq_index(codes, vec_ids: list[int]) -> int:
    """Remove vectors from the served index IN INDEX TERMS — an
    equality-delete commit against the codes table (O(deleted keys),
    no partition rewrite; see ``ManifestTable.delete_where_eq``), so
    the next search's pruned read anti-joins them out: deleted vectors
    can never surface as candidates.  The FAISS remove_ids analog,
    with lake merge-on-read semantics instead of list compaction."""
    return codes.delete_where_eq(F.col("vec_id").isin(vec_ids))


def _ivfpq_store(spark: SparkSession, sf_dir: str):
    import tempfile

    per_session = _IVFPQ_STORE.setdefault(spark, {})
    if sf_dir not in per_session:
        root = session_tmpdir(spark, "gdl_ivfpq_idx_")
        per_session[sf_dir] = build_ivfpq_index(spark, sf_dir, root)
    return per_session[sf_dir]


@register(
    "ss08_persisted_ivfpq_search",
    oracle=_ivfpq_residual_oracle(),
    tags=("similarity", "ann", "compression", "lake", "pipeline"),
)
def ss08_persisted_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ss07's residual-IVFPQ search served FROM A PERSISTED INDEX — the
    production deployment split: ``build_ivfpq_index`` trains once and
    stores codes + model as lake tables; this query performs NO
    training — it loads the model-sized codebooks from the store and
    probes the codes table, whose partitions ARE the inverted lists, so
    the probed cell set is ONE PARTITION-PRUNED read
    (``read(where={"cid": [..]})`` — the IN-list data-skipping spec
    plans a single scan over just the files admitting any probed cid)
    — at a billion vectors the search touches nprobe/k of the files,
    enforced by manifest partition pruning rather than a filter over a
    full scan (pruning pinned by the planned_files unit test).  Same
    oracle as ss07: identical results must come out of the stored index
    as out of the inline pipeline — any training/persist/reload drift
    breaks the hash.

    Scale shape: index build amortizes over every later query set (the
    vb03/tx10 persist-then-serve discipline); the search is nprobe
    pruned scans + a broadcast of (queries x nprobe) residual rows +
    m codeword CASE sums per candidate; driver state is model-sized."""
    from pyspark.sql import Window

    cand = _ivfpq_adc_candidates(spark, sf_dir)
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("c_id").asc())
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ADC_TOPK)
        .select(
            "q_id",
            "c_id",
            F.round("adc", 4).alias("adc_dist"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("q_id", "rnk")
    )


def _ivfpq_adc_candidates(
    spark: SparkSession, sf_dir: str, store: tuple | None = None
) -> DataFrame:
    """The persisted-index probe shared by ss08/ss09/st05:
    stamp-validated model load, IN-list pruned codes read, broadcast
    residual query block, per-candidate residual ADC sum.  Returns
    (q_id, c_id, adc) for every candidate in the probed cells.
    ``store`` overrides the session index (st05 probes its own
    stream-maintained codes table)."""
    codes, model = store if store is not None else _ivfpq_store(spark, sf_dir)
    coarse, cents_per_sub = load_ivfpq_model(model, codes=codes)
    e = tables(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    probe_structs = [
        F.struct(_sq_dist_to(cv).alias("dist"), F.lit(cid).alias("cid"))
        for cid, cv in sorted(coarse.items())
    ]
    probed = F.slice(F.array_sort(F.array(*probe_structs)), 1, _NPROBE)
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("cid", F.explode(F.transform(probed, lambda s: s["cid"])))
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "cid")
        .withColumn(
            "qr",
            F.zip_with(
                "qv",
                _cent_array_for(F.col("cid"), coarse),
                lambda x, y: x - y,
            ),
        )
    )
    # the probed cell set is (queries x nprobe)-bounded: collect it and
    # read ONLY those partitions from the stored index — ONE IN-list
    # pruned scan (read plans just the files whose stats admit any
    # probed cid), not a union of per-cell scan subtrees
    probed_cids = sorted(
        {int(r.cid) for r in q.select("cid").distinct().collect()}
    )
    enc = codes.read(where={"cid": probed_cids})
    cand = enc.join(F.broadcast(q), "cid").filter(
        F.col("vec_id") != F.col("q_id")
    )
    adc = None
    for j, cents in enumerate(cents_per_sub):
        qsl = F.slice("qr", j * _PQ_SUB + 1, _PQ_SUB)
        dj = None
        for cid, cw in sorted(cents.items()):
            cond = F.col(f"code{j}") == cid
            term = _sq_between(qsl, cw)
            dj = F.when(cond, term) if dj is None else dj.when(cond, term)
        adc = dj if adc is None else adc + dj
    return cand.select("q_id", F.col("vec_id").alias("c_id"), adc.alias("adc"))


# -- ss09: refined IVFPQ search — exact rerank of the ADC shortlist ----------

_REFINE_K = 8  # ADC shortlist size fed to the exact reranker


def _ivfpq_refined_oracle() -> str:
    """ss08's residual-IVFPQ replay with the REFINE tail: ADC ranks a
    shortlist of {_REFINE_K}, the shortlist joins back to the RAW
    vectors, and exact L2 (the same 9-dp-rounded fold as every other
    distance here) re-ranks the final top-{_ADC_TOPK}."""
    base = _ivfpq_residual_oracle()
    old_tail = f"""
SELECT q_id, c_id, round(adc, 4) AS adc_dist, CAST(rn AS BIGINT) AS rnk
FROM (
  SELECT q_id, c_id, adc,
         row_number() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS rn
  FROM d)
WHERE rn <= {_ADC_TOPK}
ORDER BY q_id, rnk"""
    sq_exact = _sq_expr("q.qv", "cv.v", _DIM)
    new_tail = f""",
shortlist AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS rn
    FROM d)
  WHERE rn <= {_REFINE_K}
),
ex AS (
  SELECT s.q_id, s.c_id, {sq_exact} AS ex_dist
  FROM shortlist s
  JOIN q ON q.q_id = s.q_id
  JOIN v cv ON cv.vec_id = s.c_id
)
SELECT q_id, c_id, round(ex_dist, 4) AS exact_dist, CAST(rn AS BIGINT) AS rnk
FROM (
  SELECT q_id, c_id, ex_dist,
         row_number() OVER (PARTITION BY q_id ORDER BY ex_dist, c_id) AS rn
  FROM ex)
WHERE rn <= {_ADC_TOPK}
ORDER BY q_id, rnk"""
    if not base.endswith(old_tail):  # not assert: must survive python -O
        raise RuntimeError(
            "_ivfpq_residual_oracle tail drifted; refusing to splice "
            "ss09 oracle SQL onto an unexpected base"
        )
    return base[: -len(old_tail)] + new_tail


@register(
    "ss09_ivfpq_refined_search",
    oracle=_ivfpq_refined_oracle(),
    tags=("similarity", "ann", "compression", "lake", "refine"),
)
def ss09_ivfpq_refined_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ss08's persisted-index search with an EXACT-RERANK refine step —
    the FAISS IndexRefineFlat pattern every production ANN serving
    stack uses to buy back quantization error: the compressed index
    cheaply ranks an ADC shortlist (k'={_REFINE_K}), only those
    shortlist ids join back to the RAW vector table, and exact L2
    re-ranks the final top-{_ADC_TOPK}.  Output distances are TRUE
    distances (reportable to users), while the expensive exact
    arithmetic touches shortlist-sized data only.

    Scale shape: everything up to the shortlist is ss08's plan (one
    IN-list partition-pruned codes read, broadcast residual block,
    codegen ADC); the refine adds ONE equi-join of a (queries x k')-row
    shortlist — broadcastable by construction — against the vector
    table, then a per-query top-k window over (queries x k') rows.
    At a billion vectors the raw-vector side is the only big table
    touched, and only through a broadcast-hash probe of k' ids per
    query — no shuffle of the corpus, no full-scan rerank."""
    from pyspark.sql import Window

    cand = _ivfpq_adc_candidates(spark, sf_dir)
    w_adc = Window.partitionBy("q_id").orderBy(
        F.col("adc").asc(), F.col("c_id").asc()
    )
    shortlist = (
        cand.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= _REFINE_K)
        .select("q_id", "c_id")
    )
    e = tables(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    ex = (
        e.join(
            F.broadcast(shortlist), e.vec_id == shortlist.c_id
        )
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "c_id",
            F.round(
                F.aggregate(
                    F.zip_with("qv", "v", lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ),
                9,
            ).alias("ex_dist"),
        )
    )
    w_ex = Window.partitionBy("q_id").orderBy(
        F.col("ex_dist").asc(), F.col("c_id").asc()
    )
    return (
        ex.withColumn("rnk", F.row_number().over(w_ex))
        .filter(F.col("rnk") <= _ADC_TOPK)
        .select(
            "q_id",
            "c_id",
            F.round("ex_dist", 4).alias("exact_dist"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("q_id", "rnk")
    )


# -- rk02: production hybrid fusion — persisted-index arm + sketch arm -------


def _rk02_fusion_oracle() -> str:
    """rk01's reciprocal-rank fusion replayed over the PRODUCTION arms:
    the residual-IVFPQ candidate chain (``_ivfpq_candidates_sql`` —
    identical CTEs to ss07/ss08's proven oracle) ranked by ADC distance
    as arm one, the integer sign-sketch hamming ranking (rk01/ss10's
    exact convention) as arm two, fused by 1/(60+rank) sums."""
    return (
        _ivfpq_candidates_sql()
        + f""",
adcr AS (
  SELECT q_id, c_id,
         row_number() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS ra
  FROM d
),
bw AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(generate_series(0, 31),
             i -> CASE WHEN v[i + 1] > 0
                  THEN 1::BIGINT << i ELSE 0::BIGINT END))
             AS BIGINT) AS w0,
         CAST(list_sum(list_transform(generate_series(32, 63),
             i -> CASE WHEN v[i + 1] > 0
                  THEN 1::BIGINT << (i - 32) ELSE 0::BIGINT END))
             AS BIGINT) AS w1
  FROM v
),
bqw AS (SELECT * FROM bw WHERE vec_id < {_N_QUERIES}),
hamr AS (
  SELECT q_id, c_id,
         row_number() OVER (
             PARTITION BY q_id ORDER BY hamming, c_id) AS rh
  FROM (
      SELECT qw.vec_id AS q_id, c.vec_id AS c_id,
             CAST(bit_count(xor(qw.w0, c.w0))
                  + bit_count(xor(qw.w1, c.w1)) AS BIGINT) AS hamming
      FROM bqw qw JOIN bw c ON c.vec_id != qw.vec_id)
),
fused AS (
  SELECT coalesce(a.q_id, h.q_id) AS q_id,
         coalesce(a.c_id, h.c_id) AS c_id,
         coalesce(1.0 / (60 + a.ra), 0.0)
             + coalesce(1.0 / (60 + h.rh), 0.0) AS score
  FROM (SELECT * FROM adcr WHERE ra <= 16) a
  FULL OUTER JOIN (SELECT * FROM hamr WHERE rh <= 16) h
    ON a.q_id = h.q_id AND a.c_id = h.c_id
)
SELECT q_id, c_id, round(score, 6) AS rrf, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT q_id, c_id, score,
         row_number() OVER (
             PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk
  FROM fused)
WHERE rnk <= 3
ORDER BY q_id, rnk"""
    )


@register(
    "rk02_rrf_fusion_serve",
    # Exactness: arm one is ss07/ss08's hash-proven ADC ranking (double
    # folds identical across engines, c_id tie-break), arm two is the
    # integer-exact hamming ranking, and the RRF score is rk01's
    # fixed-order two-term 1/(60+rank) sum — the whole fusion replays.
    oracle=_rk02_fusion_oracle(),
    tags=("similarity", "ann", "fusion", "hybrid", "lake"),
)
def rk02_rrf_fusion_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rk01's reciprocal-rank fusion with PRODUCTION serving arms — the
    answer to rk01's own scale note (its exact-cosine arm is a
    brute-force corpus scan, x100 = 14.6 in BENCHNOTES): arm one is
    ss08's persisted residual-IVFPQ probe (IN-list partition-pruned
    codes read + broadcast residual block — touches nprobe/k of the
    index regardless of corpus size), arm two is ss10's binary sign
    sketch (16 bytes/vector, pure-codegen integer hamming — memory-
    bandwidth scan of a 32x-compressed table).  Each arm contributes
    its top-16 per query; candidates fuse by 1/(60+rank) + 1/(60+rank)
    (k=60, Cormack et al. 2009) and the fused top-3 serves.

    This is the hybrid-serving deployment shape: neither arm ever
    touches raw float vectors beyond the model-sized codebooks, both
    arms' costs are index-sized rather than corpus-sized, and the
    fusion join itself is (queries x 16)-row full-outer — vanishing.
    rk01 stays registered as the exhaustive-arm reference; the recall
    audit pins this serve against rk01's exact fusion."""
    from pyspark.sql import Window

    by_q = Window.partitionBy("q_id")
    cand = _ivfpq_adc_candidates(spark, sf_dir)
    adcr = (
        cand.withColumn(
            "ra",
            F.row_number().over(
                by_q.orderBy(F.col("adc").asc(), F.col("c_id").asc())
            ),
        )
        .filter(F.col("ra") <= 16)
        .select("q_id", "c_id", "ra")
    )
    e = tables(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    pack = (
        "aggregate(sequence({a}, {b}), 0L, (acc, i) -> acc + "
        "IF(element_at(v, i + 1) > 0D, shiftleft(1L, i - {a}), 0L))"
    )
    w = e.select(
        "vec_id",
        F.expr(pack.format(a=0, b=31)).alias("w0"),
        F.expr(pack.format(a=32, b=63)).alias("w1"),
    )
    qw = w.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    hamr = (
        w.join(F.broadcast(qw), F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            (
                F.bit_count(F.expr("qw0 ^ w0"))
                + F.bit_count(F.expr("qw1 ^ w1"))
            ).cast("bigint").alias("hamming"),
        )
        .withColumn(
            "rh", F.row_number().over(by_q.orderBy("hamming", "c_id"))
        )
        .filter(F.col("rh") <= 16)
        .select("q_id", "c_id", "rh")
    )
    fused = adcr.join(hamr, ["q_id", "c_id"], "full_outer").select(
        "q_id",
        "c_id",
        (
            F.coalesce(1.0 / (60 + F.col("ra")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rh")), F.lit(0.0))
        ).alias("score"),
    )
    return (
        fused.withColumn(
            "rnk",
            F.row_number().over(by_q.orderBy(F.desc("score"), "c_id")),
        )
        .filter(F.col("rnk") <= 3)
        .select(
            "q_id",
            "c_id",
            F.round("score", 6).alias("rrf"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("q_id", "rnk")
    )


# -- st05: streaming ANN index maintenance — delete + exactly-once re-ingest --

_IVFPQ_STREAMED: "weakref.WeakKeyDictionary[SparkSession, dict[str, tuple]]" = (
    weakref.WeakKeyDictionary()
)


def _build_streamed_ivfpq(spark: SparkSession, sf_dir: str) -> tuple:
    """The full ANN index MAINTENANCE CYCLE as a streaming pipeline:
    build the persisted residual-IVFPQ index, EVICT a quarter of the
    corpus in index terms (one equality-delete commit — FAISS
    remove_ids with lake merge-on-read semantics), then stream the
    evicted vectors back as an UNORDERED 4-micro-batch file stream:
    each micro-batch encodes against the STORED model inside
    ``append_to_ivfpq_index`` and MERGEs into its inverted-list
    partitions txn-stamped.  A second pass over the whole stream with a
    FRESH checkpoint (the crash-replay worst case: every batch
    redelivered) must mint ZERO new commits — guarded here, raising if
    idempotency ever breaks.

    Because encode-against-stored-model is deterministic, the
    maintained index must be BIT-IDENTICAL to the never-touched build —
    which is what lets st05 reuse ss08's oracle verbatim: any drift in
    delete application, the Iceberg sequence rule (re-appended rows
    must survive the older delete files), txn replay, or the encode
    path breaks the hash."""
    import tempfile

    cache = _IVFPQ_STREAMED.setdefault(spark, {})
    if sf_dir in cache:
        return cache[sf_dir]
    root = session_tmpdir(spark, "gdl_ivfpq_stream_")
    codes, model = build_ivfpq_index(spark, sf_dir, os.path.join(root, "idx"))
    codes.delete_where_eq(F.pmod(F.col("vec_id"), 4) == 3)

    e = tables(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    arrivals = e.filter(F.pmod(F.col("vec_id"), 4) == 3)
    src = os.path.join(root, "src")
    for b in range(4):  # hash-split: deliberately NOT id-ordered
        arrivals.filter(
            F.pmod(F.xxhash64(F.col("vec_id").cast("string")), 4) == b
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("vec_id long, v array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        append_to_ivfpq_index(codes, model, batch, txn=("st05", batch_id))

    (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    v_after = codes.current_version()
    # crash-replay worst case: a fresh checkpoint redelivers EVERY
    # micro-batch with the same monotone ids — all must no-op
    (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", os.path.join(root, "ckpt_replay"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    if codes.current_version() != v_after:  # survives python -O
        raise RuntimeError(
            "replayed micro-batches minted new index commits: txn "
            "idempotency broken in the streaming maintenance sink"
        )
    cache[sf_dir] = (codes, model)
    return cache[sf_dir]


@register(
    "st05_stream_ann_index_maintenance",
    oracle=_ivfpq_residual_oracle(),
    tags=("similarity", "ann", "lake", "streaming", "ingest"),
)
def st05_stream_ann_index_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING ANN INDEX MAINTENANCE end-to-end: ss08's persisted
    index loses a quarter of its vectors to an equality-delete evict,
    gets them back through an unordered exactly-once micro-batch
    stream (encode-against-stored-model per batch, txn-stamped MERGE
    into the inverted-list partitions, full crash-replay pass guarded
    to zero commits), and then serves the SAME search as the untouched
    batch build — the oracle is ss07/ss08's verbatim, so the hash gate
    certifies the whole maintenance cycle is invisible to readers:
    delete application, the sequence rule keeping re-appended rows
    alive against older delete files, deterministic re-encode, and
    replay idempotency all in one gate.

    Scale shape: each micro-batch pays O(batch x m codeword argmins) to
    encode + the table's O(touched inverted lists) MERGE — never
    corpus-sized; the serve path is ss08's IN-list partition-pruned
    single scan, unchanged."""
    from pyspark.sql import Window

    store = _build_streamed_ivfpq(spark, sf_dir)
    cand = _ivfpq_adc_candidates(spark, sf_dir, store=store)
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc").asc(), F.col("c_id").asc()
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ADC_TOPK)
        .select(
            "q_id",
            "c_id",
            F.round("adc", 4).alias("adc_dist"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("q_id", "rnk")
    )


def _semdedup_oracle(k: int = _K, iters: int = _ITERS, dim: int = _DIM) -> str:
    """DuckDB replay of the full SemDeDup pass: the shared Lloyd prefix
    (cl01/ss04's trained clusters), within-cluster ordered pairs above
    the cosine bar (unrounded compare — the dd06 convention), distinct
    higher-id members marked removed, per-cluster census."""
    prefix, _ = _kmeans_cte_prefix(k, iters, dim)
    return (
        prefix
        + """,
m AS (SELECT vec_id, v, cid FROM afin),
p AS (
  SELECT a.cid, b.vec_id AS dup_id
  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.4
  GROUP BY a.cid, b.vec_id
),
mem AS (SELECT cid, count(*) AS n_members FROM m GROUP BY cid),
rem AS (SELECT cid, count(*) AS n_removed FROM p GROUP BY cid)
SELECT CAST(mem.cid AS BIGINT) AS cluster,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(coalesce(n_removed, 0) AS BIGINT) AS n_removed,
       CAST(n_members - coalesce(n_removed, 0) AS BIGINT) AS n_kept
FROM mem LEFT JOIN rem ON mem.cid = rem.cid
ORDER BY cluster"""
    )


@register(
    "sd01_semantic_dedup",
    oracle=_semdedup_oracle(),
    tags=("dedup", "clustering", "embedding", "pipeline"),
)
def sd01_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC deduplication (the SemDeDup recipe, Abbas et al. 2023):
    k-means the embedding corpus (cl01's trained clusters, identical
    Lloyd schedule), then compare vectors ONLY within their cluster —
    higher-id members of any within-cluster pair whose cosine clears
    the 0.4 bar (dd06's threshold convention, keep-lowest-id policy)
    are marked removed; reports the per-cluster census the curation
    sign-off reads (members / removed / kept).

    This is the scale story dd06's brute-force pair join lacks: the
    quadratic compare is confined to cluster cells, so total work is
    sum(|c|^2) instead of N^2 — with k grown proportionally to corpus
    size (k ~ N/target_cell) the per-cell cost is constant and the
    pair stage is an equi-join on the cluster id, shuffle-partitioned
    by cell.  At fixture scale the build side broadcasts; at billions
    of vectors the corpus is bucketed by cid at write time (ss08's
    layout discipline) and the join co-locates without a shuffle.

    Exactness contract: cluster assignment is the cl01/ss04 replayed
    Lloyd trajectory (9-dp distances, 6-dp centroids, dist-then-cid
    tie-break); the cosine bar compares UNROUNDED doubles with
    identical left-to-right folds on both engines (dd06's proven
    convention), so the whole cluster -> pair -> census pipeline is
    hash-gated."""
    return semantic_dedup_census(
        spark,
        tables(spark, sf_dir).embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        k=_K,
    )


# Production cell-population target for auto-k SemDeDup: k ~ N / 32
# keeps the quadratic within-cell compare ~constant per cell as the
# corpus grows (the linearity contract pinned by the k-scaling
# pair-count test in tests/test_operators_unit.py).
_SD_TARGET_CELL = 32


def semdedup_auto_k(
    n_vectors: int, target_cell: int = _SD_TARGET_CELL
) -> int:
    """The production k for SemDeDup: grow cluster count with the
    corpus (k ~ N / target_cell) so per-cell population — and the
    within-cell quadratic compare — stays constant as data scales.
    Pure arithmetic on a driver-side scalar; deterministic given N."""
    return max(1, math.ceil(n_vectors / target_cell))


@register(
    "sd02_semantic_dedup_autok",
    # data-dependent k means the oracle cannot replay the Lloyd
    # trajectory (the kmeans CTE prefix bakes a literal k), so this is
    # AUDIT-gated like ss02b: the oracle recomputes the two
    # SQL-derivable scalars (corpus size, the auto-k formula) and pins
    # the census invariants — member conservation, the cluster-count
    # bound, per-cluster removal bounds — to literal TRUE.  Any drift
    # in auto-k arithmetic, cluster assignment totals, or the census
    # bookkeeping breaks the hash.
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(greatest(
                   1, CAST(ceil(count(*) / {_SD_TARGET_CELL}.0) AS BIGINT)
               ) AS BIGINT) AS k_auto,
               true AS members_conserved,
               true AS clusters_within_k,
               true AS removal_bounded
        FROM embeddings
    """,
    tags=("dedup", "clustering", "embedding", "audit"),
)
def sd02_semantic_dedup_autok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sd01's PRODUCTION arm: SemDeDup with the auto-scaled cluster
    count (``semdedup_auto_k`` — k ~ N/32) instead of sd01's pinned
    oracle-replayable k, audit-gated on the invariants SQL can verify:
    corpus size, the k formula itself, member conservation (clusters
    partition the corpus), the cluster-count bound (Lloyd can merge
    cells but never mint more than k), and per-cluster removal bounds
    (0 <= removed <= members-1 — the lowest id always survives).

    This is the knob that makes sd01's linearity claim operational at
    100 TB: fixed k turns the within-cell compare quadratic in corpus
    size, auto-k holds cell populations (and the pair-join work per
    row) constant — pinned by the k-scaling pair-count test.  The
    census machinery (budget-gated broadcast, cid-equi-join fallback)
    is sd01's, unchanged."""
    e = tables(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = e.count()  # one scalar — the same driver-side cost as cl01's seeds
    k = semdedup_auto_k(n)
    # megacell guard at 32x the target cell: untouched on healthy
    # clusterings (cells ~ target), caps the quadratic compare at
    # N x bound when the geometry degenerates (see census docstring)
    census = semantic_dedup_census(
        spark, e, k=k, max_cell_compare=32 * _SD_TARGET_CELL
    )
    return census.agg(
        F.sum("n_members").alias("members_total"),
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(
            F.when(
                (F.col("n_removed") < 0)
                | (
                    F.col("n_removed")
                    > F.greatest(F.col("n_members") - 1, F.lit(0))
                ),
                1,
            ).otherwise(0)
        ).alias("bad_removals"),
    ).select(
        F.lit(n).cast("bigint").alias("n_vectors"),
        F.lit(k).cast("bigint").alias("k_auto"),
        (F.col("members_total") == F.lit(n)).alias("members_conserved"),
        (F.col("n_clusters") <= F.lit(k)).alias("clusters_within_k"),
        (F.col("bad_removals") == 0).alias("removal_bounded"),
    )


def _embedding_broadcast_bytes(m: DataFrame) -> int:
    """Estimated replicated size of the pair-join build side: 8 bytes
    per double of ``v`` + ~64 bytes/row for (vec_id, cid, n) and array
    overhead, from ONE O(N) aggregate — the same measurement-not-guess
    seam as dd09's ``_estimated_broadcast_bytes`` (dedup.py)."""
    r = m.agg(
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum(F.size("v")), F.lit(0)).alias("cells"),
    ).first()
    return int(r.cells) * 8 + int(r.rows) * 64


def semantic_dedup_census(
    spark: SparkSession, e: DataFrame, k: int,
    max_cell_compare: int | None = None,
) -> DataFrame:
    """sd01's core with the PRODUCTION knob exposed: ``k`` scales with
    the corpus (k ~ N/target_cell) so per-cell population — and with it
    the quadratic within-cell compare — stays constant as data grows.
    The registered sd01 pins k=_K to stay oracle-replayable; the
    k-scaling linearity is pinned by a candidate-pair-count test.

    ``max_cell_compare`` is the MEGACELL guard: k-means gives no upper
    bound on cell population (degenerate geometry — e.g. a corpus with
    a dense diagonal — can dump a large fraction of all vectors into
    one cell, observed live on the x100 fixture: a handful of megacells
    turned the 'constant per-cell' compare into ~10^9 pairs pinning 32
    cores for 20+ minutes).  When set, cells ABOVE the bound have their
    pair compare confined to hash-salted sub-cells of ~bound expected
    size (salt = xxhash64(vec_id) mod ceil(|cell|/bound), derived from
    a k-row broadcast of cell sizes), capping TOTAL pair work at
    |cell| x bound per cell — N x bound overall, LINEAR in the corpus
    no matter how badly the clustering degenerates.  The price is
    honest and documented: near-dup pairs SPLIT ACROSS sub-cells of a
    megacell are missed (normal cells are untouched), which only
    sharpens SemDeDup's existing cluster-confinement approximation;
    reporting stays per ORIGINAL cell, so the census invariants
    (member conservation, cluster-count bound, removal bounds) hold
    unchanged.

    Pair-join build side is BUDGETED (dd09's discipline, dedup.py's
    ``_broadcast_budget``): under the budget the corpus replicates and
    the cell-confined compare is a BroadcastHashJoin; over it the hint
    is dropped and Spark shuffles BOTH sides on ``cid`` — the equi-key
    already in the condition — so the plan degrades to a co-partitioned
    sort-merge join, never an executor OOM.  At billions of vectors the
    corpus is bucketed by cid at write time (ss08's layout discipline)
    and that same shuffle join co-locates for free."""
    from geospatial_data_lake_spark.operators.dedup import (
        _broadcast_budget,
    )
    from geospatial_data_lake_spark.operators.similarity import (
        _dot as _cg_dot,
    )
    from geospatial_data_lake_spark.tables import spread

    fin, _ = kmeans_fit(e, k=k)
    # r16: ONE-SHOT materialization of the assignment table.  The
    # census consumes ``fin`` through four physically DIFFERENT
    # subtrees — the pair join's stream side (behind spread()'s
    # round-robin exchange), its build side (broadcast), the member
    # census aggregation, and (megacell arm) the salt table — and
    # r15's exchange-reuse hope only deduped the two identical
    # aggregation branches: the r15 runtime plan still evaluated the
    # k x dim assignment (the mapInPandas matmul at production k, the
    # dominant census cost) THREE times, plus once more eagerly in
    # ``_embedding_broadcast_bytes``.  localCheckpoint computes the
    # assignment exactly once per census invocation and every consumer
    # (including the broadcast-budget probe) reads the materialized
    # rows; values are untouched, so oracles replay unchanged.  This is
    # the same per-invocation checkpoint discipline the iterative
    # operators (dd07 components, pr01, vb02) already use — nothing is
    # reused across invocations, and kmeans_fit's training collects
    # already materialize this subtree's inputs eagerly.  Cost: one
    # write of N x (id + 64 doubles + cid + dist) rows (~30 MB at
    # sf0.1) to local block storage, vs three matmul evaluations.
    fin = fin.localCheckpoint()
    m = fin.select("vec_id", "v", "cid").withColumn(
        "n", F.sqrt(_cg_dot(F.col("v"), F.col("v")))
    )
    # ONE cell-size aggregation serves both the megacell salt (nsub)
    # and the census member counts (mem below): the pre-r15 shape
    # aggregated ``fin`` twice with different post-processing, and the
    # assignment subtree below each (scan + k x dim distance evaluation
    # — the expensive part of a census run) was recomputed per branch.
    # Identical exchange subtrees let ReusedExchange evaluate the
    # assignment once for both consumers (r15, guide §2.4).
    mem = fin.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    join_keys = ["cid"]
    if max_cell_compare is not None:
        nsub = mem.select(
            "cid",
            F.ceil(
                F.col("n_members") / F.lit(int(max_cell_compare))
            ).cast("int").alias("__nsub"),
        )
        m = m.join(F.broadcast(nsub), "cid").withColumn(
            "__salt",
            F.pmod(F.xxhash64("vec_id"), F.col("__nsub")).cast("int"),
        ).drop("__nsub")
        join_keys = ["cid", "__salt"]
    a = spread(spark, m).alias("a")
    b = m.alias("b")
    build = (
        F.broadcast(b)
        if _embedding_broadcast_bytes(m) <= _broadcast_budget(spark)
        else b
    )
    pair_cond = F.col("a.vec_id") < F.col("b.vec_id")
    for kcol in join_keys:
        pair_cond = (
            F.col(f"a.{kcol}") == F.col(f"b.{kcol}")
        ) & pair_cond
    removed = (
        a.join(build, pair_cond)
        .filter(
            _cg_dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.n") * F.col("b.n"))
            >= 0.4
        )
        .select(F.col("a.cid").alias("cid"), F.col("b.vec_id").alias("dup"))
        .distinct()
        .groupBy("cid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_removed"))
    )
    return (
        mem.join(F.broadcast(removed), "cid", "left")
        .select(
            F.col("cid").cast("bigint").alias("cluster"),
            "n_members",
            F.coalesce("n_removed", F.lit(0)).cast("bigint").alias(
                "n_removed"
            ),
            (
                F.col("n_members") - F.coalesce("n_removed", F.lit(0))
            ).cast("bigint").alias("n_kept"),
        )
        .orderBy("cluster")
    )


# -- ss12: PRODUCTION auto-k IVF — list count scales with the corpus --------

_IVF_TARGET_LIST = 256  # target vectors per inverted list
# nprobe = ceil(k / _IVF_PROBE_DIV).  r14 shipped div=4 (25% of lists
# reranked per query — honest but far above the 1-5% production IVF
# band).  The r15 sweep on the x100 fixture (k=782) measured recall@3
# vs ss01's exact top-3 at div 4/8/16/32 -> 0.933/0.933/0.933/0.933:
# the probed fraction can drop to ~3% with NO recall loss on this
# geometry, so div=32 is adopted (at the small driver SFs k<=8, nprobe
# bottoms out at 1 list and recall measured 0.867-1.0, still >= the
# 0.5 floor).  The audit test pins the fraction and the floor.
_IVF_PROBE_DIV = 32


def ivf_auto_k(n_vectors: int, target_list: int = _IVF_TARGET_LIST) -> int:
    """The production list count for an IVF index: k ~ N/target_list
    keeps per-list population — and with it the per-query rerank work
    at fixed nprobe/k fraction — constant as the corpus scales (the
    same discipline as ``semdedup_auto_k``).  Pure driver arithmetic."""
    return max(1, math.ceil(n_vectors / target_list))


@register(
    "ss12_autok_ivf_search",
    # data-dependent k means the oracle cannot replay the Lloyd
    # trajectory (the kmeans CTE prefix bakes a literal k), so this is
    # AUDIT-gated like sd02/ss02b: the oracle recomputes the
    # SQL-derivable scalars (query count, exact-pair count, the auto-k
    # formula) and pins the recall floor to literal TRUE.  Any drift in
    # the k arithmetic, the probe selection, the list assignment, or a
    # recall collapse breaks the hash.
    oracle=f"""
        SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 5)
                   AS BIGINT) AS n_queries,
               CAST((SELECT count(*) FROM embeddings WHERE vec_id < 5) * 3
                   AS BIGINT) AS n_exact_pairs,
               CAST(greatest(
                   1, CAST(ceil(count(*) / {_IVF_TARGET_LIST}.0) AS BIGINT)
               ) AS BIGINT) AS k_lists,
               true AS recall_ok
        FROM embeddings
    """,
    tags=("similarity", "ann", "ivf", "audit", "production"),
)
def ss12_autok_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ss03/ss04's PRODUCTION arm: IVF ANN with the list count scaled
    to the corpus (``ivf_auto_k`` — k ~ N/256) instead of the pinned
    oracle-replayable k=8, searched at nprobe ~ k/32 (~3% of the
    corpus reranked per query, the production IVF serving band; see
    the ``_IVF_PROBE_DIV`` sweep note) and audit-gated on recall@3 >=
    0.5 against ss01's exact top-3 plus the k formula itself.  This is the arm the vectorized assignment path
    (``_assign_vectorized``) exists for: at production k the k-struct
    expression plan is the bottleneck, and training/assignment must run
    as matmuls.

    Probe selection is DRIVER-side numpy over the trained centroid
    matrix — (queries x k x dim) FLOPs on a model-sized object, the
    same driver-state discipline as kmeans_fit's centroid update —
    then (q_id, cid) probe rows broadcast into an equi-join on the
    list id, exact-cosine rerank of ~nprobe/k of the corpus.  At
    billions of vectors the corpus side is bucketed by cid at write
    time (ss08's layout) and the probe becomes a pruned scan.

    Scale shape: training is iters x (one corpus scan + a k x dim
    partial-agg shuffle); search cost per query is k x dim driver
    FLOPs + the probed fraction of the corpus.  Constant per-list
    population means BOTH terms scale linearly with N at fixed
    nprobe/k — the canonical IVF contract, now with k following the
    corpus automatically."""
    return _autok_ivf_search(spark, sf_dir, probe_div=_IVF_PROBE_DIV)


def _autok_ivf_search(
    spark: SparkSession,
    sf_dir: str,
    probe_div: int,
    with_hits: bool = False,
) -> DataFrame:
    """ss12's body with the probe fraction explicit (nprobe =
    ceil(k / probe_div)); ``with_hits`` adds the raw hit count for the
    probe-fraction sweep/audit (the registered query keeps the stable
    4-column audit schema)."""
    import numpy as np

    from geospatial_data_lake_spark.operators.similarity import (
        _dot as _cg_dot,
    )
    from geospatial_data_lake_spark.operators.similarity import (
        ss01_cosine_topk,
    )
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = e.count()
    k = ivf_auto_k(n)
    fin, cents = kmeans_fit(e, k=k)
    cids = sorted(int(c) for c in cents)
    C = np.asarray([cents[c] for c in cids], dtype=np.float64)
    nprobe = max(1, math.ceil(len(cids) / probe_div))
    probe_rows = []
    for r in e.filter(F.col("vec_id") < 5).collect():
        qv = np.asarray(r.v, dtype=np.float64)
        d = np.round(((C - qv) ** 2).sum(axis=1), 9)
        order = np.lexsort((np.asarray(cids), d))  # dist, then cid
        for j in order[:nprobe]:
            probe_rows.append(
                (int(r.vec_id), [float(x) for x in r.v], int(cids[j]))
            )
    probe = spark.createDataFrame(
        probe_rows, "q_id long, qv array<double>, cid int"
    )
    cand = (
        fin.select("vec_id", "v", "cid")
        .join(F.broadcast(probe), "cid")
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    scored = cand.select(
        "q_id",
        F.col("vec_id").alias("c_id"),
        (
            _cg_dot(F.col("v"), F.col("qv"))
            / (
                F.sqrt(_cg_dot(F.col("v"), F.col("v")))
                * F.sqrt(_cg_dot(F.col("qv"), F.col("qv")))
            )
        ).alias("cos_raw"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_raw").desc(), F.col("c_id")
    )
    approx = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("q_id", "c_id")
    )
    exact = ss01_cosine_topk(spark, sf_dir).select("q_id", "c_id")
    hit = exact.join(approx, ["q_id", "c_id"], "left_semi")
    stats = exact.agg(
        F.countDistinct("q_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_exact_pairs"),
    ).crossJoin(F.broadcast(hit.agg(F.count(F.lit(1)).alias("n_hits"))))
    out = [
        F.col("n_queries").cast("bigint").alias("n_queries"),
        F.col("n_exact_pairs").cast("bigint").alias("n_exact_pairs"),
        F.lit(k).cast("bigint").alias("k_lists"),
        (F.col("n_hits") >= F.col("n_exact_pairs") * 0.5).alias(
            "recall_ok"
        ),
    ]
    if with_hits:
        out.append(F.col("n_hits").cast("bigint").alias("n_hits"))
    return stats.select(*out)
