"""Similarity search over embedding columns.

- ss01: brute-force cosine top-k — the exactness baseline (and oracle).
- ss02: random-hyperplane LSH bucketed ANN — the scale path: candidates
  come from bucket-equi-joins, exact rerank only within candidates.

Scale analysis: brute force is O(Q x N) dot products; fine when the query
set is small and broadcastable (it is here: the probe side broadcasts, the
corpus scans once, no shuffle). For corpus-x-corpus at billions of vectors,
ss02's bucket join bounds compare counts by bucket occupancy; multiple hash
tables (L repetitions) trade recall for cost — the classic LSH knob. An IVF
variant (k-means coarse quantizer) drops in by replacing the bucket id with
the nearest-centroid id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables

_DIM = 64
_N_PLANES = 16
_SEED = 42


def _dot(x, y):
    """Fixed-dimension dot product unrolled into a flat codegen expression.

    zip_with/aggregate lambdas are evaluated interpreted (no whole-stage
    codegen for higher-order functions), which dominated the pair loop;
    the unrolled sum is pure codegen and keeps the identical left-to-right
    summation order, so results are bit-for-bit the same."""
    terms = F.lit(0.0)
    for i in range(1, _DIM + 1):
        terms = terms + F.element_at(x, i) * F.element_at(y, i)
    return terms


def _cosine_pairs(e: DataFrame, queries: DataFrame) -> DataFrame:
    """All (query, candidate) cosine similarities, query side broadcast.
    Norms are computed once per row (not once per pair): both sides carry
    a precomputed norm column into the join."""
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("cn"),
    )
    return (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
                "cos_raw"
            ),
        )
    )


@register(
    "ss01_cosine_topk",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        q AS (SELECT * FROM e WHERE vec_id < 5),
        scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                   list_cosine_similarity(q.v, c.v) AS cos_raw
            FROM q JOIN e c ON c.vec_id != q.vec_id
        ),
        ranked AS (
            SELECT q_id, c_id, cos_raw,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY cos_raw DESC, c_id
                   ) AS rnk
            FROM scored
        )
        SELECT q_id, c_id, round(cos_raw, 4) AS cosine, CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 3
    """,
    tags=("similarity", "ann", "topk"),
)
def ss01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 neighbors for query vectors (vec_id < 5).
    Dot product via zip_with/aggregate — JVM higher-order functions, no
    Python serialization. Probe side broadcast: corpus scanned once, zero
    shuffles before the per-query top-k window."""
    t = tables(spark, sf_dir)
    e = t.embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    queries = e.filter(F.col("vec_id") < 5)
    scored = _cosine_pairs(e, queries)
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("c_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("q_id", "c_id", F.round("cos_raw", 4).alias("cosine"), "rnk")
    )


def _hyperplanes() -> np.ndarray:
    rng = np.random.default_rng(_SEED)
    return rng.standard_normal((_N_PLANES, _DIM))


def _lit_dot(row) -> "F.Column":
    """Index-order fold of v[j] * literal coefficient — the list_sum
    twin (see _sig_expr); `row` is one centroid/plane as floats."""
    arr = F.array(*[F.lit(float(x)) for x in row])
    return F.aggregate(
        F.zip_with(F.col("v"), arr, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _cent_lits_sql(cents) -> str:
    """A centroid matrix as a DuckDB list-of-lists literal."""
    return (
        "["
        + ",".join(
            "[" + ",".join(repr(float(x)) for x in row) + "]"
            for row in cents
        )
        + "]"
    )


def _ivf_seed_oracle(k: int = 16, nprobe: int = 4) -> str:
    """Full DuckDB replay of ss03: the seed centroids are the k lowest-id
    corpus vectors unit-normalized — SQL-visible, so assignment (argmax
    dot against normalized seeds, dist-desc-then-cid tie-break), the
    nprobe probe, and the exact cosine rerank all replay.  Ordering by
    the raw dot equals ordering by cosine: the centroids are unit-norm
    and the vector's own norm is a positive per-row constant."""
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        seeds AS (
            SELECT vec_id AS cid,
                   list_transform(v, x -> x / sqrt(list_sum(
                       list_transform(v, y -> y * y)))) AS c
            FROM e WHERE vec_id < {k}
        ),
        d AS (
            SELECT e.vec_id, seeds.cid,
                   list_sum(list_transform(generate_series(1, 64),
                       j -> e.v[j] * seeds.c[j])) AS dotp
            FROM e CROSS JOIN seeds
        ),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (
                           PARTITION BY vec_id ORDER BY dotp DESC, cid
                       ) AS rn
                FROM d)
            WHERE rn = 1
        ),
        probe AS (
            SELECT vec_id AS q_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (
                           PARTITION BY vec_id ORDER BY dotp DESC, cid
                       ) AS rn
                FROM d WHERE vec_id < 5)
            WHERE rn <= {nprobe}
        ),
        cand AS (
            SELECT p.q_id, a.vec_id AS c_id
            FROM probe p JOIN assign a USING (cid)
            WHERE a.vec_id != p.q_id
        ),
        scored AS (
            SELECT cand.q_id, cand.c_id,
                   list_cosine_similarity(qe.v, ce.v) AS cos_raw
            FROM cand
            JOIN e qe ON qe.vec_id = cand.q_id
            JOIN e ce ON ce.vec_id = cand.c_id
        )
        SELECT q_id, c_id, round(cos_raw, 4) AS cosine,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT q_id, c_id, cos_raw,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY cos_raw DESC, c_id
                   ) AS rnk
            FROM scored)
        WHERE rnk <= 3
    """


@register(
    "ss03_ivf_ann_topk",
    # Fully oracle-replayed since the r11 continuation: assignment and
    # probe are dot-fold argmax/top-n against the SQL-visible
    # unit-normalized seed vectors with a cid tie-break, replacing the
    # numpy-matmul pandas UDFs whose SIMD summation order DuckDB could
    # not replay; ss03b's recall audit stays as supporting evidence.
    oracle=_ivf_seed_oracle(),
    tags=("similarity", "ann", "ivf"),
)
def ss03_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF coarse quantization: k=16 centroids (deterministic seed
    vectors, unit-normalized), every corpus vector assigned to its nearest
    centroid (inverted list), each query probes its nprobe=4 nearest lists,
    exact cosine rerank within the probed lists only.

    Scale analysis: the corpus is scanned once to assign lists; the
    candidate join is an equi-join on the list id, so compare count drops
    from O(Q x N) to O(Q x N x nprobe/k). At billions of vectors the
    centroids come from an offline k-means sample and the corpus side is
    pre-partitioned (bucketed) by list id, so a probe touches only
    nprobe/k of the data — the canonical IVF trade."""
    t = tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # Deterministic "training": the k lowest-id vectors are the seeds.
    # (Real deployments run k-means offline; the engine-side plumbing —
    # assignment, inverted lists, probe join, rerank — is identical.)
    k, nprobe = 16, 4
    seed_rows = e.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    # unit-normalize with the SAME expression shape the oracle uses:
    # x / sqrt(sum(x*x)) over python floats == DuckDB's per-element
    # division of the identical doubles
    cents = []
    for r in seed_rows:
        v = [float(x) for x in r.v]
        n = sum(y * y for y in v) ** 0.5
        cents.append([x / n for x in v])

    # assignment: argmax over struct(dotp, -cid) — lexicographic max =
    # highest dot, then LOWEST cid (the oracle's dist-desc, cid-asc)
    best = F.array_max(
        F.array(
            *[
                F.struct(_lit_dot(c).alias("d"), F.lit(-cid).alias("negcid"))
                for cid, c in enumerate(cents)
            ]
        )
    )
    corpus = e.withColumn("list_id", (-best["negcid"]).cast("int"))
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "v"
    )
    qd = queries.select(
        "q_id",
        "qv",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(cid).alias("cid"), _lit_dot(c).alias("dotp")
                    )
                    for cid, c in enumerate(cents)
                ]
            )
        ).alias("cd"),
    ).select("q_id", "qv", F.col("cd.cid").alias("list_id"), F.col("cd.dotp").alias("dotp"))
    pw = Window.partitionBy("q_id").orderBy(F.desc("dotp"), "list_id")
    probed = (
        qd.withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "qv", "list_id")
    )
    candidates = (
        corpus.join(F.broadcast(probed), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "qv", F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
    )
    scored = candidates.select(
        "q_id",
        "c_id",
        (
            _dot(F.col("qv"), F.col("cv"))
            / (
                F.sqrt(_dot(F.col("qv"), F.col("qv")))
                * F.sqrt(_dot(F.col("cv"), F.col("cv")))
            )
        ).alias("cos_raw"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("c_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("q_id", "c_id", F.round("cos_raw", 4).alias("cosine"), "rnk")
    )



def _plane_lits_sql() -> str:
    """The seeded hyperplane matrix as a DuckDB list-of-lists literal —
    shortest-roundtrip reprs, so both engines parse the exact doubles."""
    return (
        "["
        + ",".join(
            "[" + ",".join(repr(float(x)) for x in row) + "]"
            for row in _hyperplanes()
        )
        + "]"
    )


def _sig_expr():
    """16 sign bits of the hyperplane projections of column ``v`` as ONE
    in-plan expression: per plane, an index-order zip_with/aggregate
    fold of v[j] * plane[j] (the exact fold DuckDB's list_sum performs,
    proven bit-identical by the ss04-ss07 oracle family), then
    bit-packed.  Replaces the former Arrow/numpy matmul projection —
    numpy's SIMD-blocked summation order is NOT replayable in SQL,
    which is what kept ss02 rows-only; the fold is."""
    planes = _hyperplanes()
    sig = F.lit(0).cast("long")
    for pi, row in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in row])
        d = F.aggregate(
            F.zip_with(F.col("v"), arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        sig = sig + F.when(d > 0, F.lit(1 << pi).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def _lsh_oracle() -> str:
    """Full DuckDB replay of ss02: literal-plane sign projection,
    4x4-bit banding, Hamming<=2 multiprobe on the query side, candidate
    band join, exact cosine rerank (ss01 convention)."""
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        p AS (SELECT {_plane_lits_sql()} AS planes),
        s AS (
            SELECT vec_id, v,
                   CAST(list_sum(list_transform(generate_series(1, 16),
                       pi -> CASE WHEN list_sum(list_transform(
                                      generate_series(1, 64),
                                      j -> v[j] * planes[pi][j])) > 0
                             THEN 1::BIGINT << (pi - 1)
                             ELSE 0::BIGINT END)) AS BIGINT) AS sig
            FROM e CROSS JOIN p
        ),
        bands AS (
            SELECT vec_id, band, (sig >> (4 * band)) & 15 AS key
            FROM s, (SELECT unnest([0, 1, 2, 3]) AS band) b
        ),
        q AS (
            SELECT vec_id AS q_id, band, xor(key, m) AS key
            FROM bands,
                 (SELECT unnest([0,1,2,4,8,3,5,6,9,10,12]) AS m) pm
            WHERE vec_id < 5
        ),
        cand AS (
            SELECT DISTINCT q.q_id, c.vec_id AS c_id
            FROM q JOIN bands c USING (band, key)
            WHERE c.vec_id != q.q_id
        ),
        scored AS (
            SELECT cand.q_id, cand.c_id,
                   list_cosine_similarity(qe.v, ce.v) AS cos_raw
            FROM cand
            JOIN e qe ON qe.vec_id = cand.q_id
            JOIN e ce ON ce.vec_id = cand.c_id
        )
        SELECT q_id, c_id, round(cos_raw, 4) AS cosine,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT q_id, c_id, cos_raw,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY cos_raw DESC, c_id
                   ) AS rnk
            FROM scored)
        WHERE rnk <= 3
    """


@register(
    "ss02_lsh_ann_topk",
    # Fully oracle-replayed since the r11 continuation: the sign
    # projection is a literal-coefficient index-order fold on both
    # engines (see _sig_expr/_plane_lits_sql), so banding, multiprobe,
    # candidate join, and rerank all hash-gate — the former rows-only
    # status (numpy matmul projection, SQL-unreplayable summation
    # order) is retired; ss02b's recall audit stays as supporting
    # evidence.
    oracle=_lsh_oracle(),
    tags=("similarity", "ann", "lsh"),
)
def ss02_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 16 sign bits -> 4 bucket bands of 4
    bits (pigeonhole: pairs within angular distance agree on some band with
    high probability); exact cosine rerank within candidate buckets; top-3
    per query. The sign projection is one in-plan fold expression over
    the literal plane coefficients — engine-portable (bit-identical in
    DuckDB, measured 0 sign mismatches across the corpus), scan-side,
    and shuffle-free."""
    t = tables(spark, sf_dir)

    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("sig", _sig_expr())
    bands = e.select(
        "vec_id",
        "v",
        *[
            F.shiftright(F.col("sig"), 4 * i).bitwiseAND(F.lit(0xF)).alias(f"band{i}")
            for i in range(4)
        ],
    )
    band_long = bands.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), F.col(f"band{i}").alias("key"))
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "v", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    # Multiprobe: each query also probes every band key within Hamming
    # distance 2 of its own (1 + 4 + 6 = 11 keys per 4-bit band). The
    # probe fanout lands on the tiny query side only — the corpus keeps
    # one row per (vector, band) — and lifts recall from ~1/3 to ~1
    # on this fixture (sign-LSH needs probing when true neighbors sit at
    # moderate cosine, where single-bucket collision odds per band are low).
    probe_masks = [0, 1, 2, 4, 8, 3, 5, 6, 9, 10, 12]
    queries = (
        band_long.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            "band",
            F.explode(
                F.array(*[F.col("key").bitwiseXOR(F.lit(m)) for m in probe_masks])
            ).alias("key"),
        )
    )
    candidates = (
        band_long.join(F.broadcast(queries), ["band", "key"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "qv", F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
        .distinct()
    )
    scored = candidates.select(
        "q_id",
        "c_id",
        (
            _dot(F.col("qv"), F.col("cv"))
            / (
                F.sqrt(_dot(F.col("qv"), F.col("qv")))
                * F.sqrt(_dot(F.col("cv"), F.col("cv")))
            )
        ).alias("cos_raw"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("c_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("q_id", "c_id", F.round("cos_raw", 4).alias("cosine"), "rnk")
    )


_RECALL_AUDIT_ORACLE = """
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST(count(*) * 3 AS BIGINT) AS n_exact_pairs,
               TRUE AS recall_ok
        FROM embeddings WHERE vec_id < 5
"""


def _recall_audit(spark: SparkSession, sf_dir: str, ann_name: str) -> DataFrame:
    """Driver-checkable recall gate for an ANN query: overall recall of
    the ANN top-3 pair set against ss01's exact top-3, published as one
    row (n_queries, n_exact_pairs, recall >= 0.5). The ANN internals
    (hyperplane signs / centroid assignment) stay engine-specific, but
    this derived fact is deterministic — seeds are fixed — so the oracle
    (exact counts + literal TRUE) hash-checks it. The 0.5 floor matches
    the unit tests' recall assertion."""
    from geospatial_data_lake_spark.registry import REGISTRY

    exact = ss01_cosine_topk(spark, sf_dir).select("q_id", "c_id")
    approx = REGISTRY[ann_name].fn(spark, sf_dir).select("q_id", "c_id")
    hit = exact.join(approx, ["q_id", "c_id"], "left_semi")
    stats = exact.agg(
        F.countDistinct("q_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_exact_pairs"),
    ).crossJoin(F.broadcast(hit.agg(F.count(F.lit(1)).alias("n_hits"))))
    return stats.select(
        F.col("n_queries").cast("bigint").alias("n_queries"),
        F.col("n_exact_pairs").cast("bigint").alias("n_exact_pairs"),
        (F.col("n_hits") >= F.col("n_exact_pairs") * 0.5).alias("recall_ok"),
    )


@register(
    "ss02b_lsh_recall_audit",
    oracle=_RECALL_AUDIT_ORACLE,
    tags=("similarity", "ann", "lsh", "audit"),
)
def ss02b_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated recall audit of ss02 (see _recall_audit)."""
    return _recall_audit(spark, sf_dir, "ss02_lsh_ann_topk")


@register(
    "ss03b_ivf_recall_audit",
    oracle=_RECALL_AUDIT_ORACLE,
    tags=("similarity", "ann", "ivf", "audit"),
)
def ss03b_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated recall audit of ss03 (see _recall_audit)."""
    return _recall_audit(spark, sf_dir, "ss03_ivf_ann_topk")


@register(
    "em01_int8_quantization",
    # quantized q_i = floor(x_i * 127 / s + 0.5) with s = max|x| — the
    # half-up rounding is spelled as floor(.+0.5) so both engines share
    # one deterministic form (round() tie-breaking differs across
    # engines); all arithmetic is double with identical operation order.
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        s AS (
            SELECT vec_id, v,
                   list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
            FROM e
        ),
        q AS (
            SELECT vec_id, scale,
                   list_transform(v, x -> floor(x * 127.0 / scale + 0.5)) AS qv,
                   v
            FROM s WHERE scale > 0
        )
        SELECT vec_id,
               CAST(len(qv) AS INT) AS n_dims,
               round(scale, 6) AS scale,
               CAST(list_sum(qv) AS BIGINT) AS q_sum,
               CAST(list_sum(list_transform(qv, q -> q * q)) AS BIGINT) AS q_norm2,
               -- list_reduce = left fold, matching Spark's `aggregate`
               -- summation order bit-for-bit (list_sum may reorder)
               round(list_reduce(
                   list_transform(
                       list_zip(v, qv),
                       p -> abs(p[1] - p[2] * scale / 127.0)),
                   (a, x) -> a + x), 6) AS abs_err
        FROM q
        ORDER BY vec_id
    """,
    tags=("similarity", "quantization", "pipeline"),
)
def em01_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4x
    storage/bandwidth reduction step an ANN index applies before
    sharding a 100 TB vector corpus — audited per vector with the
    quantized checksum, squared norm, and total absolute reconstruction
    error.

    Scale shape: entirely per-row array expressions (scale = max|x|,
    elementwise quantize, fold) in the scan projection — no shuffle, no
    Python, no UDF.  The folds use `aggregate` HOFs: interpreted per
    row, but this is a linear per-row audit (~64 terms), not a
    quadratic join kernel — the unrolling treatment ss01 applies to its
    pair loop would buy nothing measurable here."""
    t = tables(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    e = t.embeddings.select("vec_id", v.alias("v"))
    scale = F.array_max(F.transform("v", lambda x: F.abs(x)))
    s = e.withColumn("scale", scale).filter(F.col("scale") > 0)
    qv = F.transform(
        "v", lambda x: F.floor(x * F.lit(127.0) / F.col("scale") + F.lit(0.5))
    )
    fsum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    # abs_err is computed BEFORE the output projection: a sibling
    # `round(scale) AS scale` alias in the same select list would shadow
    # the source column for `F.col("scale")` inside the HOF lambda and
    # silently sum errors against the rounded scale.
    q = s.withColumn("qv", qv).withColumn(
        "abs_err_raw",
        fsum(
            F.zip_with(
                "v",
                "qv",
                lambda x, qq: F.abs(x - qq * F.col("scale") / F.lit(127.0)),
            )
        ),
    )
    return q.select(
        "vec_id",
        F.size("qv").alias("n_dims"),
        F.round("scale", 6).alias("scale"),
        fsum(F.col("qv")).cast("bigint").alias("q_sum"),
        fsum(F.transform("qv", lambda x: x * x)).cast("bigint").alias("q_norm2"),
        F.round("abs_err_raw", 6).alias("abs_err"),
    ).orderBy("vec_id")


# -- em03: Matryoshka prefix search ------------------------------------------

_MRL_PREFIX = 16  # leading dims of the coarse pass (MRL truncation)
_MRL_SHORTLIST = 8
_MRL_TOPK = 3


@register(
    "em03_matryoshka_prefix_search",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        q AS (SELECT * FROM e WHERE vec_id < 5),
        pre AS (
            SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                   round(list_sum(list_transform(range(1, {_MRL_PREFIX + 1}),
                       i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))), 9) AS pd
            FROM q JOIN e c ON c.vec_id != q.vec_id
        ),
        short AS (
            SELECT q_id, c_id FROM (
                SELECT q_id, c_id,
                       row_number() OVER (
                           PARTITION BY q_id ORDER BY pd, c_id) AS rn
                FROM pre)
            WHERE rn <= {_MRL_SHORTLIST}
        ),
        ex AS (
            SELECT s.q_id, s.c_id,
                   round(list_sum(list_transform(range(1, 65),
                       i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))), 9) AS fd
            FROM short s
            JOIN q ON q.vec_id = s.q_id
            JOIN e c ON c.vec_id = s.c_id
        )
        SELECT q_id, c_id, round(fd, 4) AS full_dist,
               CAST(rn AS BIGINT) AS rnk
        FROM (
            SELECT q_id, c_id, fd,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY fd, c_id) AS rn
            FROM ex)
        WHERE rn <= {_MRL_TOPK}
        ORDER BY q_id, rnk
    """,
    tags=("similarity", "ann", "matryoshka", "embedding"),
)
def em03_matryoshka_prefix_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA (MRL) prefix search — the truncated-dimension serving
    pattern for MRL-trained embeddings: the coarse pass ranks by L2 on
    only the LEADING {_MRL_PREFIX} of 64 dimensions (MRL training
    front-loads information, so the prefix preserves neighborhood
    structure at a quarter of the arithmetic and memory traffic), a
    per-query shortlist of {_MRL_SHORTLIST} survives, and the full-
    dimension exact distance re-ranks the final top-{_MRL_TOPK} — true
    distances out, full-width arithmetic only on shortlist-sized data
    (the dimension-axis analog of ss09's PQ refine).

    Scale shape: the coarse pass is the only corpus-wide work and it
    touches {_MRL_PREFIX}/64 of each vector (a column-pruned scan when
    prefixes are stored as their own column); the rerank is a
    broadcast-sized join.  Every fold is fixed left-to-right and
    9-dp-rounded before ranking, so the DuckDB oracle replays the
    whole two-stage search bit-for-bit."""
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )

    def sq_fold(a, b) -> Column:
        return F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
            9,
        )

    pre = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            sq_fold(
                F.slice("qv", 1, _MRL_PREFIX), F.slice("v", 1, _MRL_PREFIX)
            ).alias("pd"),
        )
    )
    w_pre = Window.partitionBy("q_id").orderBy(
        F.col("pd").asc(), F.col("c_id").asc()
    )
    short = (
        pre.withColumn("rn", F.row_number().over(w_pre))
        .filter(F.col("rn") <= _MRL_SHORTLIST)
        .select("q_id", "c_id")
    )
    ex = (
        e.join(F.broadcast(short), e.vec_id == short.c_id)
        .join(F.broadcast(q), "q_id")
        .select("q_id", "c_id", sq_fold(F.col("qv"), F.col("v")).alias("fd"))
    )
    w_ex = Window.partitionBy("q_id").orderBy(
        F.col("fd").asc(), F.col("c_id").asc()
    )
    return (
        ex.withColumn("rnk", F.row_number().over(w_ex))
        .filter(F.col("rnk") <= _MRL_TOPK)
        .select(
            "q_id",
            "c_id",
            F.round("fd", 4).alias("full_dist"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("q_id", "rnk")
    )


@register(
    "ss10_binary_quant_search",
    # Integer-exact sketch stage: both engines pack the identical
    # 64-bit sign pattern (two 32-bit words — bit 63 of a single word
    # would flip BIGINT's sign, inviting cross-engine two's-complement
    # edge cases) and hamming is bit_count(xor) on both sides; the
    # float rerank reuses ss01's verified cosine convention (same
    # summation order, round 4).
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        w AS (
            SELECT vec_id, v,
                   CAST(list_sum(list_transform(generate_series(0, 31),
                       i -> CASE WHEN v[i + 1] > 0
                            THEN 1::BIGINT << i ELSE 0::BIGINT END))
                       AS BIGINT) AS w0,
                   CAST(list_sum(list_transform(generate_series(32, 63),
                       i -> CASE WHEN v[i + 1] > 0
                            THEN 1::BIGINT << (i - 32) ELSE 0::BIGINT END))
                       AS BIGINT) AS w1
            FROM e
        ),
        q AS (SELECT * FROM w WHERE vec_id < 5),
        ham AS (
            SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                   CAST(bit_count(xor(q.w0, c.w0))
                        + bit_count(xor(q.w1, c.w1)) AS BIGINT) AS hamming
            FROM q JOIN w c ON c.vec_id != q.vec_id
        ),
        cand AS (
            SELECT q_id, c_id, hamming,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY hamming, c_id
                   ) AS hr,
                   count(*) OVER (PARTITION BY q_id) AS n_cand
            FROM ham
        ),
        rerank AS (
            SELECT cand.q_id, cand.c_id, cand.hamming,
                   list_cosine_similarity(qe.v, ce.v) AS cos_raw
            FROM cand
            JOIN e qe ON qe.vec_id = cand.q_id
            JOIN e ce ON ce.vec_id = cand.c_id
            WHERE cand.hr <= greatest(16, (cand.n_cand * 5) // 100)
        ),
        ranked AS (
            SELECT q_id, c_id, hamming, cos_raw,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY cos_raw DESC, c_id
                   ) AS rnk
            FROM rerank
        )
        SELECT q_id, c_id, round(cos_raw, 4) AS cosine, hamming,
               CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 3
    """,
    tags=("similarity", "ann", "quantization"),
)
def ss10_binary_quant_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY-QUANTIZED ANN — the 1-bit-per-dimension sketch that is the
    current production answer to embedding search at extreme scale
    (64 dims -> 8 BYTES per vector, a 32x shrink over float32): each
    vector's sign pattern packs into two 32-bit words, candidates rank
    by hamming distance (bit_count of xor — 2 integer ops per pair, no
    floats), and only the hamming top-16 pay the exact float cosine
    rerank (ss01's convention) for the final top-3.

    Scale shape: the sketch table is 16 bytes + id per vector — a 1 B-
    vector corpus fits in ~24 GB, broadcastable per executor or
    scannable at memory bandwidth; the hamming stage is pure codegen
    integer work (no shuffle — the query sketches broadcast), the
    candidate cut shuffles only (q_id, c_id, hamming) slim rows, and
    the float arrays are joined back ONLY for the 16 survivors per
    query.  The sketch is also the natural lake layout key (bucket by
    a word prefix) — same discipline as ss08's partition-pruned
    inverted lists.

    Exactness contract: the sketch stage is INTEGER-exact (hash-free,
    engine-portable sign packing), so the oracle replays the whole
    pipeline bit-for-bit; the recall-vs-ss01 relationship is audited in
    the unit suite, mirroring ss02b/ss03b."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.select(
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
    q = w.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    ham = (
        w.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            (
                F.bit_count(F.expr("qw0 ^ w0"))
                + F.bit_count(F.expr("qw1 ^ w1"))
            ).cast("bigint").alias("hamming"),
        )
    )
    from pyspark.sql import Window

    by_q = Window.partitionBy("q_id")
    # rerank pool scales with the corpus (5% of candidates, floor 16):
    # a FIXED pool starves recall as the corpus grows — the pool is the
    # binary-quant recall knob and must track corpus size, integer DIV
    # so the oracle replays the exact cut
    cand = (
        ham.withColumn(
            "hr", F.row_number().over(by_q.orderBy("hamming", "c_id"))
        )
        .withColumn("n_cand", F.count(F.lit(1)).over(by_q))
        .filter(F.col("hr") <= F.expr("greatest(16L, (n_cand * 5) DIV 100)"))
        .drop("hr", "n_cand")
    )
    qe = e.select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    ce = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
    scored = (
        cand.join(F.broadcast(qe), "q_id")
        .join(ce, "c_id")
        .withColumn(
            "cos_raw",
            _dot(F.col("qv"), F.col("cv"))
            / (
                F.sqrt(_dot(F.col("qv"), F.col("qv")))
                * F.sqrt(_dot(F.col("cv"), F.col("cv")))
            ),
        )
    )
    return (
        scored.withColumn(
            "rnk",
            F.row_number().over(by_q.orderBy(F.desc("cos_raw"), "c_id")),
        )
        .filter(F.col("rnk") <= 3)
        .select(
            "q_id",
            "c_id",
            F.round("cos_raw", 4).alias("cosine"),
            "hamming",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("q_id", "rnk")
    )


@register(
    "ss11_scalar_quant_search",
    # Integer-exact code stage: the per-dimension affine quantizer is
    # the SAME double expression on both engines ((x - mn) * 255.0 /
    # (mx - mn), floor, clamp to [0, 255]) over the same exact
    # float->double widenings and exact min/max stats, so the int8
    # codes — and therefore the integer L2 distances and the candidate
    # cut — replay bit-for-bit; the float rerank reuses ss01's verified
    # cosine convention (same summation order, round 4).
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        mm AS (
            SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
            FROM e, (SELECT unnest(generate_series(1, 64)) AS i) dims
            GROUP BY i
        ),
        mml AS (
            SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM mm
        ),
        qn AS (
            SELECT vec_id,
                   list_transform(generate_series(1, 64), i ->
                       CAST(least(255, greatest(0,
                           floor((v[i] - mns[i]) * 255.0 /
                               CASE WHEN mxs[i] = mns[i] THEN 1.0
                                    ELSE mxs[i] - mns[i] END)))
                           AS BIGINT)) AS qv
            FROM e, mml
        ),
        q AS (SELECT vec_id AS q_id, qv AS qq FROM qn WHERE vec_id < 5),
        d AS (
            SELECT q.q_id, c.vec_id AS c_id,
                   CAST(list_sum(list_transform(generate_series(1, 64),
                       i -> (c.qv[i] - q.qq[i]) * (c.qv[i] - q.qq[i])))
                       AS BIGINT) AS l2q
            FROM q JOIN qn c ON c.vec_id != q.q_id
        ),
        cand AS (
            SELECT q_id, c_id, l2q,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY l2q, c_id) AS hr,
                   count(*) OVER (PARTITION BY q_id) AS n_cand
            FROM d
        ),
        rerank AS (
            SELECT cand.q_id, cand.c_id, cand.l2q,
                   list_cosine_similarity(qe.v, ce.v) AS cos_raw
            FROM cand
            JOIN e qe ON qe.vec_id = cand.q_id
            JOIN e ce ON ce.vec_id = cand.c_id
            WHERE cand.hr <= greatest(16, (cand.n_cand * 5) // 100)
        ),
        ranked AS (
            SELECT q_id, c_id, l2q, cos_raw,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY cos_raw DESC, c_id
                   ) AS rnk
            FROM rerank
        )
        SELECT q_id, c_id, round(cos_raw, 4) AS cosine, l2q,
               CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 3
    """,
    tags=("similarity", "ann", "quantization"),
)
def ss11_scalar_quant_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR-QUANTIZED (int8) ANN — the middle rung of the quantization
    ladder this engine now covers end-to-end (ss10 binary 1 bit/dim,
    ss11 SQ8 8 bits/dim, em02/ss05-ss09 PQ sub-vector codebooks): each
    dimension is affinely mapped to [0, 255] by corpus min/max trained
    in-plan (one partial-then-final aggregation producing a single
    64-min/64-max stats row that broadcasts — never a driver collect),
    candidates rank by integer L2 over the codes, and only the L2
    shortlist (5% of candidates, floor 16 — ss10's corpus-proportional
    pool) pays the exact float cosine rerank for the final top-3.

    Scale shape: codes are 64 bytes + id per vector (4x over float32);
    the code stage is pure codegen integer arithmetic with the 5 query
    codes broadcast — the corpus is scanned once, no shuffle before the
    slim (q_id, c_id, l2q) candidate cut; the stats row is 128 doubles
    regardless of corpus size.  SQ8 is what production vector stores
    run when binary's recall floor is too low and PQ's codebook train
    is too heavy — completing the spectrum matters because the choice
    is a per-corpus recall/latency trade.

    Exactness contract: stats, codes, distances, and the cut are
    integer- or IEEE-identical on both engines (see oracle comment), so
    the oracle replays the full pipeline; recall vs the exact ss01
    baseline is audited in the unit suite (ss02b/ss03b discipline)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = range(1, _DIM + 1)
    stats = e.agg(
        *[F.min(F.element_at("v", i)).alias(f"mn{i}") for i in dims],
        *[F.max(F.element_at("v", i)).alias(f"mx{i}") for i in dims],
    ).select(
        F.array(*[F.col(f"mn{i}") for i in dims]).alias("mns"),
        F.array(*[F.col(f"mx{i}") for i in dims]).alias("mxs"),
    )
    quantize = (
        "transform(sequence(1, 64), i -> CAST(least(255L, greatest(0L, "
        "floor((element_at(v, i) - element_at(mns, i)) * 255.0D / "
        "IF(element_at(mxs, i) = element_at(mns, i), 1.0D, "
        "element_at(mxs, i) - element_at(mns, i))))) AS BIGINT))"
    )
    qn = e.crossJoin(F.broadcast(stats)).select(
        "vec_id", F.expr(quantize).alias("qv")
    )
    q = qn.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("qq")
    )
    d = qn.join(F.broadcast(q), F.col("q_id") != F.col("vec_id")).select(
        "q_id",
        F.col("vec_id").alias("c_id"),
        F.expr(
            "aggregate(zip_with(qv, qq, (a, b) -> (a - b) * (a - b)), "
            "0L, (acc, x) -> acc + x)"
        ).alias("l2q"),
    )
    by_q = Window.partitionBy("q_id")
    cand = (
        d.withColumn("hr", F.row_number().over(by_q.orderBy("l2q", "c_id")))
        .withColumn("n_cand", F.count(F.lit(1)).over(by_q))
        .filter(F.col("hr") <= F.expr("greatest(16L, (n_cand * 5) DIV 100)"))
        .drop("hr", "n_cand")
    )
    qe = e.select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv_f"))
    ce = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv_f"))
    scored = (
        cand.join(F.broadcast(qe), "q_id")
        .join(ce, "c_id")
        .withColumn(
            "cos_raw",
            _dot(F.col("qv_f"), F.col("cv_f"))
            / (
                F.sqrt(_dot(F.col("qv_f"), F.col("qv_f")))
                * F.sqrt(_dot(F.col("cv_f"), F.col("cv_f")))
            ),
        )
    )
    return (
        scored.withColumn(
            "rnk",
            F.row_number().over(by_q.orderBy(F.desc("cos_raw"), "c_id")),
        )
        .filter(F.col("rnk") <= 3)
        .select(
            "q_id",
            "c_id",
            F.round("cos_raw", 4).alias("cosine"),
            "l2q",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("q_id", "rnk")
    )


@register(
    "rk01_rrf_fusion",
    # Exactness: both input rankings are integer-deterministic on both
    # engines (the cosine list by the proven ss01 double convention
    # with c_id tie-break; the hamming list is pure integer), and the
    # RRF score is a fixed-order two-term sum of 1/(60+rank) doubles —
    # identical IEEE arithmetic, so the fused ranking replays exactly.
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        q AS (SELECT * FROM e WHERE vec_id < 5),
        cosr AS (
            SELECT q_id, c_id,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY cos_raw DESC, c_id
                   ) AS rc
            FROM (
                SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                       list_cosine_similarity(q.v, c.v) AS cos_raw
                FROM q JOIN e c ON c.vec_id != q.vec_id)
        ),
        w AS (
            SELECT vec_id,
                   CAST(list_sum(list_transform(generate_series(0, 31),
                       i -> CASE WHEN v[i + 1] > 0
                            THEN 1::BIGINT << i ELSE 0::BIGINT END))
                       AS BIGINT) AS w0,
                   CAST(list_sum(list_transform(generate_series(32, 63),
                       i -> CASE WHEN v[i + 1] > 0
                            THEN 1::BIGINT << (i - 32) ELSE 0::BIGINT END))
                       AS BIGINT) AS w1
            FROM e
        ),
        qw AS (SELECT * FROM w WHERE vec_id < 5),
        hamr AS (
            SELECT q_id, c_id,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY hamming, c_id
                   ) AS rh
            FROM (
                SELECT qw.vec_id AS q_id, c.vec_id AS c_id,
                       CAST(bit_count(xor(qw.w0, c.w0))
                            + bit_count(xor(qw.w1, c.w1)) AS BIGINT)
                           AS hamming
                FROM qw JOIN w c ON c.vec_id != qw.vec_id)
        ),
        fused AS (
            SELECT coalesce(c.q_id, h.q_id) AS q_id,
                   coalesce(c.c_id, h.c_id) AS c_id,
                   coalesce(1.0 / (60 + c.rc), 0.0)
                       + coalesce(1.0 / (60 + h.rh), 0.0) AS score
            FROM (SELECT * FROM cosr WHERE rc <= 16) c
            FULL OUTER JOIN (SELECT * FROM hamr WHERE rh <= 16) h
              ON c.q_id = h.q_id AND c.c_id = h.c_id
        )
        SELECT q_id, c_id, round(score, 6) AS rrf,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT q_id, c_id, score,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY score DESC, c_id
                   ) AS rnk
            FROM fused)
        WHERE rnk <= 3
    """,
    tags=("similarity", "ann", "fusion", "hybrid"),
)
def rk01_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECIPROCAL-RANK FUSION (Cormack et al. 2009) of two retrieval
    systems — the hybrid-search composition production stacks run when
    no single index wins: the exact-cosine ranking (ss01's convention)
    and the binary-sketch hamming ranking (ss10's sketch stage) each
    contribute their top-16 per query, and candidates fuse by
    score = 1/(60+rank_cos) + 1/(60+rank_ham) (k=60, the canonical
    constant; a list that missed a candidate contributes 0) — final
    top-3 by fused score.

    Scale shape: each input list is already scale-disciplined (ss01's
    broadcast probe / ss10's integer sketch scan); fusion itself
    touches only queries x 16 rows per list — a full-outer equi-join
    on (q_id, c_id) over vanishing candidate sets, broadcastable
    end-to-end.  This is the pattern that fuses dense ANN with a
    lexical/BM25 list in a real retrieval stack; both lists here are
    registry-internal so the whole fusion is oracle-replayable."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = e.filter(F.col("vec_id") < 5)
    by_q = Window.partitionBy("q_id")
    cosr = (
        _cosine_pairs(e, queries)
        .withColumn(
            "rc",
            F.row_number().over(by_q.orderBy(F.desc("cos_raw"), "c_id")),
        )
        .filter(F.col("rc") <= 16)
        .select("q_id", "c_id", "rc")
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
    qw = w.filter(F.col("vec_id") < 5).select(
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
    fused = (
        cosr.alias("c")
        .join(hamr.alias("h"), ["q_id", "c_id"], "full_outer")
        .select(
            "q_id",
            "c_id",
            (
                F.coalesce(1.0 / (60 + F.col("rc")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("rh")), F.lit(0.0))
            ).alias("score"),
        )
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
