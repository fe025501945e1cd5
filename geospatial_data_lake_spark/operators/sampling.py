"""Deterministic sampling & split operators over the ``documents`` corpus
— the reproducibility primitives of a training-data pipeline: Bernoulli
sampling, per-stratum rate adjustment, and train/val/test splits.

Everything here derives membership from a PORTABLE content hash
(``md5`` of the stable key, compared against a hex-range threshold),
never from ``rand()``:

- re-running the pipeline — on any engine, any partitioning, any
  cluster size — reproduces the exact same sample/split (rand() with a
  seed is NOT stable across engines, Spark versions, or partition
  layouts);
- membership is a pure per-row function, so incremental appends keep
  every existing row's assignment (critical when a 100 TB corpus grows
  and you must not leak yesterday's training docs into today's test
  split);
- it is oracle-checkable: DuckDB computes the identical md5 hex and
  the identical lexicographic range cut.

Scale: all three queries are narrow per-row projections + one small
aggregation — no joins, no skew surface; the hash is whole-stage
codegen'd JVM work.  (Spark's built-in ``df.sample``/``sampleBy`` are
fine for statistical sampling, but their seeded RNG walks the row order
within each partition — membership changes whenever file splits do,
which is exactly what a reproducible pipeline cannot accept.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables

# first 4 hex chars of md5 -> uniform bucket in [0, 65536)
_BUCKET_SQL = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)"


def _bucket() -> F.Column:
    return F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)


@register(
    "sm01_hash_bernoulli_sample",
    oracle=f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE {_BUCKET_SQL} < '1999'
        ORDER BY doc_id
    """,
    tags=("sampling", "pipeline"),
)
def sm01_hash_bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample (md5 bucket < 0x1999/0x10000 = 9.999%),
    deterministic per doc_id: stable under re-runs, repartitioning, and
    corpus growth.  A pure scan-side filter — at 100 TB it reads every
    row once and shuffles nothing."""
    t = tables(spark, sf_dir)
    return (
        t.documents.filter(_bucket() < "1999")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "sm02_stratified_sample_counts",
    oracle=f"""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN {_BUCKET_SQL} <
                   CASE WHEN lang = 'en' THEN '0ccc' ELSE '4000' END
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("sampling", "pipeline", "stratified"),
)
def sm02_stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-language) sampling audit: the dominant stratum
    ('en') keeps ~5% (bucket < 0x0ccc), every other language ~25%
    (bucket < 0x4000) — the classic rebalance a multilingual corpus
    needs.  The per-stratum threshold is a CASE on the row itself, so
    the whole operator is still one scan + one small aggregation (the
    audit grid is |languages| rows); the sample itself would be the
    same filter without the aggregation."""
    t = tables(spark, sf_dir)
    threshold = F.when(F.col("lang") == "en", F.lit("0ccc")).otherwise(
        F.lit("4000")
    )
    return (
        t.documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum((_bucket() < threshold).cast("long")).alias("n_sampled"),
        )
        .orderBy("lang")
    )


@register(
    "sm03_train_test_split",
    oracle=f"""
        SELECT CASE WHEN {_BUCKET_SQL} < 'cccc' THEN 'train'
                    WHEN {_BUCKET_SQL} < 'e666' THEN 'val'
                    ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents
        GROUP BY split
        ORDER BY split
    """,
    tags=("sampling", "pipeline", "split"),
)
def sm03_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by hash range (train <
    0xcccc, val < 0xe666, test = rest), audited as per-split doc and
    char counts.  Because assignment is a pure function of doc_id, a
    document can never migrate between splits as the corpus grows —
    the no-leakage invariant incremental training pipelines depend on."""
    t = tables(spark, sf_dir)
    b = _bucket()
    split = (
        F.when(b < "cccc", F.lit("train"))
        .when(b < "e666", F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        t.documents.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("split")
    )


@register(
    "sm04_weighted_sample",
    oracle=f"""
        SELECT doc_id, lang, n_chars,
               round(least(1.0, n_chars / 400.0), 4) AS weight
        FROM documents
        WHERE ('0x' || {_BUCKET_SQL})::INT
              < CAST(65536 * least(1.0, n_chars / 400.0) AS INT)
        ORDER BY doc_id
    """,
    tags=("sampling", "pipeline", "weighted"),
)
def sm04_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling: each document's keep probability is
    its own weight (here length-derived, capped at 1 — in production a
    model-based quality score), realized by comparing the md5 bucket
    against a per-row threshold.  The upsampling-by-quality primitive
    of data-mixing recipes, with all of sm01's guarantees: engine-
    portable, repartition-stable, append-stable — a document's fate
    never changes as the corpus grows.

    Scale shape: pure scan-side arithmetic + filter; no shuffle, no
    RNG, nothing to coordinate across 1000 executors."""
    t = tables(spark, sf_dir)
    weight = F.least(F.lit(1.0), F.col("n_chars") / 400.0)
    bucket_int = F.conv(_bucket(), 16, 10).cast("int")
    return (
        t.documents.filter(
            bucket_int < (F.lit(65536) * weight).cast("int")
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(weight, 4).alias("weight"),
        )
        .orderBy("doc_id")
    )


@register(
    "sm05_mixture_quota_sample",
    # Same portable md5 ordering hash as dd05 (Spark conv() == DuckDB
    # '0x' cast, verified there); integer token quotas (w * toks //
    # 100) keep the boundary engine-exact — no float in the cut.
    oracle="""
        WITH d AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM documents
        ),
        q AS (
            SELECT source,
                   CASE WHEN CAST(substring(source, 4) AS INT) % 3 = 0
                        THEN 60 ELSE 30 END * sum(n_tokens) // 100
                       AS quota_tokens
            FROM d GROUP BY source
        ),
        c AS (
            SELECT doc_id, source, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY h
                       ROWS UNBOUNDED PRECEDING
                   ) AS cum
            FROM d
        )
        SELECT c.doc_id, c.source, c.n_tokens
        FROM c JOIN q USING (source)
        WHERE c.cum <= q.quota_tokens
        ORDER BY c.doc_id
    """,
    tags=("sampling", "mixture", "pipeline"),
)
def sm05_mixture_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-MIXTURE quota sampling — the per-source token-budget step of
    a training-mix recipe (the Pile/Llama-style reweighting: curated
    domains upsampled, bulk web capped): every source gets an integer
    token quota (60% for the upweighted sources — numeric suffix
    divisible by 3 stands in for the curation flag — 30% otherwise) and
    contributes the deterministic hash-ordered document prefix whose
    cumulative tokens fit the quota.

    The selection inherits the module's reproducibility contract: the
    order is a portable content hash (never rand()), so re-running on
    any engine/partitioning picks the identical mix, and a document's
    inclusion can only change if ITS SOURCE's corpus grows — never from
    repartitioning.  Greedy-prefix semantics (cum <= quota): a document
    straddling the boundary is excluded, smaller later documents do not
    back-fill — the cut is a pure per-row predicate over (hash rank,
    cumsum), auditable and stable.

    Scale shape: one scan + ONE shuffle (the per-source window cumsum;
    sources are the partition key, so parallelism = source count — at
    100 TB with few giant sources, the documented escalation is
    range-partitioning each source's hash domain and computing the
    cumsum as partial-sums + a broadcast per-range offset table, the
    classic distributed prefix-sum); the quota table is a tiny
    broadcast join."""
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    d = t.documents.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    w = (
        F.when(F.substring("source", 4, 10).cast("int") % 3 == 0, 60)
        .otherwise(30)
        .cast("bigint")
    )
    # integer DIV end-to-end: a double quotient's floor could disagree
    # with the oracle's integer // once token sums leave double's exact
    # range (the 100 TB case)
    quotas = d.withColumn("__w", w).groupBy("source").agg(
        F.expr("(first(__w) * sum(n_tokens)) DIV 100").alias("quota_tokens")
    )
    cum = Window.partitionBy("source").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        d.withColumn("cum", F.sum("n_tokens").over(cum))
        .join(F.broadcast(quotas), "source")
        .filter(F.col("cum") <= F.col("quota_tokens"))
        .select("doc_id", "source", "n_tokens")
        .orderBy("doc_id")
    )
