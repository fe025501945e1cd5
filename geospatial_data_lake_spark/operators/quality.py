"""Data-quality operators: distribution drift, column profiling, and
referential-integrity auditing — the checks a lake runs continuously
over incoming batches before they are allowed to join the corpus.

This is the reference's validation surface generalized from per-row
schema checks (p08 / plans/stac_schema.py; reference
``backend/check_files_checksums`` and ``backend/check_stac_metadata``)
to DATASET-level invariants: "does today's batch look like
yesterday's?" (dq01), "what does this column actually contain?" (dq02),
and "does every fact row still resolve its dimensions?" (dq03).

Scale notes (1000 executors, ~100 TB):

- **dq01** never materializes an ECDF over rows.  Values are bucketed
  into fixed-width bins scan-side (pure codegen arithmetic), so the
  only shuffle is a partial-aggregating count keyed by bin — the
  cumulative pass then runs over the BIN table, whose size is fixed by
  the bin width, not by the data.  (An exact KS would need a global
  sort; the binned statistic is the standard streaming/distributed
  substitute and its error is bounded by one bin's mass.)
- **dq02** is a single full scan folding every per-column statistic in
  one aggregation (count/nulls/distinct/min/max) — partial aggregation
  makes the exchange k-cells wide.  APPROX distinct (HLL) is the
  documented swap past ~1B distinct keys (a15 shows the sketch path).
- **dq03** is two left anti-joins keyed on the FK columns — the probe
  side shuffles once per edge; dimension sides would broadcast at
  typical dim/fact ratios (here orders/customer both shuffle; the plan
  keys on the natural FK so AQE can pick broadcast when the dim fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables

_SPLIT_TS = "2024-01-15 00:00:00"  # drift split point (events span Jan 1-30)
_BINS_PER_UNIT = 4  # KS bin width = 0.25 value units


@register(
    "dq01_ks_drift",
    oracle=f"""
        WITH b AS (
            SELECT CAST(floor(value * {_BINS_PER_UNIT}) AS BIGINT) AS bin,
                   CASE WHEN ts < TIMESTAMP '{_SPLIT_TS}'
                        THEN 1 ELSE 0 END AS before
            FROM events
        ),
        per_bin AS (
            SELECT bin,
                   CAST(sum(before) AS BIGINT) AS n1,
                   CAST(sum(1 - before) AS BIGINT) AS n2
            FROM b GROUP BY bin
        ),
        cum AS (
            SELECT sum(n1) OVER w AS c1, sum(n2) OVER w AS c2,
                   sum(n1) OVER () AS t1, sum(n2) OVER () AS t2
            FROM per_bin
            WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)
        )
        SELECT CAST(max(t1) AS BIGINT) AS n_before,
               CAST(max(t2) AS BIGINT) AS n_after,
               round(max(abs(CAST(c1 AS DOUBLE) / t1
                             - CAST(c2 AS DOUBLE) / t2)), 6) AS ks_stat
        FROM cum
    """,
    tags=("quality", "events", "drift"),
)
def dq01_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov statistic between the
    ``value`` distributions before and after a split instant — the
    drift alarm a continuously-fed corpus runs between "the data I
    trained on" and "the data arriving now".

    The KS statistic is the max gap between the two empirical CDFs,
    evaluated at fixed-width bin edges (width 1/4 value unit): rows
    fold into per-bin counts scan-side, and the cumulative/max pass
    runs over the bounded bin table (see module docstring)."""
    t = tables(spark, sf_dir)
    b = t.events.select(
        F.floor(F.col("value") * _BINS_PER_UNIT).cast("bigint").alias("bin"),
        (F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp"))
        .cast("long")
        .alias("before"),
    )
    per_bin = b.groupBy("bin").agg(
        F.sum("before").alias("n1"),
        F.sum(F.lit(1) - F.col("before")).alias("n2"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cum = per_bin.select(
        F.sum("n1").over(w).alias("c1"),
        F.sum("n2").over(w).alias("c2"),
        F.sum("n1").over(tot).alias("t1"),
        F.sum("n2").over(tot).alias("t2"),
    )
    return cum.agg(
        F.max("t1").cast("bigint").alias("n_before"),
        F.max("t2").cast("bigint").alias("n_after"),
        F.round(
            F.max(
                F.abs(
                    F.col("c1").cast("double") / F.col("t1")
                    - F.col("c2").cast("double") / F.col("t2")
                )
            ),
            6,
        ).alias("ks_stat"),
    )


@register(
    "dq02_column_profile",
    oracle="""
        SELECT 'o_custkey' AS col,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
               CAST(min(o_custkey) AS VARCHAR) AS min_val,
               CAST(max(o_custkey) AS VARCHAR) AS max_val
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(o_orderstatus) AS BIGINT),
               CAST(count(DISTINCT o_orderstatus) AS BIGINT),
               CAST(min(o_orderstatus) AS VARCHAR),
               CAST(max(o_orderstatus) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(o_totalprice) AS BIGINT),
               CAST(count(DISTINCT o_totalprice) AS BIGINT),
               CAST(min(o_totalprice) AS VARCHAR),
               CAST(max(o_totalprice) AS VARCHAR)
        FROM orders
        ORDER BY col
    """,
    tags=("quality", "profile"),
)
def dq02_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (row/null/distinct counts, min, max as strings)
    for a representative numeric, categorical, and decimal column of
    ``orders`` — the ANALYZE-style statistics pass a catalog runs per
    ingest (and what ManifestTable persists per file as min/max).

    One scan computes every cell: the profile is a single aggregation
    whose exchange carries k cells per partition (partial agg), then a
    k-row unpivot.  DISTINCT forces a per-column expand here (exact
    answer); the documented 100 TB swap is approx_count_distinct, whose
    sketch merges in the same partial-agg shape (see a09/a15)."""
    t = tables(spark, sf_dir)
    cols = ["o_custkey", "o_orderstatus", "o_totalprice"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__null"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__dist"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = t.orders.agg(*aggs)
    profile = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(f"{c}__rows").alias("n_rows"),
                        F.col(f"{c}__null").alias("n_null"),
                        F.col(f"{c}__dist").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_val"),
                        F.col(f"{c}__max").alias("max_val"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return profile.select("p.*").orderBy("col")


@register(
    "dq03_referential_integrity",
    oracle="""
        SELECT
            CAST((SELECT count(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey))
                 AS BIGINT) AS orphan_lineitems,
            CAST((SELECT count(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM customer c
                                    WHERE c.c_custkey = o.o_custkey))
                 AS BIGINT) AS orphan_orders,
            CAST((SELECT count(*) FROM customer c
                  WHERE NOT EXISTS (SELECT 1 FROM nation n
                                    WHERE n.n_nationkey = c.c_nationkey))
                 AS BIGINT) AS orphan_customers
    """,
    tags=("quality", "integrity", "anti-join"),
)
def dq03_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit down the fact chain: lineitems whose
    order is missing, orders whose customer is missing, customers whose
    nation is missing — the cross-table validation step of an ingest
    gate (the reference validates per-file metadata links the same way
    before marking a dataset version importable).

    Each violation count is one left anti-join keyed on the FK; the
    three probes are independent scans, so the whole audit is three
    shuffle-or-broadcast joins with no ordering constraints between
    them (a healthy table answers all-zeros without moving any
    dimension data — the anti side short-circuits on the first match)."""
    t = tables(spark, sf_dir)
    orphan_l = (
        t.lineitem.join(
            t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey, "left_anti"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_lineitems"))
    )
    orphan_o = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey, "left_anti"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_orders"))
    )
    orphan_c = (
        t.customer.join(
            t.nation,
            t.customer.c_nationkey == t.nation.n_nationkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_customers"))
    )
    return orphan_l.crossJoin(orphan_o).crossJoin(orphan_c)


@register(
    "dq04_chi2_drift",
    oracle=f"""
        WITH c AS (
            SELECT event_type,
                   CAST(sum(CASE WHEN ts < TIMESTAMP '{_SPLIT_TS}'
                            THEN 1 ELSE 0 END) AS BIGINT) AS o1,
                   CAST(sum(CASE WHEN ts < TIMESTAMP '{_SPLIT_TS}'
                            THEN 0 ELSE 1 END) AS BIGINT) AS o2
            FROM events GROUP BY event_type
        ),
        t AS (SELECT sum(o1) AS t1, sum(o2) AS t2 FROM c),
        cells AS (
            SELECT c.o1, c.o2, t.t1, t.t2,
                   (c.o1 + c.o2) * CAST(t.t1 AS DOUBLE) / (t.t1 + t.t2) AS e1,
                   (c.o1 + c.o2) * CAST(t.t2 AS DOUBLE) / (t.t1 + t.t2) AS e2
            FROM c CROSS JOIN t
        )
        SELECT CAST(max(t1) AS BIGINT) AS n_before,
               CAST(max(t2) AS BIGINT) AS n_after,
               CAST(count(*) - 1 AS BIGINT) AS dof,
               CAST(round(sum(CAST(
                   (o1 - e1) * (o1 - e1) / e1 + (o2 - e2) * (o2 - e2) / e2
                   AS DECIMAL(28,10))), 4) AS DOUBLE) AS chi2
        FROM cells
    """,
    tags=("quality", "events", "drift", "categorical"),
)
def dq04_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity test between the before/after event-type
    distributions — the categorical twin of dq01's numeric KS drift
    (the pair covers both column kinds a drift monitor watches).

    Scale shape: one partial-aggregating count keyed by category, then
    expected-vs-observed arithmetic over the CATEGORY-sized table; the
    raw log is scanned once.  Cross-engine determinism: every cell term
    is a rational expression of exact integer counts (one double
    division each — IEEE-deterministic), and the cell terms fold in
    DECIMAL so partial-agg ordering cannot move the sum
    (functions/decimals.py convention)."""
    t = tables(spark, sf_dir)
    c = t.events.groupBy("event_type").agg(
        F.sum(
            (F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp")).cast("long")
        ).alias("o1"),
        F.sum(
            (F.col("ts") >= F.lit(_SPLIT_TS).cast("timestamp")).cast("long")
        ).alias("o2"),
    )
    return chi2_from_counts(c)


def chi2_from_counts(c: DataFrame) -> DataFrame:
    """Chi-square homogeneity summary from a per-category count table
    ``c(o1, o2)`` — the shared tail of dq04 and vs08 (its SQL twin is
    ``CHI2_TAIL_SQL``).  The input table is category-sized; everything
    here is arithmetic over it plus one scalar cross join."""
    tot = c.agg(F.sum("o1").alias("t1"), F.sum("o2").alias("t2"))
    cells = c.crossJoin(F.broadcast(tot)).select(
        "o1",
        "o2",
        "t1",
        "t2",
        (
            (F.col("o1") + F.col("o2"))
            * F.col("t1").cast("double")
            / (F.col("t1") + F.col("t2"))
        ).alias("e1"),
        (
            (F.col("o1") + F.col("o2"))
            * F.col("t2").cast("double")
            / (F.col("t1") + F.col("t2"))
        ).alias("e2"),
    )
    term = (
        (F.col("o1") - F.col("e1")) * (F.col("o1") - F.col("e1")) / F.col("e1")
        + (F.col("o2") - F.col("e2"))
        * (F.col("o2") - F.col("e2"))
        / F.col("e2")
    ).cast("decimal(28,10)")
    return cells.agg(
        F.max("t1").cast("bigint").alias("n_before"),
        F.max("t2").cast("bigint").alias("n_after"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("dof"),
        F.round(F.sum(term), 4).cast("double").alias("chi2"),
    )


# SQL twin of chi2_from_counts: expects a CTE named ``c`` with integer
# columns (o1, o2); keep the arithmetic textually identical to dq04's
# oracle so both engines agree cell by cell.
CHI2_TAIL_SQL = """
        t AS (SELECT sum(o1) AS t1, sum(o2) AS t2 FROM c),
        cells AS (
            SELECT c.o1, c.o2, t.t1, t.t2,
                   (c.o1 + c.o2) * CAST(t.t1 AS DOUBLE) / (t.t1 + t.t2) AS e1,
                   (c.o1 + c.o2) * CAST(t.t2 AS DOUBLE) / (t.t1 + t.t2) AS e2
            FROM c CROSS JOIN t
        )
        SELECT CAST(max(t1) AS BIGINT) AS n_before,
               CAST(max(t2) AS BIGINT) AS n_after,
               CAST(count(*) - 1 AS BIGINT) AS dof,
               CAST(round(sum(CAST(
                   (o1 - e1) * (o1 - e1) / e1 + (o2 - e2) * (o2 - e2) / e2
                   AS DECIMAL(28,10))), 4) AS DOUBLE) AS chi2
        FROM cells
"""


# -- dq05: embedding-space drift ----------------------------------------------


@register(
    "dq05_embedding_drift",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        dims AS (
            SELECT e.vec_id % 2 = 0 AS ref, idx.i, e.v[idx.i] AS x
            FROM e CROSS JOIN (
                SELECT unnest(generate_series(
                    1, (SELECT max(len(v)) FROM e))) AS i
            ) idx
            WHERE idx.i <= len(e.v)
        ),
        per_dim AS (
            SELECT i,
                   CAST(sum(CASE WHEN ref THEN
                        CAST(x AS DECIMAL(28,10)) END) AS DOUBLE)
                       / sum(CASE WHEN ref THEN 1 ELSE 0 END) AS m1,
                   CAST(sum(CASE WHEN NOT ref THEN
                        CAST(x AS DECIMAL(28,10)) END) AS DOUBLE)
                       / sum(CASE WHEN NOT ref THEN 1 ELSE 0 END) AS m2,
                   CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT)
                       AS n1,
                   CAST(sum(CASE WHEN NOT ref THEN 1 ELSE 0 END) AS BIGINT)
                       AS n2
            FROM dims GROUP BY i
        )
        SELECT max(n1) AS n_ref,
               max(n2) AS n_new,
               round(CAST(sum(CAST(m1 * m2 AS DECIMAL(38,12))) AS DOUBLE)
                   / sqrt(CAST(sum(CAST(m1 * m1 AS DECIMAL(38,12)))
                               AS DOUBLE)
                        * CAST(sum(CAST(m2 * m2 AS DECIMAL(38,12)))
                               AS DOUBLE)), 6) AS centroid_cosine,
               round(sqrt(CAST(sum(CAST((m1 - m2) * (m1 - m2)
                   AS DECIMAL(38,12))) AS DOUBLE)), 6) AS centroid_l2
        FROM per_dim
    """,
    tags=("quality", "embeddings", "drift"),
)
def dq05_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: cosine and L2 distance between the
    per-dimension CENTROIDS of a reference cohort and a new cohort (here
    vec_id parity; in production yesterday's corpus vs today's batch) —
    the semantic companion to dq01/dq04, catching shifts that no scalar
    column statistic sees (a new content domain moves the embedding mean
    long before it moves length or language histograms).

    Scale shape: ``posexplode`` is scan-side row expansion (dims x rows,
    no data movement); the ONLY shuffle is the partial-aggregating
    per-dimension sum — the exchange carries dims x 4 cells per map
    task, independent of row count; the cosine fold then runs on the
    DIMENSION-sized table (64 rows).  Cross-engine determinism: row
    sums fold in DECIMAL(28,10) (order-free; functions/decimals.py),
    means divide as doubles, and the dim-table dot products fold their
    double terms in DECIMAL(38,12), so both engines agree bitwise
    before the final round."""
    from geospatial_data_lake_spark.functions.decimals import METRIC

    t = tables(spark, sf_dir)
    dims = t.embeddings.select(
        (F.col("vec_id") % 2 == 0).alias("ref"),
        F.posexplode("embedding").alias("i", "x"),
    ).select("ref", "i", F.col("x").cast("double").alias("x"))
    per_dim = dims.groupBy("i").agg(
        (
            F.sum(F.when(F.col("ref"), F.col("x").cast(METRIC))).cast(
                "double"
            )
            / F.sum(F.when(F.col("ref"), 1).otherwise(0))
        ).alias("m1"),
        (
            F.sum(F.when(~F.col("ref"), F.col("x").cast(METRIC))).cast(
                "double"
            )
            / F.sum(F.when(~F.col("ref"), 1).otherwise(0))
        ).alias("m2"),
        F.sum(F.when(F.col("ref"), 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(~F.col("ref"), 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    d38 = "decimal(38,12)"
    return per_dim.agg(
        F.max("n1").alias("n_ref"),
        F.max("n2").alias("n_new"),
        F.round(
            F.sum((F.col("m1") * F.col("m2")).cast(d38)).cast("double")
            / F.sqrt(
                F.sum((F.col("m1") * F.col("m1")).cast(d38)).cast("double")
                * F.sum((F.col("m2") * F.col("m2")).cast(d38)).cast(
                    "double"
                )
            ),
            6,
        ).alias("centroid_cosine"),
        F.round(
            F.sqrt(
                F.sum(
                    (
                        (F.col("m1") - F.col("m2"))
                        * (F.col("m1") - F.col("m2"))
                    ).cast(d38)
                ).cast("double")
            ),
            6,
        ).alias("centroid_l2"),
    )


# -- dq06: declarative constraint suite ---------------------------------------

# (rule_name, ANSI predicate) — shared VERBATIM by the Spark plan and
# the DuckDB oracle, so both engines evaluate the same rule text.  A
# NULL predicate result counts as a violation (constraint semantics,
# not WHERE semantics).
_DQ06_RULES: tuple[tuple[str, str], ...] = (
    ("discount_in_unit", "l_discount BETWEEN 0.0 AND 0.10"),
    ("linestatus_domain", "l_linestatus IN ('O', 'F')"),
    ("orderkey_not_null", "l_orderkey IS NOT NULL"),
    ("price_positive", "l_extendedprice > 0"),
    ("quantity_in_range", "l_quantity BETWEEN 1 AND 50"),
    ("returnflag_domain", "l_returnflag IN ('A', 'N', 'R')"),
    (
        "shipdate_in_era",
        "l_shipdate BETWEEN TIMESTAMP '1992-01-01 00:00:00'"
        " AND TIMESTAMP '1998-12-31 23:59:59'",
    ),
    ("tax_in_unit", "l_tax BETWEEN 0.0 AND 0.08"),
)


def _dq06_oracle() -> str:
    vs = ",\n                   ".join(
        f"sum(CASE WHEN NOT coalesce({cond}, FALSE) THEN 1 ELSE 0 END)"
        f" AS v{i}"
        for i, (_, cond) in enumerate(_DQ06_RULES)
    )
    rows = "\n        UNION ALL ".join(
        f"SELECT '{name}' AS rule, n, v{i} AS nv FROM a"
        for i, (name, _) in enumerate(_DQ06_RULES)
    )
    return f"""
        WITH a AS (
            SELECT count(*) AS n,
                   {vs}
            FROM lineitem
        )
        SELECT rule, CAST(n AS BIGINT) AS n_rows,
               CAST(nv AS BIGINT) AS n_violations,
               round(CAST(nv AS DOUBLE) / n, 6) AS violation_pct,
               nv = 0 AS passed
        FROM ({rows})
        ORDER BY rule
    """


@register(
    "dq06_constraint_suite",
    oracle=_dq06_oracle(),
    tags=("quality", "constraints", "lineitem"),
)
def dq06_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint-suite evaluation (the Deequ/expectations
    pattern; the reference's per-row STAC validation X1 generalized to
    a rule CATALOG): every registered rule — range, domain, not-null,
    era — evaluated over the fact table in ONE scan, reporting per-rule
    violation counts, rates, and pass/fail.  NULL predicate results
    count as violations (constraint semantics), and the rule text is
    shared verbatim with the oracle so both engines check the same SQL.

    Scale shape: all rules fold in a single aggregation — the scan is
    paid once no matter how many rules the suite holds, the exchange
    carries one partial-agg row of k violation counters per map task,
    and the per-rule unpivot (``stack``) runs on that single row.
    Adding a rule adds one codegen counter, never a pass."""
    t = tables(spark, sf_dir)
    agg = t.lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.when(F.expr(cond), 0).otherwise(1)
            ).alias(f"v{i}")
            for i, (_, cond) in enumerate(_DQ06_RULES)
        ],
    )
    stack = ", ".join(
        f"'{name}', v{i}" for i, (name, _) in enumerate(_DQ06_RULES)
    )
    return (
        agg.selectExpr(
            "n",
            f"stack({len(_DQ06_RULES)}, {stack}) AS (rule, nv)",
        )
        .select(
            "rule",
            F.col("n").cast("bigint").alias("n_rows"),
            F.col("nv").cast("bigint").alias("n_violations"),
            F.round(F.col("nv") / F.col("n"), 6).alias("violation_pct"),
            (F.col("nv") == 0).alias("passed"),
        )
        .orderBy("rule")
    )


# -- dq07: rolling z-score volume anomalies -----------------------------------

_DQ07_WIN = 24  # trailing hourly buckets in the baseline window
_DQ07_MIN = 12  # minimum baseline buckets before scoring
_DQ07_Z = 3.0  # |z| flag threshold


# Exact-integer baseline statistics make the z-score cross-engine
# deterministic: the rolling window carries n / sum(x) / sum(x^2) as
# INTEGER sums (CAST back from DuckDB's HUGEINT), and the double
# arithmetic on top is written in the identical association order on
# both engines.  Shared verbatim with st03, whose streamed cells must
# reproduce this exact answer.
DQ07_ORACLE = f"""
        WITH b AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d %H') AS hour,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        w AS (
            SELECT event_type, hour, cnt,
                   CAST(count(cnt) OVER tw AS BIGINT) AS n,
                   CAST(COALESCE(sum(cnt) OVER tw, 0) AS BIGINT) AS sx,
                   CAST(COALESCE(sum(cnt * cnt) OVER tw, 0) AS BIGINT)
                       AS sxx
            FROM b
            WINDOW tw AS (
                PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN {_DQ07_WIN} PRECEDING AND 1 PRECEDING
            )
        )
        SELECT event_type, hour, cnt,
               CASE WHEN n >= {_DQ07_MIN} AND
                         (sxx - n * (sx * 1.0 / n) * (sx * 1.0 / n))
                             / (n - 1) > 0
                    THEN round(
                        (cnt - sx * 1.0 / n)
                        / sqrt((sxx - n * (sx * 1.0 / n) * (sx * 1.0 / n))
                               / (n - 1)), 4)
               END AS zscore,
               COALESCE(abs(
                   (cnt - sx * 1.0 / n)
                   / sqrt((sxx - n * (sx * 1.0 / n) * (sx * 1.0 / n))
                          / (n - 1))) > {_DQ07_Z}
                   AND n >= {_DQ07_MIN}, FALSE) AS is_anomaly
        FROM w
        ORDER BY event_type, hour
    """


def score_volume_cells(cells: DataFrame) -> DataFrame:
    """The dq07 scoring pass over an (event_type, hour, cnt) cell
    table — shared by the batch monitor (dq07) and the streaming-state
    monitor (st03).  See dq07's docstring for the determinism
    discipline."""
    from pyspark.sql import Window

    tw = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-_DQ07_WIN, -1)
    )
    w = (
        cells.withColumn("n", F.count("cnt").over(tw).cast("long"))
        .withColumn(
            "sx", F.coalesce(F.sum("cnt").over(tw), F.lit(0)).cast("long")
        )
        .withColumn(
            "sxx",
            F.coalesce(F.sum(F.col("cnt") * F.col("cnt")).over(tw), F.lit(0))
            .cast("long"),
        )
    )
    # try_divide: NULL instead of an ANSI error on empty baselines —
    # common-subexpression elimination evaluates these even under the
    # CASE guard, so the guard alone cannot prevent the division
    mean = F.try_divide(F.col("sx") * F.lit(1.0), F.col("n"))
    var = F.try_divide(
        F.col("sxx") - F.col("n") * mean * mean, F.col("n") - 1
    )
    z = F.try_divide(F.col("cnt") - mean, F.sqrt(var))
    scored = F.col("n") >= _DQ07_MIN
    return w.select(
        "event_type",
        "hour",
        "cnt",
        F.when(scored & (var > 0), F.round(z, 4)).alias("zscore"),
        F.coalesce(
            (F.abs(z) > _DQ07_Z) & scored, F.lit(False)
        ).alias("is_anomaly"),
    ).orderBy("event_type", "hour")


@register(
    "dq07_volume_anomalies",
    oracle=DQ07_ORACLE,
    tags=("quality", "timeseries", "anomaly"),
)
def dq07_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-volume anomaly monitor: hourly per-type event counts
    scored against a trailing {_DQ07_WIN}-bucket rolling baseline by
    z-score, flagging |z| > {_DQ07_Z} — the freshness/volume alarm every
    ingest pipeline runs ahead of its quality gates (dq01/dq04 catch
    distribution drift; this catches the pipeline silently stalling or
    doubling).

    Determinism discipline: the baseline window aggregates n / sum(x) /
    sum(x^2) as EXACT integer sums — partial-aggregation order cannot
    move them — and the mean/variance/z double arithmetic on top is
    association-identical on both engines, so a continuous statistic
    over a rolling window still hash-gates.  Scale shape: one scan to
    hourly cells (partial-agg shuffle bounded by types x hours), then
    a per-type ordered window over the BUCKET table (types x hours
    rows, corpus-size-independent) — the window never touches raw
    events.  The scoring pass itself is ``score_volume_cells``, shared
    verbatim with the streaming-state monitor (st03) so the two cannot
    drift apart."""
    t = tables(spark, sf_dir)
    b = (
        t.events.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd HH").alias("hour")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return score_volume_cells(b)
