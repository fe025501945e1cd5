"""Product-analytics operators over the ``events`` stream table and the
``documents`` corpus: funnel conversion, cohort retention, and TF-IDF
term ranking.  These are the batch twins of the questions a status/
metrics surface answers continuously (SURVEY.md §2.8 T3/T4 — the
reference recomputes dataset status on every read,
``backend/import_status/get.py:39-94``; funnels and cohorts are the same
"derive a view from an event log" pattern at analytics complexity).

Scale notes (1000 executors, ~100 TB of events):

- Every query's only large shuffles key on ``user_id`` / ``(doc_id,
  term)`` — the natural partition keys; per-user and per-doc state never
  leaves the executors and no step collects to the driver.
- The funnel is three filtered per-user min-aggregations chained by
  shuffle joins on user_id (co-partitioned after the first, so AQE
  reuses the exchange), not a per-user sort or a window over the whole
  log.
- Cohort retention joins each event to its user's first-event week —
  a per-user scalar — then reduces to a (cohort_week, week_offset)
  grid, which is tiny regardless of input scale.
- TF-IDF's document-frequency table is vocabulary-sized; it broadcasts
  here and would flip to a shuffle join on ``term`` past ~100M distinct
  tokens (documented cliff, same dispatch shape as dd04's).

Cross-engine determinism: events carry TIMESTAMP(NANOS); Spark reads
micros (tables.py floor-truncates), so every oracle comparison
truncates to microseconds explicitly — both engines then compare
bit-identical instants.  TF-IDF scores use linear inverse document
frequency ``tf * N / df`` (one IEEE double division of exact integers,
identical in both engines) rather than a log transform whose libm
rounding may differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


@register(
    "ev01_funnel_conversion",
    oracle="""
        WITH e AS (
            SELECT user_id, event_type, date_trunc('microsecond', ts) AS ts
            FROM events
        ),
        v AS (SELECT user_id, min(ts) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
              JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
              WHERE e.event_type = 'click' GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
              JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
              WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
               CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
               CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase
    """,
    tags=("analytics", "events", "funnel"),
)
def ev01_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: users counted at each
    step only if the step's first event strictly follows their first
    event of the previous step.  Three per-user min-aggregations chained
    by user_id joins — each stage's state is one row per surviving user,
    so the funnel narrows the data monotonically; no window over the
    full log, no driver-side state."""
    t = tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_view_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
    return nv.join(F.broadcast(nc)).join(F.broadcast(np_))


@register(
    "ev02_cohort_retention",
    oracle="""
        WITH first AS (
            SELECT user_id, min(ts) AS ft FROM events GROUP BY user_id
        )
        SELECT strftime(date_trunc('week', ft), '%Y-%m-%d') AS cohort_week,
               CAST(floor(date_diff('day', CAST(ft AS DATE), CAST(e.ts AS DATE))
                          / 7.0) AS BIGINT) AS week_offset,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
        FROM events e
        JOIN first ON e.user_id = first.user_id
        GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """,
    tags=("analytics", "events", "cohort"),
)
def ev02_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their first
    event; ``active_users`` counts distinct users from that cohort active
    in each subsequent week (offset = whole weeks since first-event DAY,
    so the boundary is date arithmetic — immune to the nanos-vs-micros
    precision split).  The per-user first-event scalar joins back on
    user_id (the aggregation's own partitioning, no extra shuffle), and
    the output grid is (weeks x weeks) — tiny at any scale."""
    t = tables(spark, sf_dir)
    ev = t.events.select("user_id", "ts")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("ft"))
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            F.date_format(F.date_trunc("week", "ft"), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("ft")) / F.lit(7.0)
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "tx08_tfidf_topterms",
    oracle="""
        WITH tok AS (
            SELECT doc_id, t AS term
            FROM (SELECT doc_id,
                         unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
                  FROM documents)
            WHERE t <> ''
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM tok GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
               CAST(tf AS DOUBLE) * n_docs / df AS tfidf
        FROM (
            SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY CAST(tf.tf AS DOUBLE) * n.n_docs / df.df DESC,
                                tf.term
                   ) AS rn
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        )
        WHERE rn <= 3
        ORDER BY doc_id, tfidf DESC, term
    """,
    tags=("analytics", "text", "tfidf"),
)
def tx08_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by TF-IDF with linear inverse document
    frequency (``tf * N / df`` — exact-integer IEEE division, identical
    across engines; a log() transform could differ in the last ulp and
    flip the rank cut).  The corpus is tokenized ONCE: document
    frequency is a windowed count over the term-frequency aggregation
    (partition by term, unbounded frame) instead of a second aggregate
    joined back — Spark would re-tokenize the shared lineage for a
    self-join, and a windowed df also removes any vocabulary-broadcast
    size cliff.  Ties on score break on the term itself so the per-doc
    top-3 cut is total-ordered."""
    t = tables(spark, sf_dir)
    tok = (
        t.documents.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n = t.documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .join(F.broadcast(n))
        .withColumn(
            "tfidf", F.col("tf").cast("double") * F.col("n_docs") / F.col("df")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", F.col("tfidf").desc(), "term")
    )


@register(
    "ev03_rolling_active_users",
    oracle="""
        WITH daily AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        spine AS (SELECT DISTINCT day FROM daily),
        dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                FROM daily GROUP BY day),
        roll AS (SELECT s.day, CAST(count(DISTINCT d.user_id) AS BIGINT)
                        AS active_7d
                 FROM spine s
                 JOIN daily d ON d.day <= s.day AND d.day >= s.day - 6
                 GROUP BY s.day)
        SELECT strftime(s.day, '%Y-%m-%d') AS day, dau.dau AS dau,
               roll.active_7d AS active_7d
        FROM spine s
        JOIN dau ON s.day = dau.day
        JOIN roll ON s.day = roll.day
        ORDER BY day
    """,
    tags=("analytics", "events", "rolling-distinct"),
)
def ev03_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and rolling-7-day distinct active users.  Rolling DISTINCT
    cannot be windowed from per-day partials (distinct counts don't
    merge), so the scale shape is the CONTRIBUTION EXPLODE: each (user,
    day) pair fans out to the <=7 window days it contributes to — a
    bounded 7x row multiplier on the deduplicated activity table (tiny
    vs the raw log) — and one count-distinct aggregation keyed by
    window day finishes the job.  The oracle uses the equivalent range
    join (quadratic in days — oracle scale only).  Days outside the
    observed spine are dropped on both sides."""
    t = tables(spark, sf_dir)
    daily = (
        t.events.select("user_id", F.to_date("ts").alias("day")).distinct()
    )
    spine = daily.select("day").distinct()
    dau = daily.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = daily.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wday"),
    )
    roll = (
        contrib.join(F.broadcast(spine), contrib.wday == spine.day, "left_semi")
        .groupBy(F.col("wday").alias("rday"))
        .agg(F.count_distinct("user_id").alias("active_7d"))
    )
    return (
        dau.join(roll, dau.day == F.col("rday"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "active_7d"
        )
        .orderBy("day")
    )


def _oriented_copurchase_edges(t) -> DataFrame:
    """The co-purchase edge list, DEGREE-ORIENTED: each undirected edge
    {u, v} is stored exactly once, pointing from the lower-(degree, id)
    endpoint to the higher (compact-forward / degeneracy ordering).
    Every out-neighborhood is then O(sqrt(m)), so the wedge join's
    volume — sum over vertices of C(outdeg, 2) — is minimized even on
    hub-heavy graphs, where an id-ordered orientation lets a mid-id hub
    fan out to its full degree.  Columns: src, dst, dst_d (the dst's
    degree, carried so wedge endpoints can be rank-compared in-row).

    Edge build is bounded fanout: (order, part) dedup first, then a
    per-order self-join emits at most C(k, 2) pairs per order (k =
    lines per order, small and bounded by the schema).  The degree
    table is one row per vertex — tiny next to the edge list — and
    broadcasts."""
    op = t.lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = e.join(
        F.broadcast(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du")),
        "u",
    ).join(
        F.broadcast(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv")),
        "v",
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_d"),
    )


@register(
    "gr01_triangle_count",
    oracle="""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
              FROM op a
              JOIN op b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey)
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
    tags=("graph", "join", "triangle"),
)
def gr01_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase graph (parts sharing an
    order), via degree-oriented (compact-forward) edges: every triangle
    {x, y, z} with rank x < y < z has all three edges pointing up-rank,
    so it is found exactly once as the wedge (x→y, x→z), rank(y) <
    rank(z), closed by the edge y→z — no orientation dedup pass.

    Scale shape: the wedge join is the dominant cost of any triangle
    count; degree orientation bounds each out-neighborhood by
    O(sqrt(m)), so hub vertices cannot fan out quadratically (the
    id-ordered variant's failure mode — a mid-id hub emits C(deg, 2)
    wedges).  The fixture's co-purchase graph is near-regular, so the
    measured cut there is modest (~1.15×, pinned in
    tests/test_plan_shapes.py); the point of the orientation is the
    WORST-CASE guarantee — on a power-law graph the id-ordered wedge
    volume is unbounded per hub while this stays O(m^1.5) total.  Both
    triangle joins stay vertex-keyed shuffles; the degree table
    broadcasts.  The oracle keeps the naive ordered-edge SQL — same
    count, replayable in DuckDB."""
    t = tables(spark, sf_dir)
    o = _oriented_copurchase_edges(t)
    o1, o2, o3 = o.alias("o1"), o.alias("o2"), o.alias("o3")
    rank_lt = (F.col("o1.dst_d") < F.col("o2.dst_d")) | (
        (F.col("o1.dst_d") == F.col("o2.dst_d"))
        & (F.col("o1.dst") < F.col("o2.dst"))
    )
    return (
        o1.join(o2, (F.col("o1.src") == F.col("o2.src")) & rank_lt)
        .join(
            o3,
            (F.col("o3.src") == F.col("o1.dst"))
            & (F.col("o3.dst") == F.col("o2.dst")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@register(
    "ev04_hierarchical_rollup",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h,
                   CAST(count(*) AS BIGINT) AS n,
                   sum(CAST(value AS DECIMAL(28,10))) AS sv
            FROM events GROUP BY h
        )
        SELECT strftime(CAST(h AS DATE), '%Y-%m-%d') AS day,
               CAST(sum(n) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_active_hours,
               CAST(round(sum(sv), 2) AS DOUBLE) AS total_value
        FROM hourly GROUP BY day ORDER BY day
    """,
    tags=("analytics", "events", "rollup"),
)
def ev04_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level time rollup where the coarse level is computed FROM the
    fine level's partial aggregates — the continuous-aggregate /
    materialized-rollup pattern of a time-series store: daily totals
    re-aggregate the hourly (count, decimal-sum) cells instead of
    re-scanning the event log.

    Scale shape: the raw log is touched exactly once (hourly grouping,
    partial agg makes the exchange hour-cardinality wide); the daily
    pass reduces ~24 hourly cells per day, so every additional rollup
    resolution costs O(previous level), not O(log).  Because count and
    decimal-sum are commutative monoids, re-aggregation is EXACT — the
    same reason the hourly cells could be maintained incrementally by a
    streaming writer (T4 windows) and compacted upward offline.  Sums
    fold in DECIMAL(28,10) (functions/decimals.py) so both engines'
    partial-agg schedules produce bit-identical totals."""
    t = tables(spark, sf_dir)
    hourly = t.events.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(28,10)")).alias("sv"),
    )
    return (
        hourly.groupBy(F.date_format(F.to_date("h"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_active_hours"),
            F.round(F.sum("sv"), 2).cast("double").alias("total_value"),
        )
        .orderBy("day")
    )


@register(
    "ev05_top_event_paths",
    oracle="""
        WITH e AS (
            SELECT user_id, event_type,
                   date_trunc('microsecond', ts) AS ts, event_id
            FROM events
        ),
        tri AS (
            SELECT user_id, event_type AS s1,
                   lead(event_type, 1) OVER w AS s2,
                   lead(event_type, 2) OVER w AS s3
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        agg AS (
            SELECT s1 || ' > ' || s2 || ' > ' || s3 AS path,
                   CAST(count(*) AS BIGINT) AS n_occurrences,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM tri WHERE s3 IS NOT NULL
            GROUP BY path
        )
        SELECT path, n_occurrences, n_users,
               CAST(row_number() OVER (
                   ORDER BY n_occurrences DESC, path) AS BIGINT) AS rnk
        FROM agg
        QUALIFY rnk <= 20
    """,
    tags=("analytics", "events", "paths"),
)
def ev05_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step event paths (sequence mining): each user's
    event stream, ordered by (ts, event_id) — the same micros+ingest-id
    tiebreak convention as ev01 — emits its consecutive event-type
    trigrams via two ``lead`` windows, trigrams reduce to global
    (occurrence, distinct-user) counts, and a fully-tiebroken
    ``row_number`` cuts the top 20.

    Scale shape: the only raw-log shuffle keys on user_id (the lead
    window), per-user streams never leave their executor, and the
    trigram aggregation is partial-then-final on a key space bounded by
    |event_type|^3 — the final global ranking therefore sorts a
    vocabulary-sized table (125 rows here; thousands at worst), never
    the log.  This is the path-analysis primitive funnels generalize
    from; the rank cut is deterministic (count desc, path asc), so the
    result is stable under any partitioning."""
    t = tables(spark, sf_dir)
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        t.events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("s2", F.lead("event_type", 1).over(uw))
        .withColumn("s3", F.lead("event_type", 2).over(uw))
        .filter(F.col("s3").isNotNull())
    )
    agg = tri.groupBy(
        F.concat_ws(" > ", "event_type", "s2", "s3").alias("path")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    rw = Window.orderBy(F.desc("n_occurrences"), "path")
    return (
        agg.withColumn("rnk", F.row_number().over(rw).cast("bigint"))
        .filter(F.col("rnk") <= 20)
    )
