"""Extended relational coverage: TPC-H classics, statistical aggregates,
grouping sets, additional window/sort shapes, SQL subqueries, JSON
explosion — rounding out SURVEY.md §2's capability-parity rows (A8, W3/W4,
O4, F9, F11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geospatial_data_lake_spark.functions.decimals import dec, dec_revenue, dsum, one
from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


@register(
    "tpch_q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                    AS DOUBLE) AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))
                              * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2)
                    AS DOUBLE) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                          / count(l_extendedprice), 4) AS DOUBLE) AS avg_price,
               CAST(round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                          / count(l_discount), 4) AS DOUBLE) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch", "flagship"),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship pricing-summary query (entry() runs this shape at
    sf0.001). One scan, map-side partial aggregation, 6-group result."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(dec_revenue()).alias("sum_disc_price"),
            dsum(dec_revenue() * (one() + dec("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(
                F.sum(dec("l_extendedprice")).cast("double")
                / F.count("l_extendedprice"),
                4,
            )
            .cast("double")
            .alias("avg_price"),
            F.round(
                F.sum(dec("l_discount")).cast("double") / F.count("l_discount"), 4
            )
            .cast("double")
            .alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * CAST(l_discount AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("agg", "tpch"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+agg — every predicate pushes into the scan;
    the whole query is one codegen stage with no shuffle."""
    t = tables(spark, sf_dir)
    return t.lineitem.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(dec("l_extendedprice") * dec("l_discount")).alias("revenue"))


@register(
    "tpch_q4_late_orders",
    oracle="""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
    """,
    tags=("join", "agg", "tpch", "J4"),
)
def tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one line shipped >60 days after
    the order date, counted per priority. Declared as a left-semi join (the
    decorrelated EXISTS) so each order is counted once no matter how many
    late lines it has."""
    t = tables(spark, sf_dir)
    late_lines = t.lineitem.select("l_orderkey", "l_shipdate")
    return (
        t.orders.join(
            late_lines,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q12_priority_by_status",
    oracle="""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
    """,
    tags=("join", "agg", "tpch", "J2"),
)
def tpch_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: shipped-line counts split by order priority class.
    Fact-fact equi join shuffled on orderkey; the CASE aggregation is
    map-side partial."""
    t = tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
        SELECT CAST(round(
                   100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                    THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                         * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                    ELSE 0 END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
                   4) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-06-01'
          AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
    tags=("join", "agg", "tpch", "J7"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship month. part is the
    small side — broadcast it so the fact scan never shuffles."""
    t = tables(spark, sf_dir)
    rev = dec_revenue()
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-07-01")
        )
        .join(F.broadcast(t.part.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
                ).cast("double")
                / F.sum(rev).cast("double"),
                4,
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@register(
    "p02_in_list_predicate",
    oracle="""
        SELECT o_orderkey, o_orderpriority
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus = 'F'
    """,
    tags=("filter", "P2"),
)
def p02_in_list_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list equality predicate (P2 generalization; ref equality filter
    backend/import_status/get.py:125)."""
    t = tables(spark, sf_dir)
    return t.orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderstatus") == "F")
    ).select("o_orderkey", "o_orderpriority")


@register(
    "a11_stats_aggregates",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(var_samp(l_discount), 6) AS var_disc,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
               round(min(l_extendedprice), 2) AS min_price,
               round(max(l_extendedprice), 2) AS max_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "A8", "stats"),
)
def a11_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation/covariance) —
    capability-parity A8 catalog stats."""
    t = tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "a12_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "A8"),
)
def a12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (A8) — expressed in Spark SQL (same Catalyst
    plan as the DataFrame API)."""
    t = tables(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "a13_pivot",
    oracle="""
        SELECT l_returnflag,
               round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0.0), 2)
                   AS qty_open,
               round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0.0), 2)
                   AS qty_finished
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "A8", "pivot"),
)
def a13_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (wide aggregation) with an explicit value list — the bounded
    form that scales (unbounded pivot needs a distinct-value collect)."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_finished")
    )


@register(
    "w06_ntile",
    oracle="""
        SELECT q, CAST(count(*) AS BIGINT) AS n,
               round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi
        FROM (
            SELECT c_acctbal,
                   ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS q
            FROM customer
        )
        GROUP BY q
    """,
    tags=("window", "W2", "W3"),
)
def w06_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartile bucketing (W2's batch assignment, rank flavor).
    Global-order ntile serializes one partition — acceptable for catalog-
    sized inputs; at fact-table scale use approx percentiles as cutpoints."""
    t = tables(spark, sf_dir)
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        t.customer.select("c_acctbal", F.ntile(4).over(w).alias("q"))
        .groupBy("q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
    )


@register(
    "w07_first_last_value",
    oracle="""
        SELECT DISTINCT user_id,
               first_value(event_type) OVER w AS first_event,
               last_value(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_event,
               CAST(count(*) OVER w AS BIGINT) AS n_events
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
    tags=("window", "W4"),
)
def w07_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an unbounded frame: per-user first/last
    event — the window form of the 'latest version' lookup (O3)."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t.events.select(
            "user_id",
            F.first_value("event_type").over(w).alias("first_event"),
            F.last_value("event_type").over(w).alias("last_event"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_events"),
        )
        .distinct()
    )


@register(
    "o05_offset_pagination",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 10
    """,
    tags=("sort", "O4"),
)
def o05_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination with a deterministic total order (page 2 of
    the top-k). Offset pushes into the same TakeOrderedAndProject."""
    t = tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(10)
    )


@register(
    "j10_correlated_exists_sql",
    oracle="""
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 300000
        )
        GROUP BY n_name
    """,
    tags=("join", "J4", "sql"),
)
def j10_correlated_exists_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery in Spark SQL — Catalyst decorrelates it
    into the same left-semi join the DataFrame API would declare (J4)."""
    t = tables(spark, sf_dir)
    t.nation.createOrReplaceTempView("nation")
    t.customer.createOrReplaceTempView("customer")
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 300000
        )
        GROUP BY n_name
        """
    )


@register(
    "f09_json_map_explode",
    oracle="""
        SELECT event_id, k AS prop_key,
               CAST(json_extract(props, '$.' || k) AS BIGINT) AS prop_value
        FROM events, unnest(json_keys(props)) u(k)
        WHERE event_id % 25 = 0
    """,
    tags=("scalar", "F9", "S5"),
)
def f09_json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON object -> exploded key/value rows (ref: .get("assets", {})
    .values() iteration, backend/check_stac_metadata/utils.py:119-127).
    from_json to a typed map, then explode — both JVM-side."""
    t = tables(spark, sf_dir)
    return (
        t.events.filter(F.col("event_id") % 25 == 0)
        .select(
            "event_id",
            F.explode(
                F.from_json("props", T.MapType(T.StringType(), T.LongType()))
            ).alias("prop_key", "prop_value"),
        )
    )


@register(
    "f11_url_encode",
    # DuckDB has no url_encode scalar, but this key domain's only
    # non-alphanumerics are ' ' and '/', so the oracle replicates the
    # x-www-form-urlencoded table for them explicitly (space -> '+',
    # '/' -> '%2F') — a real cross-engine check of the encoding, not a
    # tautology; the full-table behavior is additionally unit-tested.
    oracle="""
        WITH k AS (
            SELECT doc_id,
                   'data files/' || source || '/doc ' || CAST(doc_id AS VARCHAR)
                       AS key
            FROM documents
        )
        SELECT doc_id,
               key,
               replace(replace(key, '/', '%2F'), ' ', '+') AS encoded,
               key AS roundtrip
        FROM k
    """,
    tags=("scalar", "F11"),
)
def f11_url_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-encode of composed object keys (ref: quote(dumps(params)) into
    the copy manifest, backend/import_dataset/task.py:106). Spark 3.4+
    url_encode is JVM-side; encode/decode roundtrip must be identity."""
    t = tables(spark, sf_dir)
    key = F.concat(F.lit("data files/"), F.col("source"), F.lit("/doc "), F.col("doc_id").cast("string"))
    return t.documents.select(
        "doc_id",
        key.alias("key"),
        F.url_encode(key).alias("encoded"),
        F.url_decode(F.url_encode(key)).alias("roundtrip"),
    )


@register(
    "w08_distribution_ranks",
    oracle="""
        SELECT c_custkey,
               c_mktsegment,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "W3", "distribution"),
)
def w08_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist per segment — distribution position of
    each customer's balance (the window family's relative-rank members;
    one shuffle on the partition key, tie-broken for determinism)."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    )
    return t.customer.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "f15_fuzzy_title_match",
    oracle="""
        SELECT a.n_name AS t1, b.n_name AS t2,
               CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
        FROM nation a JOIN nation b ON a.n_name < b.n_name
        WHERE levenshtein(a.n_name, b.n_name) <= 1
    """,
    tags=("scalar", "fuzzy", "F14"),
)
def f15_fuzzy_title_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy duplicate-title detection via edit distance (the catalog's
    title-uniqueness check extended to near-misses — typos, pluralization).
    Broadcast self-join over the dimension-sized title list; at 100 TB the
    title catalog is still dimension-sized, so the quadratic stays cheap
    and broadcastable."""
    t = tables(spark, sf_dir)
    a = t.nation.select(F.col("n_name").alias("t1"))
    b = t.nation.select(F.col("n_name").alias("t2"))
    return (
        a.join(F.broadcast(b), F.col("t1") < F.col("t2"))
        .withColumn("dist", F.levenshtein("t1", "t2").cast("bigint"))
        .filter(F.col("dist") <= 1)
    )


@register(
    "o06_keyset_pagination",
    oracle="""
        WITH anchor AS (
            SELECT o_totalprice AS ap, o_orderkey AS ak
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 1 OFFSET 9
        )
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM orders, anchor
        WHERE o_totalprice < ap OR (o_totalprice = ap AND o_orderkey > ak)
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    tags=("sort", "O4", "keyset"),
)
def o06_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination: page 2 fetched by filtering strictly past
    page 1's last (price, key) anchor, then top-10 again. Unlike OFFSET
    (o05) — which must produce and discard every earlier row, O(pages^2)
    over a deep scroll — the anchor predicate pushes into the scan and
    each page stays O(page): the only pagination that survives a deep
    scroll over a 100 TB table."""
    t = tables(spark, sf_dir)
    anchor = (
        t.orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").desc())
        .limit(1)
        .select(F.col("o_totalprice").alias("ap"), F.col("o_orderkey").alias("ak"))
    )
    return (
        t.orders.join(F.broadcast(anchor))
        .filter(
            (F.col("o_totalprice") < F.col("ap"))
            | ((F.col("o_totalprice") == F.col("ap")) & (F.col("o_orderkey") > F.col("ak")))
        )
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(10)
    )
