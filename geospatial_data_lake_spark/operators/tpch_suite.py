"""TPC-H classics, adapted to the trimmed fixture schemas (TESTDATA.md):
Q3 shipping priority, Q5 local-supplier volume, Q10 returned-item report,
Q18 large-volume customers, and a Q19-shaped disjunctive-predicate quantity
query.  These are the capability-parity relational workhorses (SURVEY.md
§2.3 J2/J7, §2.4 A1/A8, §2.6 O4) a catalog-serving engine must run well.

Scale notes (the design point is a 1000-executor cluster over ~100 TB):

- Dimension chains (``nation``/``region``, low-cardinality filtered
  ``customer`` slices) are broadcast explicitly; fact-fact joins
  (orders x lineitem) shuffle on the join key and rely on AQE for
  skew-splitting and partition coalescing.
- Every filter is expressed on the base scan column so it reaches the
  parquet reader as a pushed predicate (verified in
  tests/test_plan_shapes.py); date constants compare against the
  partition-prunable ``o_orderdate``/``l_shipdate`` columns.
- Top-k results go through ``orderBy().limit(k)`` which Spark executes as
  ``TakeOrderedAndProject`` — per-partition heaps, no global sort.
- Orderings that feed a LIMIT are made cross-engine deterministic by
  (a) ordering on the *rounded* aggregate and (b) breaking ties with a
  unique key, so Spark and the DuckDB oracle cut the same top-k set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.functions.decimals import dec_revenue, dsum
from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables

# Revenue terms sum in exact decimal on both engines (order-independent
# addition; see functions/decimals.py). Columns are built lazily: Column
# construction needs an active SparkContext, and this module imports at
# registry-load time (before any session).
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
)


@register(
    "tpch_q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                    AS DOUBLE) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-order revenue for one market segment. The
    filtered customer slice (~1/5 of a dimension) broadcasts; orders x
    lineitem shuffles on orderkey. Top-10 via TakeOrderedAndProject."""
    t = tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = t.orders.filter(F.col("o_orderdate") < "1998-03-15").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    line = t.lineitem.filter(F.col("l_shipdate") > "1998-03-15").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(line, line.l_orderkey == ords.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(dec_revenue()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                    AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    tags=("tpch", "join", "multiway"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue where customer and supplier share a nation inside
    one region. nation x region prune the supplier side first (broadcast);
    the only large shuffles are the two fact joins on custkey/orderkey.
    The c_nationkey = s_nationkey equality rides the supplier join as a
    second equi-key rather than a post-join filter."""
    t = tables(spark, sf_dir)
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            t.nation.n_regionkey == t.region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    supp = t.supplier.join(
        F.broadcast(asia_nations),
        t.supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    ords = t.orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    return (
        t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(
            t.customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(dec_revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                    AS DOUBLE) AS revenue,
               round(c_acctbal, 2) AS acctbal,
               n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a quarter.
    Both predicates (quarter, returnflag) push to the fact scans; the
    customer attributes join AFTER aggregation would be ideal, but the
    group key needs them — so nation broadcasts onto customer and the
    grouped key carries the display columns (standard Q10 plan)."""
    t = tables(spark, sf_dir)
    ords = t.orders.filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    line = t.lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = t.customer.join(
        F.broadcast(t.nation.select("n_nationkey", "n_name")),
        t.customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        line.join(ords, line.l_orderkey == ords.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(dec_revenue()).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle="""
        WITH big AS (
            SELECT l_orderkey
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(l_quantity) > 250
        )
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               round(o_totalprice, 2) AS totalprice,
               round(sum(l_quantity), 2) AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM big)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY totalprice DESC, o_orderkey
    """,
    tags=("tpch", "agg", "semijoin"),
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 250 (p99 of the
    fixture distribution). The HAVING subquery becomes an aggregated key
    list semi-joined back into the fact — at 100 TB the key list is tiny
    relative to lineitem (top-1% of orders), so it broadcasts and the
    second lineitem pass re-aggregates only surviving rows."""
    t = tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    line = t.lineitem.join(F.broadcast(big), "l_orderkey", "left_semi")
    return (
        line.join(
            t.orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
            line.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            t.customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                    AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                 AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 35
                 AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "predicate", "disjunction"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped disjunctive predicate across a fact-dim join (adapted to
    the trimmed part schema: brand/size/quantity clauses). Catalyst splits
    the OR into per-side conjuncts — the part side prunes to three brands
    at the scan (pushed IN filter), lineitem pushes the quantity envelope
    [1, 40], and only the cross terms evaluate post-join."""
    t = tables(spark, sf_dir)
    p = t.part.select("p_partkey", "p_brand", "p_size")
    l = t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    clause = (
        (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(20, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(
            dsum(dec_revenue()).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q7_nation_volume",
    oracle="""
        SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE cn.n_name <> sn.n_name
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY cust_nation, supp_nation, l_year
        ORDER BY cust_nation, supp_nation, l_year
    """,
    tags=("tpch", "join", "multiway"),
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (generalized): cross-border trade volume for every
    (customer nation, supplier nation) pair by ship year. Nation names
    ride in via two broadcast dim joins; the inequality evaluates
    post-join on two tiny tagged columns rather than re-joining nation
    at fact scale."""
    t = tables(spark, sf_dir)
    nations = t.nation.select("n_nationkey", "n_name")
    cust = t.customer.join(
        F.broadcast(nations), t.customer.c_nationkey == nations.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    supp = t.supplier.join(
        F.broadcast(nations), t.supplier.s_nationkey == nations.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    line = t.lineitem.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    return (
        line.join(
            t.orders.select("o_orderkey", "o_custkey"),
            line.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), line.l_suppkey == supp.s_suppkey)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(dsum(dec_revenue()).alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle="""
        WITH trade AS (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(18,4))
                       * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume,
                   sn.n_name AS supp_nation
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN part ON l_partkey = p_partkey
            WHERE r_name = 'ASIA' AND p_type = (
                SELECT min(p_type) FROM part
            )
        )
        SELECT o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                     / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        FROM trade
        GROUP BY o_year
        ORDER BY o_year
    """,
    tags=("tpch", "join", "8way"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of a part-type's trade into a
    region, by year — the widest join in the suite (lineitem x orders x
    customer x nation x region x supplier x nation x part). Every
    dimension chain broadcasts; the two fact joins shuffle once each; the
    share is a conditional-sum ratio in one aggregation (no second pass).
    The part-type filter uses min(p_type) so the constant tracks the
    synthetic dictionary; the 1-row min aggregate joins back via a
    broadcast crossJoin (the q11/mx02 pattern) so the whole query is
    ONE Spark plan — no driver-side collect, no extra job."""
    t = tables(spark, sf_dir)
    min_type = t.part.agg(F.min("p_type").alias("min_ptype"))
    parts = (
        t.part.crossJoin(F.broadcast(min_type))
        .filter(F.col("p_type") == F.col("min_ptype"))
        .select("p_partkey")
    )
    asia_cust = (
        t.customer.join(
            F.broadcast(
                t.nation.join(
                    F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
                    t.nation.n_regionkey == t.region.r_regionkey,
                ).select("n_nationkey")
            ),
            t.customer.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp = t.supplier.join(
        F.broadcast(t.nation.select("n_nationkey", "n_name")),
        t.supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    trade = (
        t.lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(F.broadcast(parts), t.lineitem.l_partkey == parts.p_partkey)
        .join(
            t.orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            dec_revenue().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    share = (
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)
        ).cast("double")
        / F.sum("volume").cast("double")
    )
    return (
        trade.groupBy("o_year")
        .agg(F.round(share, 6).alias("mkt_share"))
        .orderBy("o_year")
    )
