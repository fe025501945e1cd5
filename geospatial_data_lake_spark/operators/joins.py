"""Join operators — SURVEY.md §2.3 (J1-J9).

The reference performs joins procedurally (per-row DynamoDB lookups inside
loops, service composition); here every join is declared relationally and
Catalyst/AQE picks the physical strategy. Explicit choices for scale:

- dimension sides (part, supplier, nation, region, bucket dims) are
  broadcast — no shuffle of the fact table;
- fact-fact joins (orders x lineitem) shuffle on the join key; AQE handles
  skew splitting;
- the recursive traversal (J6) and as-of (J9) use the helpers in graph.py /
  asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.functions.decimals import (
    SQL_REVENUE,
    dec,
    dec_revenue,
    dsum,
)
from geospatial_data_lake_spark.operators.asof import asof_join
from geospatial_data_lake_spark.operators.graph import reachable
from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables


@register(
    "j01_lookup_join_broadcast",
    oracle="""
        SELECT p_brand,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size > 40
        GROUP BY p_brand
    """,
    tags=("join", "J1", "J7"),
)
def j01_lookup_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row key lookup join (ref: get(hash_key, range_key) in the
    checksum loop, backend/check_files_checksums/utils.py:55-66) —
    re-expressed as a broadcast hash join: the filtered dimension is
    replicated to every executor, the fact table never shuffles."""
    t = tables(spark, sf_dir)
    dim = t.part.filter(F.col("p_size") > 40).select("p_partkey", "p_brand")
    return (
        t.lineitem.join(F.broadcast(dim), t.lineitem.l_partkey == dim.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "j02_fk_chain_join",
    oracle="""
        SELECT l_orderkey,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                    AS DOUBLE) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate  > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, orderdate, o_orderpriority
    """,
    tags=("join", "J2", "tpch_q3"),
)
def j02_fk_chain_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK chain dataset->versions->assets (ref: import_dataset fetches the
    dataset row then its assets, backend/import_dataset/task.py:81-98) —
    TPC-H Q3 shape: filtered dim broadcast, fact-fact join shuffles on the
    order key."""
    t = tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        t.orders.filter(F.col("o_orderdate") < "1998-06-01")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t.lineitem.filter(F.col("l_shipdate") > "1998-06-01"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(dec_revenue()).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@register(
    "j03_left_outer_join",
    oracle="""
        SELECT c_custkey,
               CAST(count(o_orderkey) AS BIGINT) AS n_orders,
               CAST(round(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,4))), 0), 2)
                    AS DOUBLE) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    tags=("join", "J3"),
)
def j03_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer status enrichment (ref: import-status merges execution
    output with possibly-empty validation errors,
    backend/import_status/get.py:63-92). count() over the null-extended side
    yields 0 for childless rows."""
    t = tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "j04_semi_join",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        )
    """,
    tags=("join", "J4"),
)
def j04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence check as left-semi join (ref: title-duplicate check /
    any-objects-with-prefix probe, backend/datasets/create.py:33,
    backend/datasets/delete.py:38-45). Semi join short-circuits per key —
    no fan-out of matches."""
    t = tables(spark, sf_dir)
    finished = t.orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return t.customer.join(
        finished, t.customer.c_custkey == finished.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "j05_anti_join",
    oracle="""
        SELECT n_nationkey, n_name FROM nation
        WHERE NOT EXISTS (
            SELECT 1 FROM supplier
            WHERE s_nationkey = n_nationkey AND s_acctbal > 9900
        )
    """,
    tags=("join", "J5"),
)
def j05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absence gate as left-anti join (ref: delete allowed only when no
    version objects exist, backend/datasets/delete.py:41-45).

    The probe side is filtered (suppliers above an account-balance bar)
    BEFORE the anti join — the filter prunes the build side exactly like
    the reference's prefix-scoped object listing prunes S3 keys.  The
    unfiltered form returned 0 rows at every driver scale factor (every
    nation has a supplier at sf>=0.01), so its hash gate carried no
    value signal; with the bar the result is 25/24/19 nations at
    sf{0.001,0.01,0.1} (measured)."""
    t = tables(spark, sf_dir)
    rich = t.supplier.filter(F.col("s_acctbal") > 9900)
    return t.nation.join(
        rich, t.nation.n_nationkey == rich.s_nationkey, "left_anti"
    ).select("n_nationkey", "n_name")


@register(
    "j06_graph_reachability",
    oracle="""
        WITH RECURSIVE
        edges(src, dst) AS (
            SELECT 'R' || CAST(n_regionkey AS VARCHAR),
                   'N' || CAST(n_nationkey AS VARCHAR) FROM nation
            UNION ALL
            SELECT 'N' || CAST(s_nationkey AS VARCHAR),
                   'S' || CAST(s_suppkey AS VARCHAR) FROM supplier
        ),
        reach(node) AS (
            SELECT 'R0'
            UNION
            SELECT e.dst FROM edges e JOIN reach r ON e.src = r.node
        )
        SELECT DISTINCT node FROM reach
    """,
    tags=("join", "J6", "U1"),
)
def j06_graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive link-graph traversal to fixpoint (ref: STAC links[].href
    walk with traversed_urls cycle suppression,
    backend/check_stac_metadata/utils.py:126-130). Driver-side BFS loop of
    broadcast frontier joins + dropDuplicates; see operators/graph.py for
    the scale analysis."""
    t = tables(spark, sf_dir)
    region_nation = t.nation.select(
        F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("src"),
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("dst"),
    )
    nation_supplier = t.supplier.select(
        F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias("src"),
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("dst"),
    )
    edges = region_nation.unionByName(nation_supplier)
    seeds = spark.createDataFrame([("R0",)], ["node"])
    return reachable(edges, seeds)


@register(
    "j07_star_join_broadcast",
    oracle="""
        SELECT r_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                    AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey   = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    tags=("join", "J7", "tpch_q5"),
)
def j07_star_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with replicated dimension chain (ref: a DynamoDB GSI acts
    as a replicated lookup side, backend/datasets_model.py:27-40). All three
    dims broadcast; the fact table is scanned exactly once with zero
    shuffles before the final aggregation."""
    t = tables(spark, sf_dir)
    dims = (
        t.supplier.select("s_suppkey", "s_nationkey")
        .join(F.broadcast(t.nation.select("n_nationkey", "n_regionkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "r_name")
    )
    return (
        t.lineitem.join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("r_name")
        .agg(
            dsum(dec_revenue()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "j08_range_join",
    oracle="""
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
                          / count(p_retailprice), 2) AS DOUBLE) AS avg_price
        FROM part
        JOIN (VALUES (1, 10, 'small'), (11, 25, 'medium'), (26, 50, 'large'))
             AS b(lo, hi, label)
          ON p_size BETWEEN lo AND hi
        GROUP BY label
    """,
    tags=("join", "J8"),
)
def j08_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval containment join (ref data shape: STAC temporal
    interval containment, tests/stac_objects.py:24-26). The interval side is
    tiny -> broadcast nested-loop join, which is the right physical plan; for
    two large interval sets, bucketize the range key first."""
    t = tables(spark, sf_dir)
    buckets = spark.createDataFrame(
        [(1, 10, "small"), (11, 25, "medium"), (26, 50, "large")], ["lo", "hi", "label"]
    )
    return (
        t.part.join(
            F.broadcast(buckets),
            F.col("p_size").between(F.col("lo"), F.col("hi")),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.sum(dec("p_retailprice")).cast("double") / F.count("p_retailprice"), 2
            )
            .cast("double")
            .alias("avg_price"),
        )
    )


@register(
    "j09_asof_join",
    oracle="""
        WITH purchases AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        ranked AS (
            SELECT p.event_id,
                   e.event_id AS prev_event_id,
                   e.event_type AS prev_event_type,
                   row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY e.ts DESC, e.event_id DESC
                   ) AS rn
            FROM purchases p
            JOIN events e ON e.user_id = p.user_id AND e.ts < p.ts
        )
        SELECT p.event_id,
               r.prev_event_id,
               r.prev_event_type
        FROM purchases p
        LEFT JOIN ranked r ON r.event_id = p.event_id AND r.rn = 1
    """,
    tags=("join", "J9"),
)
def j09_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest event strictly before each purchase, per user
    (ref: time-ordered ULID version ids make 'current version at time t'
    an as-of lookup, backend/dataset_versions/create.py:58-59). Implemented
    with the union+window composition in operators/asof.py — one shuffle,
    no quadratic blowup (the SQL oracle's O(n^2) self-join is only viable
    at oracle scale)."""
    t = tables(spark, sf_dir)
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    rights = t.events.select("user_id", "ts", "event_id", "event_type")
    joined = asof_join(
        purchases,
        rights.withColumnRenamed("event_id", "r_event_id").withColumnRenamed(
            "event_type", "r_event_type"
        ),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["r_event_id", "r_event_type"],
        strict=True,
        right_order="r_event_id",
    )
    return joined.select(
        "event_id",
        F.col("asof_r_event_id").alias("prev_event_id"),
        F.col("asof_r_event_type").alias("prev_event_type"),
    )


_PR_SCALE = 10**12
_PR_DAMP = 85
_PR_ITERS = 10


def _pr01_oracle() -> str:
    """Generate the chained-CTE replay of pagerank_fixed_point: one
    (contribs, ranks) CTE pair per iteration, all-integer arithmetic,
    so DuckDB reproduces the Spark ranks bit-for-bit (cl01's
    iteration-replay pattern applied to a graph fixpoint).  Internal
    sums type HUGEINT; the final projection CASTs back to BIGINT per
    the registry's determinism rules."""
    s, d, iters = _PR_SCALE, _PR_DAMP, _PR_ITERS
    parts = [
        f"""
        WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS src FROM documents),
        n0 AS (SELECT count(*) AS c FROM ids),
        edges AS MATERIALIZED (
            SELECT src, (src * m.m) % (SELECT c FROM n0) AS dst
            FROM ids, (SELECT unnest([7919, 104729, 1299709]) AS m) m
            WHERE src != (src * m.m) % (SELECT c FROM n0)
        ),
        nodes AS MATERIALIZED (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
        deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        r0 AS MATERIALIZED (SELECT node, (SELECT {s} // n FROM nn) AS rank FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
        c{k} AS MATERIALIZED (
            SELECT e.dst AS node, sum(r.rank // d.deg) AS inflow
            FROM edges e JOIN deg d ON e.src = d.src
                 JOIN r{k - 1} r ON e.src = r.node
            GROUP BY e.dst
        ),
        r{k} AS MATERIALIZED (
            SELECT nodes.node,
                   (SELECT ((100 - {d}) * {s}) // (100 * n) FROM nn)
                   + ({d} * (COALESCE(c{k}.inflow, 0)
                       + (((SELECT sum(rank) FROM r{k - 1})
                           - (SELECT COALESCE(sum(inflow), 0) FROM c{k}))
                          // (SELECT n FROM nn)))) // 100 AS rank
            FROM nodes LEFT JOIN c{k} ON nodes.node = c{k}.node
        )"""
        )
    parts.append(
        f"""
        SELECT node, CAST(rank AS BIGINT) AS rank_fp FROM r{iters}
        ORDER BY node"""
    )
    return "".join(parts)


@register(
    "pr01_link_pagerank",
    oracle=_pr01_oracle(),
    tags=("graph", "iterative", "pagerank"),
)
def pr01_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over a deterministic synthetic link graph on documents
    (each doc links to 3 peers via multiplicative hashing): authority
    scoring of catalog metadata documents — the iterative-dataflow shape
    (bounded driver loop, per-iteration join+agg, checkpointed lineage)
    that complements j06's BFS and dd07's label propagation.

    Ranks are computed in EXACT fixed-point integer units (see
    ``pagerank_fixed_point``), which upgrades this from a rows-only
    check to a fully hash-gated query: the oracle replays the identical
    integer iteration schedule in chained CTEs, so an iterative graph
    fixpoint is externally verified value-by-value — previously thought
    non-SQL-expressible because float summation order made ranks
    engine-specific; integers remove the order dependence entirely."""
    from geospatial_data_lake_spark.operators.graph import pagerank_fixed_point

    t = tables(spark, sf_dir)
    ids = t.documents.select(F.col("doc_id").cast("long").alias("src"))
    n_docs = ids.count()
    edges = ids.select(
        "src",
        F.explode(
            F.array(
                *[((F.col("src") * F.lit(m)) % F.lit(n_docs)).alias(f"t{m}") for m in (7919, 104729, 1299709)]
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return pagerank_fixed_point(
        edges, scale=_PR_SCALE, damping_pct=_PR_DAMP, iterations=_PR_ITERS
    ).select("node", F.col("rank").alias("rank_fp")).orderBy("node")


@register(
    "pr01b_pagerank_audit",
    # Historical note: pr01 was rows-only while it used float ranks
    # (summation order made values un-hashable); the fixed-point rewrite
    # made pr01 itself hash-gated, and this audit now double-checks the
    # algorithm-level invariants in exact integers: the node count of
    # the generated link graph (the oracle rebuilds the same graph in
    # SQL), probability-mass conservation within the deterministic
    # floor-loss bound (2n units/iteration), and rank positivity.
    oracle="""
        WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS src FROM documents),
        n AS (SELECT count(*) AS c FROM ids),
        edges AS (
            SELECT src, (src * m.m) % (SELECT c FROM n) AS dst
            FROM ids, (SELECT unnest([7919, 104729, 1299709]) AS m) m
            WHERE src != (src * m.m) % (SELECT c FROM n)
        ),
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges)
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               TRUE AS mass_conserved,
               TRUE AS all_positive
        FROM nodes
    """,
    tags=("graph", "iterative", "pagerank", "audit"),
)
def pr01b_pagerank_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated audit of pr01 (see register comment)."""
    ranks = pr01_link_pagerank(spark, sf_dir)
    # fixed-point floor losses are bounded by 2n units per iteration —
    # an exact, deterministic envelope (no float tolerance needed)
    bound = 2 * _PR_ITERS  # per-node allowance, times n below
    return ranks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        (
            (F.lit(_PR_SCALE) - F.sum("rank_fp"))
            <= F.lit(bound) * F.count(F.lit(1))
        ).alias("mass_conserved"),
        (F.min("rank_fp") > 0).alias("all_positive"),
    )


@register(
    "j12_full_outer_join",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c FULL JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    tags=("join", "full-outer"),
)
def j12_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join customer <-> orders: completes the join-flavor
    matrix (inner/left/semi/anti/as-of/range are J1-J9) with the one
    shape that preserves BOTH unmatched sides — order-less customers
    surface with NULL order columns (the reference's status view uses
    the left-outer half of this; the full form is what a reconciliation
    report needs).

    Scale shape: FULL OUTER cannot broadcast either side (both must
    survive unmatched), so the plan is the keyed shuffle join on the FK
    — the one join flavor where a SortMergeJoin IS the designed
    outcome, not a regression; AQE still coalesces and skew-splits the
    exchanges."""
    t = tables(spark, sf_dir)
    return t.customer.join(
        t.orders,
        t.customer.c_custkey == t.orders.o_custkey,
        "full_outer",
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
