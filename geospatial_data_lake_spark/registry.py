"""Declared-query registry.

Every operator from SURVEY.md §2 (plus the training-data-pipeline extensions)
is registered here as a named query: a callable ``(spark, sf_dir) ->
DataFrame`` optionally paired with an ANSI-SQL oracle string that DuckDB can
run over the same parquet tables.  The driver (and our own tests) execute
both sides and compare row counts, schemas, and order-insensitive value
hashes.

Cross-engine determinism rules every registered query follows:

- timestamps are formatted to strings (`yyyy-MM-dd HH:mm:ss`) — avoids
  session-timezone and precision ambiguity between Spark and DuckDB;
- computed floats (sums/averages/ratios) are ``round()``-ed identically on
  both sides; column values read straight from parquet are left exact;
- counts / integer sums are cast to BIGINT on both sides;
- arrays are stringified (``concat_ws`` / ``array_to_string``) before output;
- every computed column is aliased to the same name on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None for rows-only ops
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query. ``oracle=None`` marks a genuinely
    non-SQL-expressible op (the driver records a weaker rows-only check)."""

    def decorator(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return decorator


_LOADED = False

# Deterministic presentation order for the registry.  The driver's
# correctness gate consumes ``queries()`` in dict order and checks exactly
# the first 50 entries.  The prefix is ROTATED each round: queries proven
# driver-green at sf0.01 in a prior round step aside (keeping one canary
# per family so a regression is still externally visible) and
# never-driver-checked queries move up.  Round-4 prefix: the nine
# events-timestamp queries broken in r3 (must re-prove green after the
# tables.py fix), 13 family canaries, then 28 first-time entries (TPC-H
# suite, scalar F-rows, sampling, recall audits, multimodal decode, event
# analytics).  Everything not listed keeps its registration order after
# the prioritized prefix; nothing is ever dropped.
_PRIORITY: tuple[str, ...] = (
    # r3-ERR events queries — re-prove after the schema-adaptive loader fix
    "s04_prefix_range_scan",
    "s05_json_field_source",
    "p08_schema_validity_predicate",
    "j09_asof_join",
    "a07_error_report",
    "w04_lag_running_sum",
    "t01_tumbling_window",
    "f09_json_map_explode",
    "geo04_point_in_polygon",
    # family canaries — one r2/r3 driver-green representative each
    "s06_content_digest",  # S + A5/F6 checksum path
    "p07_conjunctive_predicate",  # P
    "j01_lookup_join_broadcast",  # J
    "a04_grouped_collect",  # A
    "w03_rank_per_group",  # W
    "o04_topk",  # O
    "u05_duplicate_consistency",  # U
    "x04_centroid_udaf",  # X custom aggregate
    "tx01_token_stats",  # text analysis
    "ss01_cosine_topk",  # ANN
    "dd04_minhash_lsh_pairs",  # dedup
    "mm01_blob_metadata",  # multimodal
    "geo05_polygon_intersect_pairs",  # spatial / J8
    # first driver check: TPC-H suite
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_profit",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers",
    # first driver check: scalar F-rows
    "f01_url_parse",
    "f04_composite_key_roundtrip",
    "f05_multihash_decode",
    "f07_datetime_functions",
    "f08_version_id_mint",
    "f11_url_encode",
    "f12_case_mapping",
    "f13_rolling_hash",
    # first driver check: sampling / splits
    "sm01_hash_bernoulli_sample",
    "sm02_stratified_sample_counts",
    "sm03_train_test_split",
    # first driver check: recall audits, multimodal compute, event analytics
    "ss02b_lsh_recall_audit",
    "ss03b_ivf_recall_audit",
    "pr01b_pagerank_audit",
    "mm02_decode_features",
    "mm03_frame_sample",
    "ev01_funnel_conversion",
    "ev02_cohort_retention",
    "ev03_rolling_active_users",
    # --- 50-entry mark; proven rows retired from the checked prefix ---
    # (r5 rotation candidates: the round-4 additions ct01 px01 pk01 mx01
    # qf01 rep01 rp01 em01 mm04 mm05 — all sf0.01-oracle-verified but
    # never driver-checked — plus the remaining a/w/o/u/t/tx/dd/geo/j
    # rows below and the rest of the TPC-H suite)
    "s01_point_lookup",
    "s02_filtered_scan",
    "s03_secondary_index_scan",
    "s11_pruned_scan",
    "p01_projection_rename",
    "p02_in_list_predicate",
    "p04_regex_predicate",
    "p05_null_predicate",
    "p06_range_predicate",
    "j02_fk_chain_join",
    "j03_left_outer_join",
    "j04_semi_join",
    "j05_anti_join",
    "j07_star_join_broadcast",
    "j06_graph_reachability",
    "a01_count_per_group",
    "a02_existence_probe",
    "a03_uniqueness_check",
    "a06_grouped_bool",
    "a08_rollup",
    "w01_ordinal_assignment",
    "w02_batch_assignment",
    "o01_ordered_iteration",
    "o02_exists_shortcircuit",
    "o03_top1_latest",
    "u01_distinct",
    "u02_union_discriminated",
    "u03_except",
    "j08_range_join",
    "dd01_exact_dedup_summary",
    "geo01_bbox_intersect_pairs",
    "geo02_point_in_bbox",
    "tx07_winnowing_fingerprints",
    "ss03_ivf_ann_topk",
    "dd07_duplicate_groups",
    "t03_session_window",
)


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every operator module so its ``@register`` calls populate
    REGISTRY, then return it (prioritized prefix first, see _PRIORITY)."""
    global _LOADED
    if not _LOADED:
        # Imports are side-effecting registrations.
        from geospatial_data_lake_spark.operators import (  # noqa: F401
            aggregates,
            analytics,
            dedup,
            extended,
            filters,
            geo,
            joins,
            multimodal,
            pipeline_ops,
            sampling,
            scans,
            setops,
            similarity,
            sorts,
            streaming_queries,
            textops,
            tpch_suite,
            tpch_suite2,
            udafs,
            windows,
        )
        from geospatial_data_lake_spark.functions import scalars  # noqa: F401

        missing = [n for n in _PRIORITY if n not in REGISTRY]
        if missing:
            raise RuntimeError(f"_PRIORITY names not registered: {missing}")
        ordered = {n: REGISTRY[n] for n in _PRIORITY}
        ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
        REGISTRY.clear()
        REGISTRY.update(ordered)
        _LOADED = True
    return REGISTRY
