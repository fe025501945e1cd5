"""Physical-plan regression tests — the scale contract.

Correctness tests prove a query returns the right rows at sf0.001; these
prove it returns them with the *plan we designed for 100 TB*: filters
pushed into the parquet scan, columns pruned at the reader, small sides
broadcast, aggregations partial-then-final, top-k as a bounded heap
instead of a global sort. A regression here is invisible at test scale
and catastrophic at cluster scale, which is exactly why it is pinned.
"""

from __future__ import annotations

import pytest

from geospatial_data_lake_spark import load_all_queries


@pytest.fixture(scope="module")
def registry():
    return load_all_queries()


def _plan(spark, registry, name, sf_dir) -> str:
    import contextlib
    import io

    df = registry[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def should_push_point_lookup_filter_to_parquet(spark, registry, sf_dir):
    plan = _plan(spark, registry, "s01_point_lookup", sf_dir)
    assert "PushedFilters: [" in plan
    # the equality predicate itself (not just IsNotNull) must reach the scan
    assert "EqualTo" in plan or "In(" in plan, plan


def should_prune_columns_at_scan_for_narrow_aggregate(spark, registry, sf_dir):
    # Q6 touches 4 of lineitem's 11 columns; the reader schema must shrink.
    plan = _plan(spark, registry, "tpch_q6_forecast_revenue", sf_dir)
    (read,) = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert "l_orderkey" not in read and "l_returnflag" not in read, read
    assert "l_extendedprice" in read and "l_discount" in read, read


def should_broadcast_small_side_of_lookup_join(spark, registry, sf_dir):
    plan = _plan(spark, registry, "j01_lookup_join_broadcast", sf_dir)
    assert "BroadcastHashJoin" in plan, plan


def should_broadcast_dimension_chain_in_star_join(spark, registry, sf_dir):
    plan = _plan(spark, registry, "j07_star_join_broadcast", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, (
        "star dimension chain must not shuffle-sort: " + plan
    )


def should_broadcast_dims_in_q5_multiway_join(spark, registry, sf_dir):
    plan = _plan(spark, registry, "tpch_q5_local_supplier_volume", sf_dir)
    assert "BroadcastHashJoin" in plan, plan


def should_split_disjunctive_predicate_to_both_scans(spark, registry, sf_dir):
    # Q19's OR-of-ANDs: Catalyst must derive per-side filters — the brand
    # IN-list on the part scan and the quantity envelope on lineitem.
    plan = _plan(spark, registry, "tpch_q19_disjunctive_revenue", sf_dir)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    part_pushed = [l for l in pushed if "p_brand" in l]
    line_pushed = [l for l in pushed if "l_quantity" in l]
    assert part_pushed, plan
    assert line_pushed, plan


def should_partial_aggregate_before_shuffle(spark, registry, sf_dir):
    # Q1: map-side partial agg collapses rows before the group shuffle.
    plan = _plan(spark, registry, "tpch_q1_pricing_summary", sf_dir)
    assert plan.count("HashAggregate") >= 2, plan
    (read,) = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert "l_partkey" not in read, "Q1 must not read join keys: " + read


def should_run_topk_as_bounded_heap_not_global_sort(spark, registry, sf_dir):
    plan = _plan(spark, registry, "o04_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan


def should_run_q3_topk_as_bounded_heap(spark, registry, sf_dir):
    plan = _plan(spark, registry, "tpch_q3_shipping_priority", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan


def should_keep_window_to_single_shuffle(spark, registry, sf_dir):
    # One partitionBy → exactly one exchange feeding the window sort.
    import re

    plan = _plan(spark, registry, "w03_rank_per_group", sf_dir)
    # formatted mode prints each operator twice (tree + detail section);
    # count only the numbered detail headers.
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 1, f"rank window should shuffle once, saw {n_exchanges}:\n{plan}"


def should_semi_join_existence_probe_without_full_join(spark, registry, sf_dir):
    plan = _plan(spark, registry, "j04_semi_join", sf_dir)
    assert "LeftSemi" in plan, plan


def should_pin_lsh_candidate_join_as_broadcast(spark, registry, sf_dir):
    # The LSH path's pair-explosion join must stay broadcast(band-table) x
    # rep-partitioned probe: a sort-merge or band-key-partitioned plan
    # serializes giant LSH buckets onto single tasks (measured 6x slower).
    # Built via the internal sparse-regime entry point — the dd04 dispatcher
    # routes this saturated fixture corpus to the exact join instead.
    import contextlib
    import io

    from geospatial_data_lake_spark.operators.dedup import _minhash_lsh_pairs
    from geospatial_data_lake_spark.tables import tables

    df = _minhash_lsh_pairs(spark, tables(spark, sf_dir).documents)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def should_dispatch_dd04_to_exact_join_on_saturated_corpus(spark, registry, sf_dir):
    # The synthetic corpus has background Jaccard ~0.58 — the dispatcher
    # must route it to the inverted-index exact join (no band explosion).
    from geospatial_data_lake_spark.operators.dedup import (
        _sampled_background_jaccard,
    )
    from geospatial_data_lake_spark.tables import tables

    bg = _sampled_background_jaccard(tables(spark, sf_dir).documents)
    assert bg >= 0.2, f"fixture background jaccard unexpectedly sparse: {bg}"


def should_cap_saturation_sample_size_against_quadratic_driver_loop(
    spark, sf_dir
):
    # _sampled_jaccard_stats runs an O(n^2) pair loop on the driver —
    # bounded by design at <= 512 sampled docs; a caller pushing
    # n_sample past that must get a loud error, not a quadratic stall.
    import pytest

    from geospatial_data_lake_spark.operators.dedup import (
        _sampled_jaccard_stats,
    )
    from geospatial_data_lake_spark.tables import tables

    with pytest.raises(ValueError, match="n_sample=1024"):
        _sampled_jaccard_stats(tables(spark, sf_dir).documents, n_sample=1024)


def should_run_grid_spatial_join_without_cartesian(spark, registry, sf_dir):
    # geo01 must pair boxes through the cell equi-join; a cartesian /
    # broadcast-nested-loop plan is the quadratic shape the grid exists
    # to avoid.
    plan = _plan(spark, registry, "geo01_bbox_intersect_pairs", sf_dir)
    assert "CartesianProduct" not in plan, plan


def should_run_polygon_intersect_join_without_cartesian(spark, registry, sf_dir):
    # geo05 pairs polygons through the cell equi-join; the SAT predicate
    # must refine candidates, never drive a cartesian/nested-loop plan.
    plan = _plan(spark, registry, "geo05_polygon_intersect_pairs", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def should_broadcast_polygon_cells_in_point_containment(spark, registry, sf_dir):
    # geo04: the point (fact) side must never shuffle — polygon ring
    # cells are the broadcast dimension side, same shape as geo02.
    plan = _plan(spark, registry, "geo04_point_in_polygon", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def should_shuffle_pandas_udaf_input_exactly_once(spark, registry, sf_dir):
    # GROUPED_AGG pandas UDFs have no partial phase (ArrowAggregatePython
    # runs after the group shuffle); the plan must shuffle the UDAF input
    # exactly once — a second exchange would mean rows cross the wire
    # twice for one aggregation.
    import re

    plan = _plan(spark, registry, "x04_centroid_udaf", sf_dir)
    assert "ArrowAggregatePython" in plan, plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 1, plan


def should_broadcast_box_cells_in_point_containment(spark, registry, sf_dir):
    plan = _plan(spark, registry, "geo02_point_in_bbox", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def should_scan_lineitem_once_in_q16_bridge_distinct(spark, registry, sf_dir):
    # Q16: the part prune must broadcast INTO the bridge distinct so
    # lineitem is scanned exactly once; the complaints NOT-IN is a
    # broadcast anti-join, never a shuffle.
    import re

    plan = _plan(spark, registry, "tpch_q16_supplier_part_counts", sf_dir)
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 3, plan  # lineitem + part + supplier, once each
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def should_decorrelate_q17_avg_into_semi_plus_broadcast(spark, registry, sf_dir):
    # Q17's correlated avg must appear as a brand semi-join prune plus a
    # broadcast join of the per-part stats — no per-row subquery, no
    # cartesian, and only the stats aggregation may shuffle.
    import re

    plan = _plan(spark, registry, "tpch_q17_small_qty_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, plan


def should_collapse_q21_exists_pair_into_profile_aggregate(spark, registry, sf_dir):
    # Q21: EXISTS + NOT-EXISTS must ride ONE per-order profile
    # aggregation — lineitem appears at most twice (profile + probe),
    # never four times (the naive two-self-joins shape).
    import re

    plan = _plan(spark, registry, "tpch_q21_waiting_suppliers", sf_dir)
    scans = re.findall(r"\(\d+\) Scan parquet\s*\n\s*Output.*?\[([^\]]*)\]", plan)
    lineitem_scans = [s for s in scans if "l_orderkey" in s]
    assert len(lineitem_scans) <= 2, plan
    assert "CartesianProduct" not in plan, plan
    # the finished-order filter rides a BROADCAST semi-join into the
    # lineitem scan (orders' key set is the small side), the final
    # top-20 is a TakeOrderedAndProject, and nothing nested-loops.
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def should_run_funnel_without_full_log_window(spark, registry, sf_dir):
    # ev01: the funnel is chained per-user aggregations; a Window over
    # the whole event log (sort-per-user of every event) is the shape
    # it must avoid.
    plan = _plan(spark, registry, "ev01_funnel_conversion", sf_dir)
    assert "(1) Window" not in plan and ") Window\n" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def should_tokenize_corpus_once_for_tfidf(spark, registry, sf_dir):
    # tx08: document frequency is a windowed count over the tf
    # aggregate — the explode (Generate) must appear exactly once, or
    # the corpus is being tokenized twice for the self-join.
    import re

    plan = _plan(spark, registry, "tx08_tfidf_topterms", sf_dir)
    n_generates = len(re.findall(r"\(\d+\) Generate", plan))
    assert n_generates == 1, plan
    assert "Window" in plan, plan


def should_broadcast_q2_min_balance_join_back(spark, registry, sf_dir):
    # Q2: the decorrelated per-part min joins back as a broadcast —
    # after the part/region prune the candidate set is dimension-sized.
    plan = _plan(spark, registry, "tpch_q2_min_acctbal_supplier", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def should_broadcast_benchmark_grams_in_contamination_join(spark, registry, sf_dir):
    # ct01: the benchmark gram set is the small side by construction —
    # a shuffle join here would shuffle the full corpus gram stream.
    plan = _plan(spark, registry, "ct01_ngram_contamination", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def should_broadcast_count_tables_in_mixture_rebalance(spark, registry, sf_dir):
    # mx01: both the per-source count table and the min scalar broadcast;
    # the corpus scan must never shuffle for the join.
    plan = _plan(spark, registry, "mx01_mixture_rebalance", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def should_broadcast_quantile_scalar_in_filter(spark, registry, sf_dir):
    # qf01: the p75 scalar joins the re-scan as a broadcast nested loop
    # (single-row side) — never a shuffle.
    plan = _plan(spark, registry, "qf01_quantile_filter", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def should_take_ordered_topk_for_boilerplate_grams(spark, registry, sf_dir):
    # rep01: top-20 grams must be a bounded heap, not a global sort, and
    # the gram count must partial-aggregate before the shuffle.
    plan = _plan(spark, registry, "rep01_boilerplate_ngrams", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def should_window_packing_per_shard_not_globally(spark, registry, sf_dir):
    # pk01: the cumulative sum partitions by shard — a global (empty
    # partitionBy) window would serialize the corpus through one task.
    plan = _plan(spark, registry, "pk01_sequence_packing", sf_dir)
    assert "Window" in plan, plan
    # hashpartitioning on the shard key, never SinglePartition, feeds it
    assert "SinglePartition" not in plan.split("TakeOrderedAndProject")[0], plan


def should_broadcast_allpairs_verify_in_saturated_dedup(spark, registry, sf_dir):
    # dd04 on the saturated fixture: the hashed token-set table must
    # broadcast (nested-loop on d1<d2) — never a shuffle join, and never
    # the word-explosion join (no exploded-gram aggregate before output).
    plan = _plan(spark, registry, "dd04_minhash_lsh_pairs", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def should_keep_spread_a_noop_at_adequate_parallelism(spark, registry, sf_dir):
    # spread() exists to fix single-row-group fixtures; on a scan that
    # already has >= one split per core it must add NO exchange.
    from pyspark.sql import functions as F

    from geospatial_data_lake_spark.tables import spread

    cores = spark.sparkContext.defaultParallelism
    df = spark.range(0, 10_000, 1, numPartitions=cores + 2).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    out = spread(spark, df)
    assert out.rdd.getNumPartitions() == cores + 2  # untouched
    assert out is df  # literally the same plan — no round-robin added


def should_not_expand_sketches_with_distinct_aggregates(spark, registry, sf_dir):
    # a09: HLL sketches and exact distinct counts must stay in separate
    # aggregations joined on the group key — one combined agg plans an
    # Expand that re-runs every sketch update per distinct-duplicated
    # row (19s vs <2s at sf0.1).
    plan = _plan(spark, registry, "a09_approx_distinct", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    before_join = plan.split("BroadcastHashJoin")[0]
    assert "Expand" not in before_join or "Expand" not in plan.split(
        "BroadcastHashJoin"
    )[1], plan


def should_aggregate_hot_keys_in_two_salted_stages(spark, registry, sf_dir):
    """sk01 must show the salted two-stage shape: a shuffle keyed on
    (event_type, __salt) feeding the stage-1 aggregate, then the final
    merge keyed on event_type alone — never one exchange straight to a
    per-key reduce."""
    plan = _plan(spark, registry, "sk01_salted_hotkey_agg", sf_dir)
    assert "__salt" in plan, plan
    exchanges = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert any("__salt" in l for l in exchanges), plan


def should_join_hot_probe_keys_with_salt(spark, registry, sf_dir):
    """sk02's join key must include the salt (the hot-key spread), and
    the probe-side event_id bound must reach the parquet scan."""
    plan = _plan(spark, registry, "sk02_salted_dim_join", sf_dir)
    assert "__salt" in plan, plan
    assert "PushedFilters" in plan and "LessThan(event_id" in plan, plan


def should_orient_triangle_edges_by_degree(spark, registry, sf_dir):
    """gr01's edges must be degree-oriented: total wedge volume
    (sum over vertices of C(outdeg, 2)) no worse than the id-ordered
    orientation, and the degree table must broadcast — the guarantee
    that hub vertices cannot fan out quadratically in the wedge join."""
    from pyspark.sql import functions as F

    from geospatial_data_lake_spark.operators.analytics import (
        _oriented_copurchase_edges,
    )
    from geospatial_data_lake_spark.tables import tables

    t = tables(spark, sf_dir)

    def wedge_volume(edges, src_col):
        return (
            edges.groupBy(src_col)
            .agg(F.count(F.lit(1)).alias("k"))
            .agg(F.sum(F.col("k") * (F.col("k") - 1) / 2).alias("w"))
            .collect()[0]
            .w
        )

    oriented = _oriented_copurchase_edges(t)
    op = t.lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    id_ordered = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    assert wedge_volume(oriented, "src") < wedge_volume(id_ordered, "u")
    plan = _plan(spark, registry, "gr01_triangle_count", sf_dir)
    assert "BroadcastHashJoin" in plan, plan


def should_push_filter_into_orc_scan(spark, registry, sf_dir):
    """s12's predicate must reach the ORC reader (the format-agnostic
    pushdown contract — ORC footers carry min/max like parquet)."""
    plan = _plan(spark, registry, "s12_orc_roundtrip", sf_dir)
    assert "orc" in plan.lower(), plan
    assert "PushedFilters" in plan and "p_size" in plan, plan


def should_probe_trained_ivf_lists_via_broadcast(spark, registry, sf_dir):
    # ss04's candidate join must broadcast the (queries x nprobe) probe
    # rows into an equi-join on the list id — never shuffle the corpus.
    plan = _plan(spark, registry, "ss04_ivf_trained_ann", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def should_bucket_ks_drift_before_any_window(spark, registry, sf_dir):
    # dq01: the only data-sized shuffle is the partial-aggregating bin
    # count; the cumulative window runs over the bin table afterwards.
    plan = _plan(spark, registry, "dq01_ks_drift", sf_dir)
    first_agg = plan.find("HashAggregate")
    first_win = plan.find("Window")
    assert first_agg != -1 and first_win != -1, plan
    # partial agg precedes the window in the plan's bottom-up numbering:
    # the scan-side aggregate must exist independent of the window stage
    assert "partial_sum" in plan or "partial_count" in plan, plan


def should_profile_columns_in_one_scan(spark, registry, sf_dir):
    # dq02 folds every per-column statistic into one aggregation over
    # one scan of orders (the unpivot is expression-only).
    plan = _plan(spark, registry, "dq02_column_profile", sf_dir)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan


def should_rollup_daily_from_hourly_partials(spark, registry, sf_dir):
    # ev04 must scan the event log exactly once; the daily level
    # re-aggregates the hourly cells.
    plan = _plan(spark, registry, "ev04_hierarchical_rollup", sf_dir)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert plan.count("HashAggregate") >= 4, plan  # partial+final x 2 levels


def should_count_vocab_with_partial_aggregation(spark, registry, sf_dir):
    # vb01's token count must partial-aggregate before the exchange;
    # the ranking window then runs over the vocabulary-sized table.
    plan = _plan(spark, registry, "vb01_vocab_coverage", sf_dir)
    assert "partial_count" in plan, plan
    assert "Window" in plan, plan


def should_broadcast_incoming_batch_in_incremental_dedup(spark, registry, sf_dir):
    # dd09: the batch side broadcasts; the corpus is scanned once and
    # never shuffled before the output.
    plan = _plan(spark, registry, "dd09_incremental_dedup", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def should_keep_dd10_substring_dedup_hash_keyed(spark, registry, sf_dir):
    # exact substring-span dedup must stay linear: dup detection is a
    # hash-keyed window (single exchange of the gram rows, derivation
    # evaluated once) — never all-pairs, never a self-join that would
    # recompute the gram subtree.
    plan = _plan(spark, registry, "dd10_substring_spans", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Join" not in plan, plan  # no self-join: window-based dup test
    # gram explode appears once in the tree + once in the detail block;
    # a duplicated (self-joined) subtree would double that
    assert plan.count("Generate") <= 2, plan


def should_aggregate_dq05_drift_partially_per_dimension(spark, registry, sf_dir):
    # per-dimension sums must partial-aggregate (the exchange carries
    # dims x cells, not rows), and nothing may go all-pairs.
    plan = _plan(spark, registry, "dq05_embedding_drift", sf_dir)
    assert "Generate" in plan, plan  # posexplode stays scan-side
    assert "HashAggregate" in plan, plan
    assert "CartesianProduct" not in plan, plan


def should_probe_dd11_index_equi_keyed_with_broadcast_batch_verify(
    spark, registry, sf_dir
):
    # the index probe is an equi-join on (band, key) and the batch's
    # hashed sets broadcast into the verify — never all-pairs
    plan = _plan(spark, registry, "dd11_indexed_incremental_dedup", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def should_run_knn_join_via_cell_probe_not_cartesian(spark, registry, sf_dir):
    # geo07: centers broadcast through the 9-cell ring; the point side
    # must meet them in a cell equi-join with a partial-then-final
    # argmin — never a cartesian and never a window sort.
    plan = _plan(spark, registry, "geo07_nearest_within_radius", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # struct-min argmin compiles to SortAggregate — still partial
    # before the exchange + final after it
    import re

    n_aggs = len(re.findall(r"\(\d+\) (?:Hash|Sort)Aggregate", plan))
    assert n_aggs >= 2, plan


def should_fold_constraint_suite_in_one_scan(spark, registry, sf_dir):
    # dq06: every rule is a counter inside ONE aggregation — the plan
    # must contain exactly one lineitem scan (tree + detail = 2 hits).
    plan = _plan(spark, registry, "dq06_constraint_suite", sf_dir)
    assert plan.count("Scan parquet") <= 2, plan
    assert "HashAggregate" in plan, plan


def should_cut_spans_in_row_without_token_shuffle(spark, registry, sf_dir):
    # dd13's cut pass: the span lists join their documents doc-keyed and
    # the token filtering is pure in-row lambda work — tokens must never
    # explode into a token-level shuffle, and nothing may go cartesian.
    plan = _plan(spark, registry, "dd13_substring_removal", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # one Generate for dd10's gram explode (+1 in the detail block); the
    # cut side must NOT add a token explode
    assert plan.count("Generate") <= 2, plan


def should_decode_media_in_single_arrow_pass(spark, registry, sf_dir):
    # the real codecs run as exactly one mapInPandas pass over the ids —
    # no joins, no extra Python round-trips
    for name in ("mm02_decode_features", "mm03_frame_sample"):
        plan = _plan(spark, registry, name, sf_dir)
        assert plan.count("MapInPandas") == 2, plan  # tree + detail block
        assert "Join" not in plan, plan


def should_broadcast_benchmark_grams_in_decontamination(spark, registry, sf_dir):
    # ct02: the benchmark gram set and the contaminated-id set both
    # broadcast; the corpus is never shuffled token-level — the only
    # joins are broadcast hash joins
    plan = _plan(spark, registry, "ct02_decontaminate", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def should_tokenize_corpus_via_vocab_join_not_per_doc_folds(spark, registry, sf_dir):
    # vb03: corpus tokenization is a word-keyed equi-join against the
    # trained vocab table — the merge folds must NOT appear in the
    # corpus-side plan (they only ever ran on the vocab working set,
    # whose lineage is cut by localCheckpoint)
    plan = _plan(spark, registry, "vb03_bpe_tokenize", sf_dir)
    assert "aggregate(" not in plan.lower() or "ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan


def should_rank_adc_candidates_from_encoded_scan_without_smj(
    spark, registry, sf_dir
):
    # ss05: the encoded corpus meets the broadcast query block; ranking
    # must never fall back to a sort-merge join or cartesian product,
    # and the codeword selection is in-row (no join against a codeword
    # table — the trained model is codegen literals)
    plan = _plan(spark, registry, "ss05_pq_adc_search", sf_dir)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def should_score_volume_cells_not_raw_events(spark, registry, sf_dir):
    # dq07: the rolling window must run over the hourly CELL table —
    # exactly one aggregate over raw events feeds it (partial + final
    # of the same groupBy; a second aggregate pair would mean the
    # window re-derived cells from raw rows)
    plan = _plan(spark, registry, "dq07_volume_anomalies", sf_dir)
    assert plan.count("HashAggregate") <= 4, plan  # partial+final, x2 blocks
    assert "Window" in plan, plan


def should_run_wkb_roundtrip_as_passthrough_map_stages(spark, registry, sf_dir):
    # geo08: the WKB codecs are narrow mapInPandas stages on each side
    # of geo04's join shape — polygon cells broadcast, no cartesian, no
    # sort-merge join; 4 kernel stages (2 encodes + 2 decodes), each
    # appearing in tree + detail block.
    plan = _plan(spark, registry, "geo08_wkb_point_in_polygon", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("MapInPandas") == 8, plan


def should_compare_branch_heads_without_cartesian(spark, registry, sf_dir):
    # vs14: the divergence read is a key-equi full outer join of two
    # snapshot reads — never a cartesian/BNLJ.
    plan = _plan(spark, registry, "vs14_branch_divergence", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "FullOuter" in plan or "full_outer" in plan.lower(), plan


def should_search_persisted_ivfpq_without_training_or_smj(
    spark, registry, sf_dir
):
    # ss08: the search plan reads the stored codes table as ONE
    # IN-list-pruned scan (read(where={"cid": [..]}) — not a union of
    # per-cell scan subtrees) against the broadcast residual query
    # block; codewords are codegen literals loaded from the model store
    # — no sort-merge join, no cartesian, no Python stage.
    plan = _plan(spark, registry, "ss08_persisted_ivfpq_search", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "MapInPandas" not in plan, plan
    assert "Union" not in plan, plan
    # exactly two parquet scans: the embeddings (queries) + the codes
    # (explain("formatted") prints each scan twice: tree + details)
    assert plan.count("Scan parquet") == 4, plan


def should_route_holed_multipolygons_through_arrow_kernels(
    spark, registry, sf_dir
):
    # geo09: the ragged WKB MultiPolygon encode/decode runs as
    # mapInArrow passthrough stages (2 kernels; formatted explain
    # prints each twice), ring cells broadcast onto the point side —
    # no cartesian, no sort-merge join, no pandas conversion (numpy
    # cannot hold the ragged nesting).
    plan = _plan(spark, registry, "geo09_wkb_multipolygon_holes", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("MapInArrow") == 4, plan
    assert "MapInPandas" not in plan, plan


def should_fold_polyline_length_without_any_join(spark, registry, sf_dir):
    # geo10: WKB LineString round trip is two passthrough mapInPandas
    # stages over ONE scan subtree — no join anywhere; the only
    # exchange is the final presentation sort.
    plan = _plan(spark, registry, "geo10_wkb_polyline_length", sf_dir)
    assert "Join" not in plan, plan
    assert plan.count("MapInPandas") == 4, plan
    assert "CartesianProduct" not in plan, plan


def should_refine_adc_shortlist_with_broadcast_exact_rerank(
    spark, registry, sf_dir
):
    # ss09: ss08's pruned probe feeds an ADC shortlist that
    # broadcast-joins back to the raw vector table for the exact
    # rerank — no sort-merge join, no cartesian, no Python stage; the
    # corpus is only touched through broadcast-hash probes.
    plan = _plan(spark, registry, "ss09_ivfpq_refined_search", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "MapInPandas" not in plan, plan
    assert "Union" not in plan, plan


def should_fold_st_functions_without_joins_or_python(spark, registry, sf_dir):
    # geo12: the ST_* catalog compiles to pure per-row codegen
    # expressions — no join, no Python stage; the only exchange is the
    # presentation sort.
    plan = _plan(spark, registry, "geo12_st_functions", sf_dir)
    assert "Join" not in plan, plan
    assert "MapInPandas" not in plan and "ArrowEval" not in plan, plan


def should_partial_aggregate_shard_manifest(spark, registry, sf_dir):
    # pk02: manifest = one scan + an n_shards-group aggregate with a
    # map-side partial phase; no join, no Python.
    plan = _plan(spark, registry, "pk02_shard_manifest", sf_dir)
    assert plan.count("HashAggregate") >= 2, plan
    assert "Join" not in plan, plan
    assert "MapInPandas" not in plan, plan


def should_decode_pruned_geoparquet_files_without_joins(
    spark, registry, sf_dir
):
    # geo11: footer-pruned file scan -> Arrow WKB decode -> per-cell
    # partial agg; no join anywhere in the plan.
    plan = _plan(spark, registry, "geo11_geoparquet_roundtrip", sf_dir)
    assert "Join" not in plan, plan
    assert plan.count("MapInPandas") == 2, plan  # one decode kernel
    assert plan.count("HashAggregate") >= 2, plan


def should_broadcast_benchmark_ngrams_in_dd14(spark, registry, sf_dir):
    # decontamination: the benchmark's distinct window hashes BROADCAST
    # (the tiny side by the operator's defining asymmetry); the corpus
    # is never cartesian-joined and the only hash exchange is the
    # doc-keyed hit count, bounded by contamination volume.
    plan = _plan(spark, registry, "dd14_decontamination", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def should_broadcast_query_sketches_in_ss10(spark, registry, sf_dir):
    # binary-quant ANN: the query sketch table broadcasts (hamming
    # stage is scan-side integer codegen); nothing goes cartesian.
    plan = _plan(spark, registry, "ss10_binary_quant_search", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def should_broadcast_quota_table_in_sm05(spark, registry, sf_dir):
    # mixture sampling: the per-source quota table broadcasts; the only
    # hash exchange is the per-source cumsum window.
    plan = _plan(spark, registry, "sm05_mixture_quota_sample", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def should_explode_filled_intervals_joinlessly_in_ts01(spark, registry, sf_dir):
    # gap-fill: LOCF by construction — each observation explodes its
    # half-open interval to the next observation WITH its reading, so
    # the plan is agg -> lead window -> generate, with NO join of any
    # kind (the declarative spine+LOCF formulation lives in the oracle;
    # parity proves the equivalence).
    plan = _plan(spark, registry, "ts01_gap_fill_locf", sf_dir)
    assert "Generate" in plan, plan
    assert "Join" not in plan, plan
    assert "Window" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def should_fold_ohlc_bars_in_one_joinless_scan(spark, registry, sf_dir):
    # OHLC downsample: one scan, partial-then-final hash aggregation,
    # zero joins — the canonical map-side-combine rollup.
    plan = _plan(spark, registry, "ts02_ohlc_downsample", sf_dir)
    assert plan.count("HashAggregate") >= 2, plan
    assert "Join" not in plan, plan
    assert "Exchange" in plan, plan


def should_reduce_trigrams_before_global_rank_in_ev05(spark, registry, sf_dir):
    # path mining: the raw log shuffles only for the per-user lead
    # window; trigram counting is partial-then-final, so the global
    # rank sorts a vocabulary-sized aggregate, never the log.
    plan = _plan(spark, registry, "ev05_top_event_paths", sf_dir)
    assert plan.count("HashAggregate") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Window") >= 2, plan  # per-user leads + global rank


def should_broadcast_codes_and_stats_in_ss11(spark, registry, sf_dir):
    # scalar-quant ANN: the 1-row min/max stats table and the 5 query
    # codes broadcast; the corpus scans once — nothing goes cartesian.
    plan = _plan(spark, registry, "ss11_scalar_quant_search", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def should_reaggregate_locf_core_joinlessly_in_ts03(spark, registry, sf_dir):
    # TWAP: ts01's join-free LOCF core + one partial-then-final rollup
    # on (user_id, day) — still no join anywhere.
    plan = _plan(spark, registry, "ts03_time_weighted_avg", sf_dir)
    assert "Join" not in plan, plan
    assert "Generate" in plan, plan
    assert plan.count("HashAggregate") >= 4, plan  # bucket agg + day agg


def should_confine_pair_join_to_cluster_cells_in_sd01(spark, registry, sf_dir):
    # SemDeDup: the quadratic compare is an equi-join on the cluster id
    # — broadcast under the dd09-style budget, cid-shuffled sort-merge
    # over it — NEVER a cartesian/nested-loop over the corpus.
    plan = _plan(spark, registry, "sd01_semantic_dedup", sf_dir)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the fixture corpus is well under the default budget: the fast
    # flavor is still the one actually chosen here.
    assert "BroadcastHashJoin" in plan, plan


def should_fuse_vanishing_candidate_lists_in_rk01(spark, registry, sf_dir):
    # RRF: both input rankings keep their scale shapes (broadcast query
    # side, no cartesian); the fusion join touches queries x 16 rows.
    plan = _plan(spark, registry, "rk01_rrf_fusion", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def should_serve_rk02_fusion_from_index_sized_arms(spark, registry, sf_dir):
    # rk02: the IVFPQ arm probes the persisted codes table (pruned read
    # + broadcast residual block, a BroadcastHashJoin), the sketch arm
    # broadcasts the 5 query sketches over a codegen integer scan (the
    # one nested-loop, query-count-sized build — rk01/ss10's accepted
    # shape) — and nothing goes cartesian.
    import re

    plan = _plan(spark, registry, "rk02_rrf_fusion_serve", sf_dir)
    assert "CartesianProduct" not in plan, plan
    nl_nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(nl_nodes) <= 1, plan
    assert "BroadcastHashJoin" in plan, plan


def should_answer_vs19_counts_without_any_parquet_scan(spark, registry, sf_dir):
    # THE metadata-only proof: the per-partition census plan contains
    # no parquet scan at all — the answer comes from the manifest.
    plan = _plan(spark, registry, "vs19_metadata_only_counts", sf_dir)
    assert "Scan parquet" not in plan, plan
    assert "Exchange" not in plan, plan  # local rows, nothing shuffles


def should_broadcast_decision_sets_through_pl01_stages(spark, registry, sf_dir):
    # the composed pipeline: benchmark grams / contaminated ids
    # broadcast, the only shuffles are the dedup hash group and the
    # per-shard packing window — nothing goes cartesian.
    plan = _plan(spark, registry, "pl01_training_pipeline", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def should_answer_vs20_ranges_without_any_parquet_scan(spark, registry, sf_dir):
    # value-stats sibling of vs19: manifest-only, scan-free, shuffle-free.
    plan = _plan(spark, registry, "vs20_metadata_column_range", sf_dir)
    assert "Scan parquet" not in plan, plan
    assert "Exchange" not in plan, plan


def should_prune_vs21_read_to_an_intersecting_file_subset(spark, registry, sf_dir):
    # vs21's fixture: after optimize(strategy="zorder") the 2-D range
    # read plans a STRICT subset of files (balanced hyper-rectangle
    # stats on both clustered columns), and single-column predicates on
    # EITHER dimension prune too — the property a lexicographic sort
    # cannot give the trailing column.
    from geospatial_data_lake_spark.operators.lake_queries import (
        _build_zordered_lake,
    )

    mt = _build_zordered_lake(spark, sf_dir)
    total = len(mt.planned_files())
    assert total >= 8  # clustering actually split the partitions
    both = mt.planned_files(
        where={"o_custkey": (1, 75), "o_totalprice": (50000.0, 150000.0)}
    )
    assert 0 < len(both) < total
    lead = len(mt.planned_files(where={"o_custkey": (1, 75)}))
    trail = len(mt.planned_files(where={"o_totalprice": (50000.0, 150000.0)}))
    assert lead < total and trail < total
    assert len(both) <= min(lead, trail)


def should_keep_vs22_delete_state_metadata_only(spark, registry, sf_dir):
    # vs22's fixture: the positional delete rewrote NO data file — the
    # two append batches' files are all still live, and the pending
    # delete state is one pos-address file per touched partition.
    from geospatial_data_lake_spark.operators.lake_queries import (
        _build_posdel_lake,
    )

    mt = _build_posdel_lake(spark, sf_dir)
    manifest = mt._current()[1]
    dmap = manifest.get("deletes", {})
    assert dmap, "positional delete must be pending (not materialized)"
    entries = [d for v in dmap.values() for d in v]
    assert all(d.get("kind") == "pos" for d in entries)
    # only the 'click' partition is touched, one delete generation
    assert len(entries) == 1
    # every entry applies only to files of the FIRST append (sequence
    # rule: the post-delete append's files are not covered)
    covered = mt.pending_delete_files()
    live = {f for fs in manifest["partitions"].values() for f in fs}
    assert covered < live


def should_answer_vs23_metadata_audit_without_any_parquet_scan(spark, registry, sf_dir):
    # the files-metadata inspection aggregates manifest rows only —
    # like vs19/vs20, the plan must contain no parquet scan at all.
    plan = _plan(spark, registry, "vs23_files_metadata_audit", sf_dir)
    assert "Scan parquet" not in plan, plan


def should_join_content_diff_on_full_row_never_cartesian(
    spark, registry, sf_dir
):
    # vs25's content-mode CDC: the multiset diff must join the two
    # sides on the FULL-ROW null-safe equi-key — duplicate keys in the
    # event log must never degrade it to a cartesian or a nested-loop
    # replication (the failure shape key-diff CDC had over this table).
    # vs28 adds a MAP column: its canonicalized (sorted-entry JSON)
    # group/join key must keep the same hash-join shape.
    for name in (
        "vs25_posdelete_change_feed",
        "vs27_per_commit_change_feed",
        "vs28_mapcol_change_feed",
    ):
        plan = _plan(spark, registry, name, sf_dir)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def should_answer_vs26_delete_files_audit_without_any_parquet_scan(
    spark, registry, sf_dir
):
    # the delete-files inspection (pending-delete entry counts) is
    # driver-built from the manifest — counts were recorded at
    # delete-commit time, so the audit plan must contain no parquet
    # scan at all (the compact-now decision is a catalog read).
    plan = _plan(spark, registry, "vs26_delete_files_audit", sf_dir)
    assert "Scan parquet" not in plan, plan


def should_broadcast_group_table_for_dd15_election(spark, registry, sf_dir):
    # dd15: the canonical-winner election joins the pair-graph-sized
    # group table into the corpus via BROADCAST (never a corpus
    # shuffle-join), aggregates with a partial-aggregable struct-max,
    # and goes nowhere near a cartesian.
    plan = _plan(spark, registry, "dd15_canonical_dedup_decision", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def should_prune_vs24_window_to_intersecting_time_slices(spark, registry, sf_dir):
    # vs24's fixture: the 4-day window intersects one weekly slice —
    # the read must plan a strict subset of the lake's files from the
    # recorded ts micros bounds alone, and a whole-history window must
    # keep everything (no over-pruning).
    import datetime as dt

    from geospatial_data_lake_spark.operators.lake_queries import (
        _build_ts_stats_lake,
    )

    mt = _build_ts_stats_lake(spark, sf_dir)
    total = len(mt.planned_files())
    win = (dt.datetime(2024, 1, 9), dt.datetime(2024, 1, 12, 23, 59, 59))
    pruned = len(mt.planned_files(where={"ts": win}))
    assert 0 < pruned < total
    wide = (dt.datetime(2023, 1, 1), dt.datetime(2025, 1, 1))
    assert len(mt.planned_files(where={"ts": wide})) == total
