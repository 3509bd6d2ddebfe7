"""Physical-plan regression tests: the plan properties that matter at
100 TB, asserted so a refactor can't silently lose them.

- filters reach the parquet scan (PushedFilters)
- scans are column-pruned (ReadSchema)
- dimension joins broadcast
- incremental anti-join broadcasts the key set
- latest-per-key uses WindowGroupLimit (map-side top-k pruning)
- no row-at-a-time Python UDFs anywhere in SQL-expressible queries
"""

from __future__ import annotations

import pytest

from dbt_repo_spark.queries import ORACLES, QUERIES


def _plan(spark, name: str, mode: str = "formatted") -> str:
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: exactly the 7 needed columns, not the full lineitem
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert read.count(":") - 1 <= 8 and "l_comment" not in read


def test_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "mart_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "SortMergeJoin" not in plan


def test_incremental_antijoin_shape(spark):
    plan = _plan(spark, "incremental_antijoin")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_latest_per_key_window_group_limit(spark):
    plan = _plan(spark, "latest_per_key")
    # Spark's rank-limit pushdown: partial top-1 before AND after the
    # shuffle, so the exchange carries ≤1 row per key per map task
    assert plan.count("WindowGroupLimit") >= 2


def test_no_python_udfs_in_oracle_queries(spark):
    """Every SQL-expressible query stays JVM-side (BatchEvalPython/
    ArrowEvalPython would mean a Python boundary in the hot path)."""
    offenders = []
    for name in sorted(ORACLES):
        plan = _plan(spark, name, "simple")
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"Python UDFs in: {offenders}"


def test_salted_join_spreads_key(spark):
    """The salted join must join on (key, salt), not key alone."""
    plan = _plan(spark, "salted_join_skew")
    assert "__salt" in plan


@pytest.mark.parametrize("name", ["dedup_exact", "text_fingerprints"])
def test_single_scan_queries_read_pruned(spark, name):
    plan = _plan(spark, name)
    read_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_lines, "expected a parquet scan"
    # documents has 5 columns; these queries need ≤2
    assert all(("doc_id" in l or "text" in l) for l in read_lines)
    assert all("lang" not in l and "source" not in l for l in read_lines)


def test_cap_per_key_window_group_limit(spark):
    """Constant-cap per-key sampling must prune map-side (WindowGroupLimit
    before the exchange), keeping the shuffle O(keys x cap) under skew."""
    plan = _plan(spark, "sample_cap_per_user")
    assert "WindowGroupLimit" in plan


def test_hash_split_no_shuffle(spark):
    """hash_split is a pure projection — no exchange before the aggregate's
    own shuffle would appear; the split assignment itself adds none."""
    from dbt_repo_spark.operators.sampling import hash_split
    df = hash_split(spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
                    "event_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_range_join_query_plans_equi(spark):
    """The registered range-join query must stay a bucketed equi-join —
    a regression to BroadcastNestedLoop would be quadratic at scale."""
    plan = _plan(spark, "range_join_order_windows")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_funnel_and_scd2_no_cartesian(spark):
    for name in ("funnel_signup_purchase", "scd2_event_state"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_correlated_subquery_decorrelates(spark):
    """Catalyst must rewrite the correlated scalar subquery into an
    aggregate+join, not a per-row subquery execution."""
    plan = _plan(spark, "correlated_subquery")
    assert "HashAggregate" in plan
    assert "Join" in plan


def test_shipping_priority_topk_shape(spark):
    plan = _plan(spark, "shipping_priority_topk")
    # global ORDER BY + LIMIT must compile to per-partition top-k + driver
    # merge, never a full sort
    assert "TakeOrderedAndProject" in plan
    # the mktsegment-filtered customer side broadcasts
    assert "BroadcastHashJoin" in plan
    # both date predicates reach their scans
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime semi-join reduction: a selective dim-side filter injects a
    bloom filter that prunes the fact scan BEFORE the join shuffle
    (InjectRuntimeFilter, default-on). The application-side threshold is
    10GB in production — right for the 100 TB target, where this turns a
    full-fact shuffle into a filtered one; here it's scaled down to the
    fixture size to pin the plan shape."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # shuffle join: filter matters
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        plan = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_null_safe_join_is_hash_join(spark):
    """eqNullSafe is a valid equi-join key: no nested-loop fallback."""
    plan = _plan(spark, "null_safe_join", "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# Shuffle budgets: Exchange-node count per oracle query at sf0.001,
# pinned at the current (reviewed) plan. A refactor that ADDS a shuffle
# fails here; removing one is an improvement — update the budget down.
# recursive_order_chain is excluded: its UnionLoop prints per-iteration
# sub-plans whose exchange count depends on cache state at explain time.
EXCHANGE_BUDGETS = {
    # eval family: auc = score-group agg + final reduce (the prefix-sum
    # range shuffle is pinned behind localCheckpoint); loo = 1 keyed agg
    # + 3 broadcast exchanges (fact never shuffles by the 5-value key)
    "eval_auc_roc": 2,
    "target_encode_loo": 4,
    "eval_calibration_bins": 1,
    "benford_audit": 2,
    # r8: +1 — the entity-sized global-ntile sort left the plan (now a
    # two-phase checkpointed rank); remaining exchanges are the decile
    # hash-agg plus one SinglePartition feeding the two windows over the
    # 10-row aggregate
    "lift_gains_deciles": 3,
    # retrieval family: bm25 = ctf agg + 3 small distinct/dfreq aggs +
    # dl-join (2 sides) + per-(query,doc) agg + rank window +
    # SinglePartition stats + 6 broadcasts; fusion adds the cosine leg's
    # rank window + the full-outer fuse (2) + fused-rank window
    "text_bm25_topk": 15,
    "retrieval_rank_fusion": 22,
    # two linear hash aggs + the left-join back to the doc scan
    "text_char_entropy": 3,
    # gram-occurrence agg + join-back + per-doc island window
    "dedup_substring_spans": 3,
    # gram owner agg + join-back + covered distinct + anti-join + rebuild
    "dedup_substring_rewrite": 6,
    # block-hash owner agg + owner join-back + per-doc rebuild + doc join
    "dedup_paragraph_rewrite": 4,
    # incremental twin: both halves block independently (corpus index
    # owner agg + batch owner agg + index anti-join + rebuild + doc
    # join) and each half pays the 0.8*count threshold scalar agg
    # (SinglePartition + broadcast) — all batch/doc-count bounded
    "dedup_paragraph_incremental": 14,
    # substring incremental: corpus distinct-gram agg + batch owner agg
    # + index probe + covered distinct + token anti-join + rebuild +
    # the two threshold scalar aggs — gram/token-count bounded
    "dedup_substring_incremental": 18,
    # eval grams distinct + train (doc,gram) distinct + hit agg +
    # totals agg + two left joins back to the doc scan
    "decontaminate_train_eval": 8,
    # four doc-keyed aggregate legs (block owner+fold, bigram top,
    # gram-count + coverage distinct) + three left joins back
    "text_repetition_scores": 11,
    # one broadcast join (doc->vector) + one grouped conditional-count
    "embedding_quality_audit": 2,
    # sketch + certificate lattice: 4 gram-relation consumers, per-pair
    # merge window, mostly broadcast exchanges on pair-sized relations
    "sketch_kmv_source_overlap": 33,
    # ks scans the checkpointed grouped relation from two consumers
    # (max, argmax — totals ride along as literals from the prefix-sum's
    # partition job); each re-windows by _pid; all post-reduce
    "ks_two_sample_price": 5,
    "feature_corr_matrix": 2,
    "mutual_info_cells": 3,
    "daily_revenue_autocorr": 3,
    "ab_test_proportions": 3,
    "table_diff_orders": 3,
    "attribution_linear": 3,
    "attribution_u_shaped": 3,
    "forecast_error_battery": 2,
    # zipf: term agg + dense-ids rank join (broadcast) + moments + vocab
    "zipf_token_fit": 6,
    "dup_rate_by_source": 2,
    "masked_customer_view": 0,
    # overlap: seeded borrow join + pinned distinct sigs + self-join
    "source_overlap_matrix": 7,
    "ab_test_power_plan": 2,
    "conversion_wilson_ci": 3,
    # banded sign-LSH near-dup: band-key self-join + pair distinct +
    # two verify joins (broadcast at fixture scale) — never all pairs
    "embed_near_dup_pairs": 8,
    "survival_repeat_purchase": 6,
    "geo_fence_containment": 0,
    "geo_multi_fence_assign": 2,
    "order_priority_late_check": 3,
    "forecast_revenue_change": 1,
    "geo_radius_pairs": 1,
    "geo_nearest_supplier": 2,
    "geo_grid_density": 1,
    "geo_trip_distance": 1,
    "array_battery": 0,
    "welch_ttest": 1,
    "order_gap_distribution": 2,
    "segment_migration_matrix": 12,
    "text_readability": 0,
    "langid_confusion": 6,
    "shipping_delay_profile": 2,
    "supplier_hhi": 3,
    "abc_xyz_parts": 8,
    "cohort_ltv": 7,
    "new_vs_returning": 4,
    "stickiness_ratio": 8,
    "trending_users_weekly": 2,
    "weekly_growth": 2,
    "interarrival_histogram": 2,
    "max_drawdown_netflow": 2,
    "pareto_8020_customers": 5,
    "asof_nearest_event": 1,
    "aggregate_battery": 1,
    "funnel_bounded_delay": 12,
    "median_confidence_interval": 7,
    "contrastive_training_pairs": 1,
    "quantile_normalize": 11,
    "release_audit_pipeline": 15,
    "seasonal_robust_anomaly": 6,
    "returned_item_report": 4,
    "join_key_skew_report": 4,
    "rfm_segments": 2,
    "attribution_last_touch": 2,
    "share_of_parent_rollup": 5,
    "rolling_active_users": 5,
    "co_purchase_lift": 13,
    "robust_scaler_mad": 5,
    "holt_linear_trend": 2,
    "cusum_changepoints": 2,
    "seasonal_naive_backtest": 2,
    "gini_by_group": 1,
    "psi_value_drift": 4,
    "multimodal_exact_dedup": 2,
    "ewma_daily_value": 2,
    "ohlc_resample": 1,
    "rolling_corr_daily": 2,
    "k_anonymity_audit": 4,
    "ols_multifeature_cramer": 1,
    "temporal_split_leakage": 2,
    "asof_purchase_last_signup_value": 2,
    "case_when_bucketing": 1,
    "correlated_subquery": 2,
    "cube_agg": 1,
    "customer_orders": 2,
    "date_spine": 1,
    "datetime_battery": 0,
    "decontaminate_eval_ngrams": 8,
    "dedup_clusters": 0,
    "dedup_embed_cosine": 3,
    "dedup_canonical_quality": 4,
    "dedup_exact": 1,
    "dedup_semantic": 11,
    "dedup_ngram_jaccard": 10,
    "dedup_pairs_scale": 12,
    "fuzzy_match_passjoin": 8,
    "dim_distinct": 1,
    "distinct_count": 2,
    "embed_cosine_topk": 4,
    "embed_preprocess": 0,
    "events_asof_last_signup": 1,
    "events_winsorized": 2,
    "events_dedup_count": 2,
    "exists_not_exists": 2,
    "explode_tokens": 2,
    "full_outer_reconciliation": 2,
    "funnel_signup_purchase": 12,
    # 2 = fan_out repartition + salted-join shuffle (salt spreads ~160
    # block keys across 8x tasks; bought 4.4s -> 0.7s at sf0.1)
    "fuzzy_match_levenshtein": 2,
    "group_concat_sorted": 1,
    "grouping_sets_agg": 1,
    "groupwise_ols_slope": 1,
    "heavy_hitters_events": 3,
    "histogram_equidepth": 1,
    "incremental_antijoin": 1,
    "json_extract_props": 1,
    "lateral_join_topk": 2,
    "latest_per_key": 1,
    "left_join_null_handling": 1,
    "map_battery": 0,
    "mart_region_revenue": 5,
    "multimodal_frames": 0,
    # real-decode family (r07): the only exchange is fan_out's one
    # round-robin spread before the Arrow decode stage — generation,
    # decode, and stats are all map-side
    "multimodal_features": 1,
    "multimodal_resize": 1,
    "multimodal_audio_decode": 1,
    "multimodal_audio_resample": 1,
    "null_ordering": 1,
    "null_safe_join": 2,
    "pack_sequences": 1,
    "percentile_battery": 1,
    "pivot_event_counts": 2,
    "pricing_summary": 1,
    "profile_orders": 2,
    "quantile_sketch_rollup": 10,
    "range_join_order_windows": 2,
    "regex_battery": 0,
    "rollup_agg": 3,
    "safe_math": 1,
    "salted_join_skew": 2,
    "sample_cap_per_user": 1,
    "sample_domain_mixture": 6,
    "sample_hash_split": 1,
    "sample_stratified_events": 1,
    "sample_token_budget_mixture": 1,
    "sample_weighted_orders": 0,
    "scalar_subquery": 2,
    "scd2_event_state": 1,
    "semi_join_exists": 1,
    "session_windows": 1,
    "similarity_join_prefix": 24,  # +1 cold-print artifact: the persisted prefix/sh working sets print their build exchanges per reference; runtime materializes once (44s->12.5s at sf0.1)
    "sessions_daily": 1,
    "set_except": 2,
    "set_intersect": 2,
    "set_union": 1,
    "shipping_priority_topk": 3,
    "sliding_window_counts": 1,
    "stats_battery": 1,
    "stg_projection": 0,
    "string_battery": 0,
    "supplier_diversity": 4,
    "surrogate_keys": 0,
    "text_bigram_lm": 15,
    "text_chunking": 0,
    "text_dup_passages": 5,
    "text_feature_hashing": 2,
    "text_fingerprints": 0,
    "text_lang_id": 0,
    "text_pii_redaction": 0,
    "text_quality": 0,
    "text_quality_classifier": 0,
    "text_repetition": 0,
    "text_tfidf_topk": 8,
    "text_token_stats": 0,
    "text_top_terms": 1,
    "timeseries_gapfill": 4,
    "top_k_per_group": 1,
    "training_data_pipeline": 5,
    # 8 since r06: the persist of the scrubbed-corpus relation prints its
    # cached subtree (incl. the quality-gate broadcast exchange) inside
    # InMemoryRelation — one-time materialization cost, shared by the
    # three consumers that previously each re-ran the regexp chain
    "training_data_pipeline_v2": 8,
    "trip_metrics": 1,
    "tumbling_window_counts": 1,
    "typed_null_filter": 0,
    "variant_json_extract": 1,
    "entity_resolution_docs": 0,
    "anomaly_trailing_zscore": 1,
    "next_event_training_pairs": 1,
    "event_transition_matrix": 3,
    "set_except_intersect_all": 2,
    "small_quantity_revenue": 4,
    "large_volume_customers": 5,
    "unpivot_measures": 0,
    "vocab_dense_ids": 0,
    "window_offsets": 1,
    "window_running": 1,
    "window_time_range": 1,
    "window_value_offsets": 1,
    # round-3 continuation: rank battery + islands share one user_id
    # shuffle each; impute is agg+broadcast-back; pareto is ONE lang
    # shuffle (the n² NOT-EXISTS twin lives only in the oracle);
    # triangle census's 3 single-partition exchanges are the final
    # single-row census aggregates; cooccurrence's exchanges are all on
    # vocab-bounded (<=C(V,2)-row) relations after the top-V semi-join;
    # count-min estimates join a broadcast KB-sized merged sketch.
    "window_rank_battery": 1,
    "collapse_event_runs": 1,
    "impute_event_values": 2,
    "pareto_frontier_docs": 1,
    "graph_triangle_census": 10,
    "token_cooccurrence_lift": 19,
    "countmin_user_counts": 4,
    # batch 2: group-split's single-partition exchange is the 1-row
    # leakage certificate; the sweep-line concurrency query runs its
    # window AND final agg through ONE event_type exchange;
    # contingency's margins derive from the |types|×7 cell table and
    # join back broadcast (single-partition = the 1-row N).
    "sample_group_split": 7,
    "cohort_retention": 7,
    "max_concurrent_sessions": 1,
    "contingency_event_dow": 10,
}


# Headline queries allowed to shuffle on a raw shingle key:
# dedup_minhash_lsh's SAMPLED ground-truth recall audit re-runs the exact
# inverted-index join on a seeded 50% document sample — the audit metric
# is the point, and at production scale the sample fraction shrinks.
# text_dup_passages joins each (doc, gram) row to the gram's df — output
# is Σ df (LINEAR in corpus size), never the Σ df² of the pair join; the
# banned shape is the self-join, not the key.
_SHINGLE_JOIN_EXEMPT = {"dedup_minhash_lsh", "text_dup_passages"}


def test_no_quadratic_shingle_join_on_headline(spark):
    """No headline bench query may execute the Σ df(shingle)² inverted-
    index self-join: its shuffle key would be the raw shingle, whose
    frequency skew (stopword shingles with df ~ |corpus|) is what makes
    the naive join quadratic at 100 TB. The quadratic form survives only
    as the oracle twin (dedup_ngram_jaccard, off the bench) and the
    sampled audit exempted above."""
    import bench

    for name in bench.HEADLINE:
        if name in _SHINGLE_JOIN_EXEMPT or name == "recursive_order_chain":
            continue
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(shingle" not in plan, (
            f"{name}: raw-shingle shuffle in headline plan"
        )


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGETS))
def test_exchange_budget(spark, name):
    # a relation persisted by an earlier test (e.g. the shared minhash
    # index) swaps InMemoryTableScan into the plan and shifts the
    # exchange count — pin the budget against the cold plan
    spark.catalog.clearCache()
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    got = plan.count("Exchange ")
    assert got <= EXCHANGE_BUDGETS[name], (
        f"{name}: {got} exchanges > budget {EXCHANGE_BUDGETS[name]} - "
        "a shuffle crept into this plan"
    )


def test_dynamic_partition_pruning_on_catalog_table(spark, tmp_path):
    """A date-partitioned fact joined to a filtered dim scans only the
    partitions the dim's filter selects — the plan carries a
    dynamicpruning subquery in the fact's PartitionFilters. At 100 TB
    this is the difference between scanning one day and scanning the
    table when the predicate arrives through a join."""
    from pyspark.sql import functions as F

    from dbt_repo_spark.queries import t
    from dbt_repo_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    ev = t(spark, "/root/testdata/sf0.001", "events").withColumn(
        "event_date", F.to_date("ts")
    )
    cat.write(ev, "analytics", "events_p", partition_by=["event_date"])
    # DPP requires a SELECTIVE predicate on the build side (a bare limit
    # doesn't qualify) — this mirrors the real shape: dim filtered, fact
    # pruned through the join
    dates = (
        ev.select("event_date")
        .distinct()
        .filter(F.col("event_date") < F.lit("2024-01-04").cast("date"))
    )

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
    try:
        fact = cat.read("analytics", "events_p")
        plan = (
            fact.join(F.broadcast(dates), "event_date")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "dynamicpruning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


# --- TPC-H-shaped queries (queries_tpch.py): the optimizer patterns the
# module docstring claims, pinned so they can't silently regress. ---


def test_top_revenue_supplier_single_fact_scan(spark):
    """Q15 shape (r8 re-plan): the revenue aggregate is pinned once
    (localCheckpoint — so lineitem appears ZERO times in the final plan:
    it was scanned exactly once at pin time, and the naive agg-vs-max
    formulation that rescans it 2-4x would show parquet scans here), the
    max is a plain two-level aggregate (no rank window, no single-task
    sort of the supplier relation), and both the max filter and the
    supplier join broadcast. The only single-partition exchange is the
    scalar-max aggregate over <=|partitions| partial rows."""
    plan = _plan(spark, "top_revenue_supplier", "simple")
    assert plan.count("lineitem.parquet") == 0  # pinned, not rescanned
    assert "rank(" not in plan and "Window" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("Exchange SinglePartition") <= 1


def test_disjunctive_predicate_partial_pushdown(spark):
    """Q19 shape: the OR-of-ANDs predicate must push the per-side
    supersets below the join — the lineitem scan carries the quantity
    disjunction, the part side the brand/size union — and the join
    broadcasts the dim."""
    plan = _plan(spark, "disjunctive_predicate_revenue")
    li_scan = next(
        l
        for l in plan.splitlines()
        if "PushedFilters" in l and "l_quantity" in l
    )
    assert "Or(" in li_scan  # quantity disjunction reached the fact scan
    p_scan = next(
        l for l in plan.splitlines() if "PushedFilters" in l and "p_brand" in l
    )
    assert "Brand#11" in p_scan and "Brand#22" in p_scan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize(
    "name,min_bhj",
    [
        ("promo_revenue_share", 1),  # Q14: part dim broadcasts
        ("nation_pair_trade", 5),  # Q7: supplier+nation x2+orders+customer
        ("national_market_share", 6),  # Q8: full star
        ("product_profit_by_nation_year", 4),  # Q9
        ("min_price_supplier_per_part", 1),  # Q2
    ],
)
def test_tpch_star_joins_broadcast_all_dims(spark, name, min_bhj):
    """Every dim side of the star joins must broadcast: a SortMergeJoin
    here would shuffle the fact on the join key at 100 TB."""
    plan = _plan(spark, name, "simple")
    assert plan.count("BroadcastHashJoin") >= min_bhj, name
    assert "SortMergeJoin" not in plan, name
    assert plan.count("lineitem.parquet") <= 1, name  # fact scanned once


def test_important_parts_share_single_scan_no_join(spark):
    """Q11 shape: per-part aggregate + window grand total — one fact
    scan, zero joins (the agg-vs-broadcast-total formulation scanned the
    fact twice through a nested-loop one-row join)."""
    plan = _plan(spark, "important_parts_share", "simple")
    assert plan.count("lineitem.parquet") == 1
    assert "Join" not in plan


def test_customer_order_distribution_two_pruned_shuffles(spark):
    """Q13 shape: LEFT join with residual + re-aggregation — both
    exchanges must carry only pruned columns (no wide rows)."""
    plan = _plan(spark, "customer_order_distribution")
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert reads and all("o_comment" not in l for l in reads)
    assert all("c_address" not in l and "c_phone" not in l for l in reads)



def test_pareto_frontier_no_self_join_no_global_sort(spark):
    """The skyline query must plan as windows over a lang-partitioned
    shuffle: no dominance self-join (the oracle's O(n²) shape) and no
    single-partition exchange (a global frontier sort would bottleneck
    one task)."""
    plan = _plan(spark, "pareto_frontier_docs")
    assert "Join" not in plan
    assert "Exchange SinglePartition" not in plan
    assert plan.count("documents.parquet") == 1


def test_cooccurrence_topk_plans_take_ordered(spark):
    """Both top-k stages (top-V vocabulary, top-pairs output) must plan
    as TakeOrderedAndProject — per-partition heaps, never a one-task
    full sort of the vocabulary or the pair set."""
    plan = _plan(spark, "token_cooccurrence_lift")
    assert "TakeOrderedAndProject" in plan
    # the vocab relation joins back broadcast — pair fan-out is bounded
    # before any pair exists
    assert "BroadcastHashJoin" in plan


def test_countmin_estimate_broadcasts_sketch(spark):
    """Probing the count-min sketch must broadcast the merged (KB-sized)
    counter relation — the probe side never shuffles to meet the
    sketch."""
    plan = _plan(spark, "countmin_user_counts")
    assert "BroadcastHashJoin" in plan


def test_window_rank_battery_single_window_pass(spark):
    """All four rank-family functions share one window spec: exactly one
    exchange, one sort."""
    plan = _plan(spark, "window_rank_battery")
    assert plan.count("Exchange ") == 1


def test_max_concurrency_single_exchange_no_self_join(spark):
    """The sweep-line concurrency plan must be one event_type exchange
    feeding window + final agg (exchange reuse), with no interval
    self-join (the O(n²) count-overlaps shape)."""
    plan = _plan(spark, "max_concurrent_sessions")
    assert "Join" not in plan
    assert plan.count("Exchange ") <= 1


def test_headline_names_registered():
    """Every bench headline entry must resolve in the registry — a rename
    that orphans a headline name should fail here, not in the driver's
    bench run."""
    import bench

    from dbt_repo_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicates"


def test_no_single_partition_window_in_ntile_family(spark):
    """r08 (r07 verdict ask #5): the four queries that used to assign
    global ntiles/order-statistic knots through an unpartitioned window
    now run on the two-phase range rank (ids.scalable_ntile /
    exact_order_statistics). Pin it: no ntile window function anywhere,
    and no Exchange SinglePartition over a data-sized relation. For
    lift_gains_deciles the only permitted single-partition exchanges
    feed the windows over its own n_buckets-row aggregate (<=10 rows by
    construction)."""
    spark.catalog.clearCache()
    for name in ("rfm_segments", "segment_migration_matrix",
                 "quantile_normalize", "abc_xyz_parts"):
        plan = _plan(spark, name)
        assert "ntile(" not in plan, name
        assert "Exchange SinglePartition" not in plan, name
    # r9 members: pareto_8020_customers runs its cumulative rank through
    # ordered_prefix_sums — the only single-partition exchange allowed
    # is the FINAL scalar aggregate over <=|partitions| partial rows (a
    # global window over the per-customer relation would also show up as
    # an unpartitioned Window, asserted absent).
    plan = _plan(spark, "pareto_8020_customers")
    assert "ntile(" not in plan
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("Exchange SinglePartition") <= 1
    assert "row_number()" not in body
    plan = _plan(spark, "lift_gains_deciles")
    assert "ntile(" not in plan
    # the decile assignment itself (entity-sized) must not funnel: every
    # remaining single-partition exchange sits above the 10-row hash
    # aggregate on 'decile'
    body = plan.split("== Physical Plan ==")[-1]
    # the two tiny cum/total windows over the decile aggregate
    assert body.count("Exchange SinglePartition") <= 2
    assert "HashAggregate" in body  # the decile reduce exists below them


def test_r9_family_plan_shapes(spark):
    """r9 wave plan pins: no sort-merge joins (every dim/scalar side
    broadcasts), no cartesian products, no ntile windows, and the only
    single-partition exchanges are scalar aggregates over
    <=|partitions|-row partials (bounded constants per query below).
    dsir_token_budget_resample is pinned at ZERO — its global running
    sum rides ordered_prefix_sums, the r8 two-phase discipline applied
    from birth."""
    budgets = {
        "dsir_importance_weights": 1,      # the tots scalar aggregate
        "dsir_token_budget_resample": 0,
        "woe_information_value": 1,        # the tp/tn scalar aggregate
        "text_containment_pairs": 0,
        "text_keyphrase_rake": 0,
        "graph_label_prop_communities": 0,
        "join_size_cm_estimate": 2,        # exact + estimate scalar aggs
    }
    for name, max_single in budgets.items():
        plan = _plan(spark, name, "simple")
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "ntile(" not in plan, name
        assert plan.count("Exchange SinglePartition") <= max_single, name
    # RAKE's one window is the per-document run-id prefix sum — never an
    # unpartitioned global window
    plan = _plan(spark, "text_keyphrase_rake")
    assert "windowspecdefinition(doc_id" in plan


def test_r10_tpch_breadth_plan_shapes(spark):
    """r10 TPC-H additions (Q5/Q20 analogues): predicate pushdown
    reaches the scans, dims broadcast, no cartesian products, and the
    Q20 membership test plans as a (broadcast) LEFT-SEMI join — the
    outer supplier side never rescans the fact."""
    plan = _plan(spark, "local_supplier_revenue")
    # the order-date window reaches the orders scan; region/nation/
    # supplier ride broadcasts; the only shuffle joins are the orders-
    # customer composite and the fact's single order-key shuffle
    assert "GreaterThanOrEqual(o_orderdate,1996-01-01" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan.split("== Physical Plan ==")[-1]

    plan = _plan(spark, "concentrated_supply_parts")
    # the name prefix prunes the part scan BEFORE the fact join
    assert "StringStartsWith(p_name,red )" in plan
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_r10_iterative_model_plan_shapes(spark):
    """r10 iterative-model pins: attribution_markov's fact work is the
    user-key path extraction (the chain solve runs on <=36-row
    relations); record_linkage_fs' fact work is the blocked self-join
    + one hash-agg to <=8 pattern rows (the EM crosses a 1-row state).
    Neither may plan a cartesian product over data-sized relations or a
    single-partition exchange outside scalar aggregates."""
    for name, max_single in (
        ("attribution_markov", 2),   # base + total-effect scalar aggs
        # one M-step global aggregate per EM round — each folds the
        # <=8-row pattern relation to the 1-row state (scalar-class)
        ("record_linkage_fs", 10),
        ("attribution_shapley", 2),  # v_full + total-effect scalar aggs
        # ordered_prefix_sums' offsets job + no global window anywhere
        ("eval_conformal_mondrian", 1),
        # the BH rank window + k_max/tot scalar aggregates all operate on
        # the |nations|-row (<=25) aggregate — bounded, never fact rows
        ("eval_bh_fdr", 4),
    ):
        plan = _plan(spark, name, "simple")
        assert "CartesianProduct" not in plan, name
        body = plan.split("== Physical Plan ==")[-1]
        assert body.count("Exchange SinglePartition") <= max_single, name


def test_r11_eval_plan_shapes(spark):
    """r11 pins: eval_isotonic_calibration's hull stages must reference
    the eagerly-checkpointed <=41-row bin relation (zero FileScans in
    the returned plan — without the barrier Catalyst re-expanded the
    eight join branches into eight fact scans), with at most the one
    contract-small lead-window exchange. eval_bootstrap_ci_mean's 64x
    expansion must fold map-side (partial aggregation before its
    shuffles, zero single-partition exchanges, no cartesian)."""
    plan = _plan(spark, "eval_isotonic_calibration", "simple")
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("FileScan parquet") == 0, "hull re-scanned the fact"
    assert body.count("Exchange SinglePartition") <= 1
    assert "CartesianProduct" not in body

    plan = _plan(spark, "eval_bootstrap_ci_mean", "simple")
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("Exchange SinglePartition") == 0
    assert "CartesianProduct" not in body
    assert "partial_" in body  # map-side fold before the shuffle
    # exactly the two intended fact scans: point estimate + replicates
    assert body.count("FileScan parquet") == 2
