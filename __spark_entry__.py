"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extension ops) to a (spark, sf_dir) -> DataFrame callable; ``oracle_sql()``
holds the DuckDB-equivalent ANSI SQL for each SQL-expressible query.
Registry lives in dbt_repo_spark/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_repo_spark.queries import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Driver-side correctness evidence ledger. The driver checks a bounded
# window (first ~50 registry entries) per round, so ``queries()`` orders
# entries never-driver-checked first, then this-round rechecks, then
# least-recently-verified. Refresh per round from CORRECTNESS_r{N}.json.
_CHECKED_R01 = {
    "pricing_summary", "stg_projection", "typed_null_filter", "surrogate_keys",
    "latest_per_key", "sessions_daily", "mart_region_revenue", "trip_metrics",
    "customer_orders", "dim_distinct", "date_spine", "incremental_antijoin",
    "semi_join_exists", "supplier_diversity", "exists_not_exists",
    "left_join_null_handling", "case_when_bucketing", "json_extract_props",
    "explode_tokens", "datetime_battery", "safe_math", "scalar_subquery",
    "set_union", "set_intersect", "set_except_intersect_all",
    "small_quantity_revenue", "large_volume_customers", "set_except",
    "window_running", "top_k_per_group", "rollup_agg", "distinct_count",
    "events_dedup_count", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "embed_cosine_topk",
    "embed_lsh_topk", "embed_cosine_topk_np", "embed_ivf_topk",
    "embed_pq_topk", "dedup_embed_cosine", "text_lang_id", "text_quality",
    "text_token_stats", "text_fingerprints", "multimodal_frames",
    "events_asof_last_signup",
}
_CHECKED_R02 = {
    "similarity_join_prefix", "multimodal_features",
    "asof_purchase_last_signup_value", "percentile_battery",
    "histogram_equidepth", "pivot_event_counts", "unpivot_measures",
    "window_offsets", "variant_json_extract", "regex_battery",
    "group_concat_sorted", "null_safe_join", "string_battery",
    "array_battery", "entity_resolution_docs", "fuzzy_match_levenshtein",
    "grouping_sets_agg", "timeseries_gapfill", "map_battery",
    "heavy_hitters_events", "next_event_training_pairs",
    "event_transition_matrix", "graph_pagerank_parts",
    "distinct_sketch_rollup", "approx_distinct_sketch", "salted_join_skew",
    "tumbling_window_counts", "session_windows", "training_data_pipeline",
    "multimodal_resize", "streaming_parse_dedup", "sample_stratified_events",
    "sample_cap_per_user", "sample_hash_split", "pack_sequences",
    "dedup_clusters", "range_join_order_windows", "text_pii_redaction",
    "funnel_signup_purchase", "scd2_event_state", "dedup_incremental_minhash",
    "sample_weighted_orders", "text_top_terms", "text_bigram_lm",
    "text_chunking", "text_tfidf_topk", "text_repetition",
    "decontaminate_eval_ngrams", "embed_preprocess", "anomaly_trailing_zscore",
}

# Never checked: lead the window with the TPC-H-shape rewrites (materially
# rewritten in r02, only local-oracle evidence so far), then the rest.
_NEVER_CHECKED_FIRST = [
    "promo_revenue_share", "customer_order_distribution",
    "top_revenue_supplier", "important_parts_share",
    "min_price_supplier_per_part", "nation_pair_trade",
    "national_market_share", "product_profit_by_nation_year",
    "disjunctive_predicate_revenue", "idle_customer_outreach",
]

# Changed/failed this round — re-verify right after the never-checked set:
# timeseries_gapfill (r02 FAIL: oracle TIMESTAMPTZ drift, oracle fixed r03),
# fuzzy_match_levenshtein (PassJoin segment blocking), streaming_parse_dedup
# (gains a batch DuckDB twin), sketches/pagerank (gain in-plan error
# metrics), embed_pq_topk (shared recall-audit scan), dedup_clusters /
# dedup_ngram_jaccard (headline plan moved to the scale path).
_RECHECK_THIS_ROUND = [
    "timeseries_gapfill", "fuzzy_match_levenshtein", "streaming_parse_dedup",
    "approx_distinct_sketch", "distinct_sketch_rollup",
    "graph_pagerank_parts", "embed_pq_topk", "dedup_ngram_jaccard",
    "dedup_clusters",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on /root/testdata/sf0.001."""
    return QUERIES["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so a bounded driver check window reaches every operator:
    never-driver-checked first (TPC-H rewrites leading), then queries
    changed this round, then round-1 greens (least recently verified),
    then round-2 greens.
    """
    checked = _CHECKED_R01 | _CHECKED_R02
    recheck = set(_RECHECK_THIS_ROUND)

    def rank(item: tuple[int, str]) -> tuple[int, int]:
        idx, name = item
        if name in _NEVER_CHECKED_FIRST:
            return (0, _NEVER_CHECKED_FIRST.index(name))
        if name not in checked:
            return (1, idx)
        if name in recheck:
            return (2, _RECHECK_THIS_ROUND.index(name))
        if name in _CHECKED_R01:
            return (3, idx)
        return (4, idx)

    ordered = sorted(enumerate(QUERIES), key=rank)
    return {name: QUERIES[name] for _, name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` (same column names).

    Keys absent here (dedup_minhash_lsh, dedup_simhash, embed_lsh_topk,
    multimodal_features, bpe_tokenize, ...) are non-SQL-expressible
    (seeded xxhash64 / approximate recall / mapInPandas / iterative merge
    learning) → driver records rows-only checks.
    """
    return dict(ORACLES)
