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

# Queries that already have a green driver-side CORRECTNESS row (round 1
# checked only the first 50 registry entries). Ordering the registry
# least-recently-verified-first rotates unchecked operators into the
# driver's check window each round; previously-green entries re-verify
# last. Update this set from the newest CORRECTNESS_r{N}.json per round.
_DRIVER_GREEN = {
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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on /root/testdata/sf0.001."""
    return QUERIES["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered least-recently-driver-verified first so a bounded check
    window still reaches every operator across rounds.
    """
    unchecked = {k: v for k, v in QUERIES.items() if k not in _DRIVER_GREEN}
    checked = {k: v for k, v in QUERIES.items() if k in _DRIVER_GREEN}
    return {**unchecked, **checked}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` (same column names).

    Keys absent here (dedup_minhash_lsh, dedup_simhash, embed_lsh_topk,
    multimodal_features, bpe_tokenize, ...) are non-SQL-expressible
    (seeded xxhash64 / approximate recall / mapInPandas / iterative merge
    learning) → driver records rows-only checks.
    """
    return dict(ORACLES)
