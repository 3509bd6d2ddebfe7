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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on /root/testdata/sf0.001."""
    return QUERIES["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` (same column names).

    Keys absent here (dedup_minhash_lsh, dedup_simhash, embed_lsh_topk,
    multimodal_features, bpe_tokenize, ...) are non-SQL-expressible
    (seeded xxhash64 / approximate recall / mapInPandas / iterative merge
    learning) → driver records rows-only checks.
    """
    return dict(ORACLES)
