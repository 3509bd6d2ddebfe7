"""BigQuery-dialect function shims, expressed as Catalyst expressions.

Every function the reference's SQL models use (SURVEY.md §2.8) that has
semantic drift between BigQuery and Spark SQL lives here, so models written
against this module behave like the reference while staying 100%% JVM-side
(no Python UDFs — the reference itself uses none, SURVEY.md §2.10, which
keeps the whole plan inside whole-stage codegen at 100 TB scale).
"""

from dbt_repo_spark.functions.bq import (
    countif,
    format_date,
    generate_date_array,
    json_extract,
    json_extract_array,
    json_extract_scalar,
    safe_cast,
    safe_divide,
    surrogate_key,
    timestamp_diff,
    timestamp_trunc,
)

__all__ = [
    "countif",
    "format_date",
    "generate_date_array",
    "json_extract",
    "json_extract_array",
    "json_extract_scalar",
    "safe_cast",
    "safe_divide",
    "surrogate_key",
    "timestamp_diff",
    "timestamp_trunc",
]
