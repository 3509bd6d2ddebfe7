"""SQL-surface twins of the BigQuery-dialect shims (Spark 4 SQL UDFs).

``functions/bq.py`` gives DataFrame authors the reference's BigQuery
idioms (`models/marts/mart_station_availability.sql:23` safe_divide,
`models/staging/stg_station_information.sql:26-37` json_extract_scalar,
`models/facts/fact_trips.sql:9-16` md5 surrogate keys, ...). This
registers the same semantics as CREATE TEMPORARY FUNCTION SQL UDFs, so
a pure-SQL consumer (`spark.sql`, the CLI explain verb, notebook SQL
cells) writes the dialect too — one semantics, two surfaces.

SQL UDFs are expression rewrites, not Python: Catalyst inlines the body
into the caller's plan (whole-stage codegen, pushdown — verified by the
plan test), so there is NO UDF-boundary cost. Parity with the Column
shims is pinned by test on shared inputs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DEFS = [
    # BQ SAFE_DIVIDE: NULL on zero/NULL denominator
    """CREATE OR REPLACE TEMPORARY FUNCTION bq_safe_divide(num DOUBLE, den DOUBLE)
       RETURNS DOUBLE
       RETURN CASE WHEN den = 0 OR den IS NULL THEN NULL ELSE num / den END""",
    # BQ COUNTIF is an aggregate; the scalar building block is the
    # 0/1 indicator it folds (SUM(bq_if(cond)) == COUNTIF(cond))
    """CREATE OR REPLACE TEMPORARY FUNCTION bq_if(cond BOOLEAN)
       RETURNS BIGINT
       RETURN CASE WHEN cond THEN 1 ELSE 0 END""",
    # BQ SAFE_CAST to INT64: NULL on unparseable (ANSI CAST would throw).
    # Non-whitespace C0 control chars NULL out before the cast so the
    # semantics match DuckDB TRY_CAST / BQ SAFE_CAST instead of Spark's
    # wider trimAll (same contract as functions/bq.py::safe_cast).
    r"""CREATE OR REPLACE TEMPORARY FUNCTION bq_safe_cast_int64(s STRING)
       RETURNS BIGINT
       RETURN try_cast(CASE WHEN s RLIKE '[\\x00-\\x08\\x0E-\\x1F\\x7F-\\x9F]'
                            THEN NULL ELSE s END AS BIGINT)""",
    r"""CREATE OR REPLACE TEMPORARY FUNCTION bq_safe_cast_float64(s STRING)
       RETURNS DOUBLE
       RETURN try_cast(CASE WHEN s RLIKE '[\\x00-\\x08\\x0E-\\x1F\\x7F-\\x9F]'
                            THEN NULL ELSE s END AS DOUBLE)""",
    # BQ JSON_EXTRACT_SCALAR with a $.field path
    """CREATE OR REPLACE TEMPORARY FUNCTION bq_json_extract_scalar(j STRING, path STRING)
       RETURNS STRING
       RETURN get_json_object(j, path)""",
    # the md5-of-concat surrogate-key idiom (reference fact_trips.sql:
    # 9-16), 2-col form — SAME canonical rendering as the Column shim
    # (functions/bq.py::surrogate_key: '|' separator, '' for NULL) so
    # keys agree across both surfaces
    """CREATE OR REPLACE TEMPORARY FUNCTION bq_surrogate_key2(a STRING, b STRING)
       RETURNS STRING
       RETURN md5(concat(coalesce(a, ''), '|', coalesce(b, '')))""",
    # BQ TIMESTAMP_TRUNC to a named unit. WEEK is the dialect trap:
    # BQ weeks start SUNDAY, Spark's start Monday (same mapping as
    # functions/bq.py::timestamp_trunc); ISOWEEK keeps Monday. Units
    # outside the Python shim's supported set (WEEK(<WEEKDAY>), ISOYEAR,
    # typos) RAISE here too — a silent date_trunc fall-through would
    # return NULL or Monday-week semantics and the two surfaces would
    # diverge on exactly the inputs the shim rejects.
    """CREATE OR REPLACE TEMPORARY FUNCTION bq_timestamp_trunc(ts TIMESTAMP, unit STRING)
       RETURNS TIMESTAMP
       RETURN CASE
         WHEN lower(unit) = 'week'
           THEN date_trunc('week', ts + interval 1 day) - interval 1 day
         WHEN lower(unit) = 'isoweek' THEN date_trunc('week', ts)
         WHEN lower(unit) IN ('microsecond', 'millisecond', 'second',
                              'minute', 'hour', 'day', 'month',
                              'quarter', 'year')
           THEN date_trunc(unit, ts)
         ELSE CAST(raise_error(concat('unsupported timestamp_trunc unit: ',
                                      coalesce(unit, 'NULL')))
                   AS TIMESTAMP) END""",
    # BQ TIMESTAMP_DIFF in seconds (tz-independent on NTZ inputs)
    """CREATE OR REPLACE TEMPORARY FUNCTION bq_timestamp_diff_seconds(fin TIMESTAMP, start TIMESTAMP)
       RETURNS BIGINT
       RETURN CAST(unix_micros(fin) - unix_micros(start) AS BIGINT) DIV 1000000""",
]


def register_sql_shims(spark: SparkSession) -> list[str]:
    """Install the dialect into the session catalog; returns the
    function names registered (temporary — session-scoped, no catalog
    pollution across jobs)."""
    names = []
    for ddl in _DEFS:
        spark.sql(ddl)
        names.append(ddl.split("FUNCTION", 1)[1].split("(", 1)[0].strip())
    return names
