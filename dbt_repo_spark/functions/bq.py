"""BigQuery → Spark SQL dialect shims (SURVEY.md §2.8).

Each shim documents the reference call site it replaces (file:line relative
to /root/reference/). All shims build Catalyst expressions from
``pyspark.sql.functions`` builtins — no Python executes per-row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


# --------------------------------------------------------------------------
# date / time
# --------------------------------------------------------------------------

_TRUNC_UNITS = {
    "microsecond", "millisecond", "second", "minute", "hour", "day",
    "month", "quarter", "year",
}


def timestamp_trunc(ts: ColumnOrName, unit: str) -> Column:
    """BQ ``timestamp_trunc(ts, HOUR)`` → Spark ``date_trunc('hour', ts)``.

    Arg order flips between dialects. Used by the reference at
    models/staging/stg_historic_trips.sql:24 and
    models/facts/fact_station_status.sql:21 (hourly truncation).

    WEEK is the dialect trap: BQ's WEEK starts SUNDAY while Spark's
    ``date_trunc('week', ...)`` starts Monday — passing it through
    would silently shift six days of rows into the wrong week. BQ
    WEEK maps to ``trunc_monday(ts + 1 day) - 1 day`` (Sunday floor);
    BQ ISOWEEK is Spark's Monday week unchanged. Unsupported BQ units
    (WEEK(<WEEKDAY>), ISOYEAR) raise instead of returning NULLs.
    """
    u = unit.lower()
    if u in _TRUNC_UNITS:
        return F.date_trunc(u, _col(ts))
    if u == "isoweek":
        return F.date_trunc("week", _col(ts))
    if u == "week":  # BQ: Sunday-start
        shifted = _col(ts) + F.expr("interval 1 day")
        return F.date_trunc("week", shifted) - F.expr("interval 1 day")
    raise ValueError(f"unsupported timestamp_trunc unit: {unit!r}")


def timestamp_diff(end: ColumnOrName, start: ColumnOrName, unit: str = "second") -> Column:
    """BQ ``timestamp_diff(a, b, SECOND)`` (a - b in whole units).

    Reference: models/staging/stg_historic_trips.sql:25. Implemented as an
    epoch subtraction so it stays a codegen'd long expression.
    """
    unit = unit.lower()
    divisors = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    if unit not in divisors:
        raise ValueError(f"unsupported timestamp_diff unit: {unit}")
    # BQ truncates the TRUE microsecond difference toward zero. The old
    # form floored each timestamp to seconds BEFORE subtracting, so
    # end=...1.1s, start=...0.9s gave 1 where BQ (and the
    # bq_timestamp_diff_seconds SQL twin) give 0. Spark's % keeps the
    # dividend's sign (Java semantics), so subtracting it truncates
    # toward zero; the remaining quotient is exact, and the DECIMAL
    # route keeps it exact past double's 2^53 (dates far from epoch).
    us = F.unix_micros(_col(end)) - F.unix_micros(_col(start))
    d = divisors[unit] * 1_000_000
    return ((us - us % d).cast("decimal(28,0)") / F.lit(d)).cast("long")


def generate_date_array(start: ColumnOrName, end: ColumnOrName) -> Column:
    """BQ ``generate_date_array(start, end)`` (inclusive, 1-day step).

    Reference: models/dimensions/dim_date.sql:19. Returns an array<date>;
    pair with ``F.explode`` for the UNNEST (J7).

    BQ returns an EMPTY array when start > end (positive step never
    reaches the bound); Spark's ``sequence`` raises
    IllegalArgumentException instead, so the inverted range is guarded
    explicitly (CASE WHEN short-circuits — the sequence branch never
    evaluates for inverted rows).
    """
    lo, hi = _col(start), _col(end)
    return F.when(
        lo <= hi, F.sequence(lo, hi, F.expr("interval 1 day"))
    ).otherwise(F.array().cast("array<date>"))


_BQ_TO_SPARK_FMT = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%A": "EEEE",
    "%B": "MMMM",
    "%j": "DDD",
}


def format_date(bq_pattern: str, d: ColumnOrName) -> Column:
    """BQ ``format_date('%Y%m%d', d)`` → Spark ``date_format(d, 'yyyyMMdd')``.

    Reference: models/dimensions/dim_date.sql:28. Translates the strftime
    pattern to Spark's SimpleDateFormat dialect.
    """
    pat = bq_pattern
    for bq, spark in _BQ_TO_SPARK_FMT.items():
        pat = pat.replace(bq, spark)
    if "%" in pat:
        raise ValueError(f"untranslated strftime directive in {bq_pattern!r}")
    return F.date_format(_col(d), pat)


# --------------------------------------------------------------------------
# safe_* (NULL-on-failure) family
# --------------------------------------------------------------------------

def safe_divide(num: ColumnOrName, den: ColumnOrName) -> Column:
    """BQ ``safe_divide(a, b)`` — NULL on division by zero.

    Reference: models/facts/fact_station_uptime.sql:32. Spark's
    ``try_divide`` has identical semantics.
    """
    return F.try_divide(_col(num), _col(den))


# Control characters that Spark's try_cast silently trims before parsing
# (UTF8String.trimAll strips Character.isWhitespace + isISOControl: C0,
# DEL, and C1 ranges) but that DuckDB TRY_CAST and BigQuery SAFE_CAST
# treat as parse failures: every control char EXCEPT the five standard
# whitespace chars \t \n \v \f \r (0x09-0x0D), which all three engines
# trim. Inputs containing any of these yield NULL for non-string targets —
# that is the documented cross-engine contract (verified by a full C0+C1
# sweep vs DuckDB; Hypothesis regression in tests/test_shim_properties.py).
_NON_WS_CONTROL_RE = "[\\x00-\\x08\\x0E-\\x1F\\x7F-\\x9F]"


def safe_cast(c: ColumnOrName, to_type: str) -> Column:
    """BQ ``safe_cast(x AS t)`` — NULL instead of error on bad input.

    Contract (documented after a Hypothesis-found drift, round 4 verdict):
    for non-string targets, inputs containing ASCII control characters
    outside standard whitespace (``\\x00-\\x08``, ``\\x0E-\\x1F``) return
    NULL, matching DuckDB ``TRY_CAST`` / BQ ``SAFE_CAST``. Bare
    ``try_cast`` would instead trim them (Spark ``UTF8String.trimAll``)
    and parse the remainder — e.g. ``'0\\x1f'`` → ``0.0`` in Spark but
    NULL in DuckDB/BQ. String-family targets keep plain ``try_cast``
    (identity casts must not NULL control chars).

    Reference: models/staging/stg_station_tariffs.sql:20-26.
    """
    col = _col(c)
    target = to_type.strip().lower()
    if target.startswith(("string", "varchar", "char", "binary")):
        return col.try_cast(to_type)
    return (
        F.when(col.cast("string").rlike(_NON_WS_CONTROL_RE), F.lit(None))
        .otherwise(col)
        .try_cast(to_type)
    )


# --------------------------------------------------------------------------
# aggregates
# --------------------------------------------------------------------------

def countif(cond: Column) -> Column:
    """BQ ``countif(cond)`` → Spark ``count_if``.

    Reference: models/marts/mart_station_uptime.sql:11-16.
    """
    return F.count_if(cond)


# --------------------------------------------------------------------------
# JSON path extraction (string-JSON columns)
# --------------------------------------------------------------------------

def json_extract_scalar(j: ColumnOrName, path: str) -> Column:
    """BQ ``json_extract_scalar(j, '$.a.b')`` — string result, NULL if absent.

    Reference: models/staging/stg_station_information.sql:26-37 (including
    nested paths like ``$.rental_uris.android``). Spark's
    ``get_json_object`` mirrors these semantics exactly.
    """
    return F.get_json_object(_col(j), path)


def json_extract(j: ColumnOrName, path: str) -> Column:
    """BQ ``json_extract`` — raw JSON text at path (stg_station_tariffs.sql:6)."""
    return F.get_json_object(_col(j), path)


def json_extract_array(j: ColumnOrName, path: str = "$") -> Column:
    """BQ ``json_extract_array(j, '$.stations')`` → array of JSON strings.

    Reference: models/staging/stg_station_information.sql:10 and
    models/staging/stg_station_tariffs.sql:12. Spark 3.4+ exposes the same
    shape via ``from_json`` to ``array<string>`` after slicing the path.

    Documented divergence: for arrays of OBJECTS (the reference's only
    usage) each element is the raw JSON text in both dialects, but for
    arrays of SCALAR STRINGS BQ keeps the JSON quoting (``'"a"'``)
    while Spark's ``from_json`` unquotes (``'a'``). The Spark behavior
    is kept deliberately — unquoted scalars feed downstream string ops
    directly, and re-quoting would break every existing explode +
    ``json_extract_scalar`` consumer.
    """
    sliced = F.get_json_object(_col(j), path)
    return F.from_json(sliced, "array<string>")


# --------------------------------------------------------------------------
# surrogate keys
# --------------------------------------------------------------------------

def surrogate_key(*cols: ColumnOrName) -> Column:
    """md5-of-concat surrogate key, the reference's key recipe.

    Reference: models/facts/fact_trips.sql:9-16 and
    models/facts/fact_station_status.sql:9 (``md5(concat(cast(... as
    string), ...))``). Canonical rendering rule (SURVEY.md §7.3 risk 2):
    every part is cast to string; timestamps render as
    ``yyyy-MM-dd HH:mm:ss`` so keys are stable across engines; NULL parts
    render as the empty string separated by ``|`` so a NULL never nulls the
    whole key.
    """
    parts = []
    for c in cols:
        c = _col(c)
        rendered = F.coalesce(c.cast("string"), F.lit(""))
        parts.append(rendered)
    sep = F.lit("|")
    joined = parts[0]
    for p in parts[1:]:
        joined = F.concat(joined, sep, p)
    return F.md5(joined)
