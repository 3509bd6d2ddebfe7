"""Column-masking policies — the governance layer between the warehouse
and its consumers (Snowflake/Databricks masking-policy semantics,
engine-side).

The PII family already finds and rewrites sensitive VALUES
(``operators/text.py::pii_redact``); this masks COLUMNS by policy at
read/export time, so one physical table serves privileged and
restricted consumers without a second copy. Strategies are pure
Catalyst expressions (scan-speed, no Python):

- ``hash``      — md5 keyed surrogate: stable joins/dedup survive, the
                  value does not (the reference's md5-surrogate-key
                  idiom applied to governance).
- ``redact``    — constant ``***``.
- ``null``      — NULL of the column's own type (schema stable).
- ``partial:n`` — keep the LAST n characters (card/phone display rule).

Unknown strategies and unknown columns fail loudly — a typo'd policy
must never silently leak a column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mask_expr(df: DataFrame, col: str, strategy: str) -> Column:
    c = F.col(col)
    if strategy == "hash":
        return F.md5(c.cast("string"))
    if strategy == "redact":
        return F.lit("***")
    if strategy == "null":
        return F.lit(None).cast(dict(df.dtypes)[col])
    if strategy.startswith("partial:"):
        n = int(strategy.split(":", 1)[1])
        s = c.cast("string")
        return F.concat(
            F.lit("***"), F.substring(s, -n, n)
        )
    raise ValueError(f"unknown mask strategy {strategy!r} for column {col!r}")


def mask_columns(
    df: DataFrame,
    policy: dict[str, str],
    role: str = "restricted",
    exempt_roles: tuple[str, ...] = ("admin",),
) -> DataFrame:
    """Apply a masking policy unless ``role`` is exempt. Row count and
    column ORDER are unchanged; masked columns change type only where
    the strategy demands it (hash/redact/partial → string)."""
    missing = sorted(set(policy) - set(df.columns))
    if missing:
        raise ValueError(f"mask policy names unknown columns {missing}")
    if role in exempt_roles:
        return df
    exprs = []
    for col in df.columns:
        if col in policy:
            exprs.append(_mask_expr(df, col, policy[col]).alias(col))
        else:
            exprs.append(F.col(col))
    return df.select(*exprs)
