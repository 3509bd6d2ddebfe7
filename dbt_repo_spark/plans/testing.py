"""Declarative data tests (SURVEY.md §2.11 D9-D12).

The reference's only automated testing is dbt generic tests
(models/staging/schema.yml:9-110, models_demo/schema.yml:8-41). Each test
here compiles to ONE aggregate jobs returning the violation count — a
single pass over the table, no collect of violating rows (at 100 TB you
count violations, you don't ship them to the driver).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TestResult:
    name: str
    passed: bool
    violations: int
    stored_at: str | None = None  # layer.table holding the failing rows
    severity: str = "error"  # dbt test config: error | warn
    warned: bool = False  # warn-severity test exceeded its warn_if threshold

    def __repr__(self) -> str:  # pragma: no cover
        status = "PASS" if self.passed else ("WARN" if self.warned else "FAIL")
        if self.passed and self.warned:
            status = "WARN"
        return f"<{status} {self.name}: {self.violations} violations>"


def _violations_not_null(df: DataFrame, column: str) -> DataFrame:
    return df.filter(F.col(column).isNull())


def _violations_unique(df: DataFrame, column: str) -> DataFrame:
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count("*").alias("n_duplicates"))
        .filter(F.col("n_duplicates") > 1)
    )


def _violations_accepted_values(
    df: DataFrame, column: str, values: Sequence
) -> DataFrame:
    return (
        df.filter(~F.col(column).isin(list(values)) | F.col(column).isNull())
        .groupBy(column)
        .agg(F.count("*").alias("n_rows"))
    )


def _violations_relationships(
    child: DataFrame, column: str, parent: DataFrame, parent_column: str
) -> DataFrame:
    parent_keys = parent.select(F.col(parent_column).alias(column)).distinct()
    return (
        child.filter(F.col(column).isNotNull())
        .join(parent_keys, column, "left_anti")
        .groupBy(column)
        .agg(F.count("*").alias("n_orphans"))
    )


def not_null(df: DataFrame, column: str) -> TestResult:
    """dbt ``not_null`` (models/staging/schema.yml:9-30)."""
    n = df.filter(F.col(column).isNull()).count()
    return TestResult(f"not_null:{column}", n == 0, n)


def unique(df: DataFrame, column: str) -> TestResult:
    """dbt ``unique`` (models_demo/schema.yml:10)."""
    n = (
        df.filter(F.col(column).isNotNull())
        .groupBy(column)
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    return TestResult(f"unique:{column}", n == 0, n)


def accepted_values(df: DataFrame, column: str, values: Sequence) -> TestResult:
    """dbt ``accepted_values`` (models_demo/schema.yml:33-35)."""
    n = df.filter(~F.col(column).isin(list(values)) | F.col(column).isNull()).count()
    return TestResult(f"accepted_values:{column}", n == 0, n)


def relationships(child: DataFrame, column: str, parent: DataFrame, parent_column: str) -> TestResult:
    """dbt ``relationships`` FK test (models_demo/schema.yml:38-41).

    Orphan detection is a left-anti join — broadcastable when the parent is
    a dim, shuffle-hash otherwise (Catalyst picks).
    """
    parent_keys = parent.select(F.col(parent_column).alias(column)).distinct()
    n = (
        child.filter(F.col(column).isNotNull())
        .join(parent_keys, column, "left_anti")
        .count()
    )
    return TestResult(f"relationships:{column}->{parent_column}", n == 0, n)


def run_tests(
    df: DataFrame,
    spec: dict,
    catalog=None,
    failures_layer: str = "dbt_test__audit",
    store_cap: int = 100_000,
) -> list[TestResult]:
    """Run a schema.yml-shaped spec: {col: ["not_null", "unique",
    {"accepted_values": [...]}, {"relationships": (parent_df, col)}]}.

    With ``catalog`` set, failing tests STORE their violating rows
    (dbt's ``--store-failures``): each failure writes an audit table
    ``<failures_layer>.<test_name>`` holding the violation summary —
    duplicate keys with counts, orphan keys with counts, invalid values
    with counts, or the raw null rows — capped at ``store_cap`` rows so
    a pathological failure can't mirror the fact table into the audit
    schema. Passing tests write nothing; a re-run overwrites (the audit
    table always reflects the latest run).
    """
    results: list[TestResult] = []
    for column, tests in spec.items():
        for t in tests:
            if t == "not_null" or (isinstance(t, dict) and "not_null" in t):
                res = not_null(df, column)
                viol = _violations_not_null(df, column)
            elif t == "unique" or (isinstance(t, dict) and "unique" in t):
                res = unique(df, column)
                viol = _violations_unique(df, column)
            elif isinstance(t, dict) and "accepted_values" in t:
                res = accepted_values(df, column, t["accepted_values"])
                viol = _violations_accepted_values(df, column, t["accepted_values"])
            elif isinstance(t, dict) and "relationships" in t:
                parent, pcol = t["relationships"]
                res = relationships(df, column, parent, pcol)
                viol = _violations_relationships(df, column, parent, pcol)
            else:  # pragma: no cover
                raise ValueError(f"unknown test spec {t!r} for column {column}")
            # dbt test config: {"<test>": ..., "config": {"severity":
            # "warn", "warn_if": N, "error_if": N}} — thresholds are
            # violation COUNTS ("more than N violations trips it");
            # warn severity never fails the run, it only flags.
            cfg = t.get("config", {}) if isinstance(t, dict) else {}
            res.severity = cfg.get("severity", "error")
            if res.severity == "warn":
                res.warned = res.violations > cfg.get("warn_if", 0)
                res.passed = True
            else:
                res.passed = res.violations <= cfg.get("error_if", 0)
            if catalog is not None and (not res.passed or res.warned):
                table = (
                    res.name.replace(":", "__")
                    .replace("->", "_to_")
                    .replace(".", "_")
                )
                catalog.write(
                    viol.limit(store_cap), failures_layer, table, mode="overwrite"
                )
                res.stored_at = f"{failures_layer}.{table}"
            results.append(res)
    return results


def profile_columns(df, cols: list[str]):
    """One-pass column profile: rows / nulls / distincts / min / max.

    The dbt-docs statistics surface as an engine op: ONE aggregate job
    computes every column's stats (Catalyst plans the multi-distinct via
    expand — C passes over each row, still one shuffle), then the single
    wide row is unpivoted driver-free into (column, stat...) rows.
    Numeric min/max surface as doubles, string min/max as strings —
    never cross-rendered (engine-specific float formatting would poison
    cross-engine comparison).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    aggs = []
    numeric = {
        f.name: isinstance(f.dataType, T.NumericType) for f in df.schema.fields
    }
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            (F.min(c).cast("double") if numeric[c] else F.lit(None).cast("double")).alias(f"{c}__min_num"),
            (F.max(c).cast("double") if numeric[c] else F.lit(None).cast("double")).alias(f"{c}__max_num"),
            (F.min(c).cast("string") if not numeric[c] else F.lit(None).cast("string")).alias(f"{c}__min_str"),
            (F.max(c).cast("string") if not numeric[c] else F.lit(None).cast("string")).alias(f"{c}__max_str"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_null"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min_num").alias("min_num"),
                F.col(f"{c}__max_num").alias("max_num"),
                F.col(f"{c}__min_str").alias("min_str"),
                F.col(f"{c}__max_str").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def unit_test(
    model,
    given: dict,
    expect: list[dict],
    spark=None,
) -> TestResult:
    """dbt 1.8 unit test: run a model's BUILDER against mocked inputs
    and compare the full output relation to an expected row set.

    ``given`` maps dep name -> list-of-dicts (mock rows) or a ready
    DataFrame; ``expect`` is the full expected output as dicts (column
    subset allowed — extra output columns are ignored, dbt's partial
    expectation). Comparison is set-of-tuples on the expected columns
    after canonicalizing to strings, so row/column order never matters.
    Runs entirely on mock-sized data — the point of unit tests is logic
    coverage without warehouse state, exactly dbt's pitch.
    """
    ctx: dict = {"spark": spark}
    for dep, rows in given.items():
        if isinstance(rows, DataFrame):
            ctx[dep] = rows
        else:
            ctx[dep] = spark.createDataFrame(rows)
    out = model.fn(ctx)
    cols = sorted({k for r in expect for k in r})
    got = {
        tuple(str(row[c]) for c in cols)
        for row in out.select(*cols).collect()
    }
    want = {tuple(str(r.get(c)) for c in cols) for r in expect}
    n_diff = len(got ^ want)
    return TestResult(f"unit:{model.name}", n_diff == 0, n_diff)


def check_freshness(
    df: DataFrame,
    loaded_at_col: str,
    as_of,
    warn_after_hours: float = 24.0,
    error_after_hours: float = 48.0,
) -> TestResult:
    """dbt source freshness: how stale is the newest row relative to
    ``as_of`` (passed in, never wall-clock — deterministic replays)?
    One MAX aggregate over a pruned single-column scan; lag beyond the
    thresholds warns/fails exactly like test severity. An EMPTY source
    is maximally stale (fails)."""
    mx = df.agg(F.max(loaded_at_col).alias("mx")).first()["mx"]
    if mx is None:
        return TestResult(f"freshness:{loaded_at_col}", False, 1,
                          severity="error")
    lag_h = (as_of - mx).total_seconds() / 3600.0
    res = TestResult(f"freshness:{loaded_at_col}", True, 0)
    if lag_h > error_after_hours:
        res.passed = False
        res.violations = 1
    elif lag_h > warn_after_hours:
        res.warned = True
    return res
