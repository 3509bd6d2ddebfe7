"""Kaplan-Meier operator tests: hand-computed textbook example with
censoring, saturation (everyone at risk dies — survival exactly 0, no
ln(0)), and invariants (monotone non-increasing survival, event-times-
only output).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_repo_spark.operators.survival import kaplan_meier


def test_km_hand_computed_with_censoring_and_saturation(spark):
    # (duration, event): censored rows keep later subjects at risk but
    # produce no output row and no survival drop.
    obs = spark.createDataFrame(
        [(2, 1), (3, 1), (3, 0), (5, 1), (7, 0), (8, 1)],
        "duration int, event int",
    )
    rows = {r.duration: r for r in kaplan_meier(obs).collect()}
    assert set(rows) == {2, 3, 5, 8}  # event times only (censored-only 7 absent)
    # S(2)=5/6, S(3)=5/6*4/5=2/3, S(5)=2/3*2/3=4/9, S(8): d=n -> 0 exactly
    assert rows[2].n_at_risk == 6 and rows[2].survival == pytest.approx(5 / 6, abs=1e-6)
    assert rows[3].n_at_risk == 5 and rows[3].survival == pytest.approx(2 / 3, abs=1e-6)
    assert rows[5].n_at_risk == 3 and rows[5].survival == pytest.approx(4 / 9, abs=1e-6)
    assert rows[8].n_at_risk == 1 and rows[8].survival == 0.0


def test_km_no_censoring_matches_empirical_survival(spark):
    # without censoring KM degenerates to the empirical survivor function
    obs = spark.createDataFrame(
        [(d, 1) for d in [1, 1, 2, 4, 4, 4, 9, 9, 9, 9]], "duration int, event int"
    )
    rows = sorted(kaplan_meier(obs).collect(), key=lambda r: r.duration)
    surv = [r.survival for r in rows]
    assert [r.duration for r in rows] == [1, 2, 4, 9]
    assert surv == pytest.approx([0.8, 0.7, 0.4, 0.0], abs=1e-6)
    # monotone non-increasing
    assert all(a >= b for a, b in zip(surv, surv[1:]))


def test_km_window_input_is_duration_aggregate(spark):
    """Boundedness pin (r8 verdict ask #3): kaplan_meier's two
    unpartitioned windows are tolerable ONLY because their input is the
    per-duration aggregate — bounded by the duration GRAIN (days/hours:
    thousands of rows), never by subject count. Assert the plan shape:
    in the linear physical pipeline every Window sits ABOVE the
    HashAggregate keyed on the duration column, and the parquet/scan
    leaf sits BELOW that aggregate — so the single-task sort can never
    see the raw subject relation. If a refactor ever windows the
    subject rows directly, the aggregate drops below the window chain
    (or disappears) and this test fails."""
    obs = spark.createDataFrame(
        [(d % 13, d % 3 != 0) for d in range(2000)],
        "duration int, event boolean",
    ).withColumn("event", F.col("event").cast("int"))
    plan = kaplan_meier(obs)._jdf.queryExecution().executedPlan().toString()
    # anchor on the n_at_risk window (the deeper of KM's two windows);
    # its subtree is printed after it, so the next HashAggregate in the
    # text IS its input relation
    last_window = plan.rindex("AS n_at_risk")
    agg_after_windows = plan.find("HashAggregate", last_window)
    assert agg_after_windows != -1, "no duration aggregate below the windows"
    assert "output=[t#" in plan[agg_after_windows:agg_after_windows + 400], (
        "the aggregate below the windows must be the per-duration reduce"
    )
    # the raw-subject leaf feeds the aggregate, not any window
    leaf = max(plan.rfind("Scan ExistingRDD"), plan.rfind("LocalTableScan"))
    assert leaf > agg_after_windows


def test_km_registry_query_windows_bounded_by_duration_grain(spark):
    """Same pin for the registry consumer survival_repeat_purchase: the
    windowed relation is the per-duration (day-grain) aggregate."""
    from dbt_repo_spark.queries import QUERIES

    df = QUERIES["survival_repeat_purchase"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    last_window = plan.rindex("AS n_at_risk")
    agg_after = plan.find("HashAggregate", last_window)
    assert agg_after != -1 and "output=[t#" in plan[agg_after:agg_after + 400]
