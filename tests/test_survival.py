"""Kaplan-Meier operator tests: hand-computed textbook example with
censoring, saturation (everyone at risk dies — survival exactly 0, no
ln(0)), and invariants (monotone non-increasing survival, event-times-
only output).
"""

from __future__ import annotations

import pytest

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
