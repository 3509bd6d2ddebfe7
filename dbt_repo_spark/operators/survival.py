"""Survival analysis: the Kaplan-Meier product-limit estimator over
right-censored duration data.

The duration-modeling family (time-to-repeat-purchase, time-to-churn,
station downtime) none of the relational operators cover: the estimand
S(t) = P(duration > t) must combine EVENTS (the thing happened at t)
with RIGHT-CENSORED observations (still alive when observation ended) —
dropping censored rows biases survival down, treating them as events
biases it harder. Kaplan-Meier is the standard nonparametric answer:

    S(t) = prod over event times t_i <= t of (1 - d_i / n_i)

with d_i = events at t_i and n_i = subjects still at risk at t_i.

Distributed shape (scale-safe at any subject count):
1. groupBy duration — one shuffle keyed on duration, carrying
   (events, total) counts only; raw subjects never move again.
2. n_at_risk via a cumulative sum DESCENDING over duration — subjects
   with duration >= t are exactly those not yet dead or censored at t.
3. The product becomes exp(cumsum(ln(1 - d/n))) ASCENDING — the
   standard log-transform; both cumulations run over the SAME sorted
   sequence in any engine, so cross-engine drift is bounded by trig-lib
   ulps and absorbed by the 6-dp output round.
4. The two window passes are unpartitioned BY CONSTRUCTION — but over
   the |distinct durations| relation (days/hours granularity:
   thousands of rows), not subjects, so the single-task sort is bounded
   regardless of corpus size. Finer-than-needed duration resolution
   should be bucketed before calling (the caller controls the unit).
   This boundedness is a pinned CONTRACT, not a convention:
   tests/test_survival.py::test_km_window_input_is_duration_aggregate
   asserts the windows' plan input is the per-duration HashAggregate
   (and the registry consumer survival_repeat_purchase gets the same
   pin), so a refactor that windows raw subject rows fails CI. If a
   fine-grained duration unit ever appears, route the cumulations
   through evalmetrics.ordered_prefix_sums instead.

Edge case pinned by test: if every subject still at risk dies at some
t (d = n), survival is EXACTLY 0 from t on — computed via an explicit
saturation flag, not ln(0) (engines disagree on ln(0): -inf vs error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kaplan_meier(
    obs: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Kaplan-Meier curve from (duration, event) observations.

    `event` is 1 when the subject experienced the event at `duration`,
    0 when the subject was right-censored then. Output: one row per
    EVENT time — (duration, n_events, n_at_risk, survival), survival
    rounded to 6 dp.
    """
    per_t = obs.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(event_col).cast("long")).alias("d"),
        F.count("*").alias("c_all"),
    )
    w_desc = Window.orderBy(F.col("t").desc())
    at_risk = per_t.withColumn("n_at_risk", F.sum("c_all").over(w_desc))
    w_asc = Window.orderBy(F.col("t").asc())
    term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_at_risk")),
        F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_at_risk")),
    ).otherwise(F.lit(0.0))
    saturated = F.max(
        (F.col("d") >= F.col("n_at_risk")).cast("int")
    ).over(w_asc)
    km = at_risk.withColumn(
        "survival",
        F.when(saturated == 1, F.lit(0.0)).otherwise(
            F.round(F.exp(F.sum(term).over(w_asc)), 6)
        ),
    )
    return km.filter(F.col("d") > 0).select(
        F.col("t").alias("duration"),
        F.col("d").alias("n_events"),
        "n_at_risk",
        "survival",
    )
