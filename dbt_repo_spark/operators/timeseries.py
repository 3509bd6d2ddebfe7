"""Time-series operators: grid resampling with gap-fill.

The reference stores ~1/min station snapshots and derives hourly/daily
aggregates in batch; a time-series engine additionally needs REGULAR
grids from irregular observations — dashboards and joins against other
minute-grid series want one row per (key, minute) with the last observed
value carried forward across gaps.

Shape: snap → dedup-per-bucket → spine → left join → forward-fill.
Everything is one shuffle on the key (the spine join and the fill window
share the partitioning); the spine is generated per key from its own
min/max bounds so no driver-side range collection happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    max_gap: str | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: earliest strictly-increasing completion time
    per stage per user.

    Output: one row per user that completed stage 1, with columns
    ``t_1 .. t_N`` — ``t_i`` is the earliest timestamp of ``stages[i]``
    that is strictly after ``t_{i-1}`` (NULL once a stage is never
    reached). The greedy earliest-match is optimal for funnels: taking
    the earliest valid event at each stage never excludes a completion a
    later choice would have allowed.

    ``max_gap`` (an INTERVAL string, e.g. ``"48 hours"``) bounds each
    hop: stage i must land within ``max_gap`` after ``t_{i-1}`` or the
    funnel stalls — the conversion-window semantics every product
    funnel actually wants (a purchase three months after signup is not
    a conversion). Greedy-earliest stays optimal under a per-hop bound:
    the earliest in-window event maximizes the remaining window for
    every later stage.

    Each stage is one filtered pre-aggregation of the (already filtered)
    event scan joined back on the user — N small hash-agg shuffles keyed
    on the user, never a per-user sort of the full history. The stage-i
    input is pre-filtered to ``event_type = stages[i]`` BEFORE the join,
    so the join's build side shrinks monotonically down the funnel.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin(stages))
    out = (
        ev.filter(F.col("etype") == stages[0])
        .groupBy("user")
        .agg(F.min("ts").alias("t_1"))
    )
    for i, stage in enumerate(stages[1:], start=2):
        in_window = F.col("ts") > F.col("__prev")
        if max_gap is not None:
            in_window = in_window & (
                F.col("ts") <= F.col("__prev") + F.expr(f"INTERVAL {max_gap}")
            )
        nxt = (
            ev.filter(F.col("etype") == stage)
            .join(out.select("user", F.col(f"t_{i-1}").alias("__prev")), "user")
            .filter(F.col("__prev").isNotNull() & in_window)
            .groupBy("user")
            .agg(F.min("ts").alias(f"t_{i}"))
        )
        out = out.join(nxt, "user", "left")
    return out.withColumnRenamed("user", user_col)


def resample_ffill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 60,
) -> DataFrame:
    """Resample to a regular ``step_seconds`` grid with forward-fill.

    1. Snap each observation to its bucket (floor of epoch / step).
    2. Keep the LAST observation per (key, bucket) — deterministic via
       (ts, value) ordering.
    3. Build each key's spine from its own min/max bucket (sequence +
       explode — J7's pattern, no driver round-trip).
    4. Left-join observations onto the spine and carry the last non-null
       value forward (last IGNORE NULLS over a running window).

    Output: (key, bucket_ts, value, is_observed).
    """
    step = F.lit(step_seconds)
    snapped = df.select(
        F.col(key),
        F.timestamp_seconds(
            (F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step
        ).alias("bucket_ts"),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).alias("__v"),
    )
    w_pick = Window.partitionBy(key, "bucket_ts").orderBy(
        F.col("__ts").desc(), F.col("__v").desc()
    )
    per_bucket = (
        snapped.withColumn("__rn", F.row_number().over(w_pick))
        .filter(F.col("__rn") == 1)
        .select(key, "bucket_ts", F.col("__v").alias("observed_value"))
    )
    bounds = per_bucket.groupBy(key).agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    spine = bounds.select(
        key,
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval {step_seconds} seconds"))
        ).alias("bucket_ts"),
    )
    joined = spine.join(per_bucket, [key, "bucket_ts"], "left")
    w_fill = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        "bucket_ts",
        F.last("observed_value", ignorenulls=True).over(w_fill).alias("value"),
        F.col("observed_value").isNotNull().alias("is_observed"),
    )


def ewma_recursive(
    df: DataFrame,
    key: str,
    ord_col: str,
    value_col: str,
    alpha: float = 0.25,
    out_col: str = "ewma",
    key_type: str = "string",
    ord_type: str = "timestamp",
) -> DataFrame:
    """Exponentially-weighted moving average per series:
    ``y_0 = x_0``, ``y_t = (1-α)·y_{t-1} + α·x_t`` over rows ordered by
    ``ord_col`` within each ``key``.

    An EWMA is a true recurrence — not a windowed aggregate — so it is
    the one time-series op that earns the Python seam. The power-weight
    window rewrite (``y_t = Σ wᵢxᵢ`` with ``wᵢ ∝ (1-α)^(t-i)``) was
    rejected: it needs ``pow(1-α, -i)`` terms that overflow/denormalize
    past ~3k rows, and a cross-engine float window-sum is
    accumulation-order-dependent. Instead the recurrence runs verbatim
    (two multiplies + one add per step, the same IEEE ops a SQL
    ``WITH RECURSIVE`` oracle performs, bit-identical when α has an
    exact binary representation — default 0.25).

    Scale: callers pre-aggregate to one row per (key, bucket) FIRST —
    the JVM hash-agg eats the 100 TB scan and this operator sees
    |keys|×|buckets| rows. Per-series work is sequential by nature
    (length bounded by the calendar); parallelism is across series.
    ``applyInPandas`` is one Python call per key, acceptable here only
    because series counts are small-by-contract (event types, stations);
    for high-cardinality keys bucket the groups per fit.py rule 1.
    """
    import numpy as np
    import pandas as pd

    a = float(alpha)
    om = 1.0 - a
    src = df.select(
        F.col(key).alias("k"),
        F.col(ord_col).alias("o"),
        F.col(value_col).cast("double").alias("x"),
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o", kind="mergesort")
        x = pdf["x"].to_numpy(dtype="float64")
        y = np.empty_like(x)
        if len(x):
            y[0] = x[0]
            for i in range(1, len(x)):
                y[i] = om * y[i - 1] + a * x[i]
        return pd.DataFrame({"k": pdf["k"], "o": pdf["o"], "y": y})

    out = src.groupBy("k").applyInPandas(
        smooth, schema=f"k {key_type}, o {ord_type}, y double"
    )
    return out.select(
        F.col("k").alias(key),
        F.col("o").alias(ord_col),
        F.col("y").alias(out_col),
    )


def holt_recursive(
    df: DataFrame,
    key: str,
    ord_col: str,
    value_col: str,
    alpha: float = 0.25,
    gamma: float = 0.5,
    key_type: str = "string",
    ord_type: str = "timestamp",
) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) per
    series: ``l_0 = x_0, b_0 = 0``, then

        ``l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1})``
        ``b_t = γ·(l_t − l_{t-1}) + (1-γ)·b_{t-1}``

    Same design contract as :func:`ewma_recursive` (which see): callers
    pre-aggregate first, series count is the parallelism, α/γ default to
    exactly-representable binary fractions so the recurrence is
    bit-identical to a ``WITH RECURSIVE`` SQL oracle evaluating the same
    IEEE expression (the oracle inlines l_t into b_t's definition —
    recomputing the identical expression yields the identical bits).
    Output adds ``forecast = l_{t-1} + b_{t-1}`` (the one-step-ahead
    prediction evaluated before the update), NULL at t=0.
    """
    import numpy as np
    import pandas as pd

    a, g = float(alpha), float(gamma)
    om, og = 1.0 - a, 1.0 - g
    src = df.select(
        F.col(key).alias("k"),
        F.col(ord_col).alias("o"),
        F.col(value_col).cast("double").alias("x"),
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o", kind="mergesort")
        x = pdf["x"].to_numpy(dtype="float64")
        lvl = np.empty_like(x)
        trd = np.empty_like(x)
        fc = np.full_like(x, np.nan)
        if len(x):
            lvl[0], trd[0] = x[0], 0.0
            for i in range(1, len(x)):
                fc[i] = lvl[i - 1] + trd[i - 1]
                lvl[i] = a * x[i] + om * (lvl[i - 1] + trd[i - 1])
                trd[i] = g * (lvl[i] - lvl[i - 1]) + og * trd[i - 1]
        return pd.DataFrame(
            {"k": pdf["k"], "o": pdf["o"], "l": lvl, "b": trd, "f": fc}
        )

    out = src.groupBy("k").applyInPandas(
        smooth, schema=f"k {key_type}, o {ord_type}, l double, b double, f double"
    )
    return out.select(
        F.col("k").alias(key),
        F.col("o").alias(ord_col),
        F.col("l").alias("level"),
        F.col("b").alias("trend"),
        F.col("f").alias("forecast"),
    )


def max_concurrency(
    intervals: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Peak number of simultaneously-open intervals per key — the
    capacity-planning / load-profiling primitive (max concurrent
    sessions, peak open orders, instantaneous fleet size). Intervals are
    half-open ``[start, end)``: one ending exactly when another starts
    never overlaps it.

    Sweep line as ONE window pass: each interval emits (+1 at start,
    −1 at end), events sort by (time, delta) per key — the −1 sorts
    first, realizing the half-open boundary — and a running sum traces
    the concurrency profile; its max is the answer. O(n log n) per key
    against the O(n²) self-join count-overlaps formulation. Ties of
    identical (time, delta) commute through the running sum, so the max
    is deterministic under any partition-internal order. The window
    shuffle and the final groupBy share one hash partitioning on
    ``key_cols`` (exchange reuse).
    """
    starts = intervals.select(
        *key_cols, F.col(start_col).alias("t"), F.lit(1).alias("delta")
    )
    ends = intervals.select(
        *key_cols, F.col(end_col).alias("t"), F.lit(-1).alias("delta")
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    profile = starts.unionByName(ends).withColumn(
        "open", F.sum("delta").over(w)
    )
    return profile.groupBy(*key_cols).agg(
        F.max("open").alias("max_concurrent")
    )
