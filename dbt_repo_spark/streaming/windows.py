"""Time-window aggregation: tumbling and session windows.

The reference does its time bucketing in batch SQL (hourly truncation at
models/facts/fact_station_status.sql:21, daily rollup at
models/facts/fact_station_uptime.sql:26-34) and has no streaming windows;
the engine exposes the full Spark surface anyway because a status stream
at scale wants them. Both helpers work unchanged on batch AND streaming
DataFrames — in streaming, pair with ``withWatermark`` so window state is
dropped once the watermark passes the window end.

Scale: a tumbling window agg is one shuffle on (keys, window); session
windows additionally merge per-key sorted runs inside the state store —
key cardinality, not event volume, bounds the state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    duration: str = "1 hour",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling-window aggregation: count (+extra aggs) per key per window.

    ``F.window`` emits a (start, end) struct; start == date_trunc of the
    timestamp for aligned durations, which is what makes this
    oracle-checkable against plain GROUP BY date_trunc SQL.
    """
    aggs = aggs or []
    out = df.groupBy(*keys, F.window(ts_col, duration).alias("w")).agg(
        F.count("*").alias("n_events"), *aggs
    )
    agg_cols = [c for c in out.columns if c not in (*keys, "w")]
    return out.select(
        *keys,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *agg_cols,
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in duration/slide
    overlapping windows. ``F.window(ts, duration, slide)`` expands rows
    window-count-fold BEFORE the shuffle — the replication factor is the
    overlap ratio, so keep duration/slide small at scale (2-4x is the
    usual telemetry shape); state in streaming mode is bounded by
    watermark + window count per key exactly like tumbling.
    """
    aggs = aggs or []
    out = df.groupBy(*keys, F.window(ts_col, duration, slide).alias("w")).agg(
        F.count("*").alias("n_events"), *aggs
    )
    agg_cols = [c for c in out.columns if c not in (*keys, "w")]
    return out.select(
        *keys,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *agg_cols,
    )


def session_aggregate(
    df: DataFrame,
    ts_col: str,
    key: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge.

    ``F.session_window`` end = last event + gap (Spark semantics). In
    streaming this is stateful session merging with watermark-bounded
    state; in batch it collapses to a sort-within-key + run detection —
    the same result the gaps-and-islands SQL idiom produces, which is the
    oracle used to verify it.
    """
    return (
        df.groupBy(key, F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("first_event"),
            F.max(ts_col).alias("last_event"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "first_event",
            "last_event",
        )
    )
