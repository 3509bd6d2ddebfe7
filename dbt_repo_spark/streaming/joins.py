"""Stream-stream joins: watermark-bounded event correlation.

The reference only joins stream-to-STATIC (broadcast enrichment,
/root/reference/src/realtime_pubsub_to_spark.py:180-184); a full engine
also needs stream-to-STREAM correlation — e.g. click events joined to the
purchase events they led to. Structured Streaming buffers both sides in
the state store; the join TIME BOUND plus each side's watermark is what
lets the engine evict state, so both are mandatory here (an unbounded
stream-stream join grows state forever — at 100 TB/day that's the
difference between a working pipeline and an OOM).

State size ~ rate x (watermark + bound) per side, independent of stream
lifetime — the same bounded-state argument as the dedup operator (ST1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay_seconds: int,
    watermark_delay: str = "2 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event happens
    within ``(left_ts, left_ts + max_delay_seconds]``.

    Both sides get a watermark (state eviction) and the join condition
    carries the explicit time bound (state scoping). Works identically on
    batch DataFrames — the bound then just expresses the business rule —
    which is how the oracle-free semantics get tested cheaply.
    """
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] > lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"interval {max_delay_seconds} seconds"))
    )
    out = lw.join(rw, cond, how)
    # both sides carry `key`; keep the left one under the plain name
    return out.drop(rw[key])
