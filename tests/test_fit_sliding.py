"""Unit tests: group-wise OLS (applyInPandas) and sliding windows.

(Registry-level oracle parity for groupwise_ols_slope /
sliding_window_counts runs in test_oracle_parity.py.)
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dbt_repo_spark.operators.fit import groupwise_ols
from dbt_repo_spark.streaming.windows import sliding_counts


def test_groupwise_ols_known_slope(spark):
    # y = 3x + 7 exactly -> slope 3.0; single-point and zero-variance
    # groups are dropped
    rows = (
        [(1, x, 3 * x + 7) for x in (0, 2, 5, 9)]
        + [(2, 4, 100)]  # n=1 -> dropped
        + [(3, 6, 10), (3, 6, 20)]  # zero x-variance -> dropped
    )
    df = spark.createDataFrame(rows, "k long, x long, y long")
    out = groupwise_ols(df, "k", "x", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert r["k"] == 1 and r["n_obs"] == 4 and r["slope"] == 3.0


def test_sliding_counts_replication_factor(spark):
    # one event -> exactly duration/slide = 2 windows, boundaries aligned
    df = spark.createDataFrame(
        [("a", "2025-01-01 00:07:30")], "k string, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    got = sorted(
        (r["window_start"].minute, r["window_end"].minute)
        for r in sliding_counts(df, "ts", ["k"], "10 minutes", "5 minutes").collect()
    )
    assert got == [(0, 10), (5, 15)]


def test_sliding_counts_on_stream_append_mode(spark, tmp_path):
    """Same operator under a watermark on a genuine stream: closed hopping
    windows emit batch-identical counts."""
    import datetime as dt

    from pyspark.sql import types as T

    src = tmp_path / "ev"
    src.mkdir()
    base = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        json.dumps({"ts": (base + dt.timedelta(minutes=i)).isoformat(), "k": "a"})
        for i in range(60)
    ]
    (src / "a.jsonl").write_text("\n".join(rows))
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.StringType())]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    agg = sliding_counts(
        stream.withWatermark("ts", "5 minutes"), "ts", ["k"], "10 minutes", "5 minutes"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.window_start.strftime("%H:%M"): r.n_events
        for r in spark.sql("SELECT * FROM slide_counts").collect()
    }
    # interior closed windows hold 10 one-per-minute events each
    assert got.get("00:05") == 10 and got.get("00:10") == 10
    # the leading edge window (starting 23:55) only overlaps 5 minutes
    assert got.get("23:55") == 5
