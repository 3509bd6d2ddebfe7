"""SCD2 snapshots (plans/snapshot.py): batch history builder + the
incremental dbt-check-strategy apply across multiple ticks."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_repo_spark.plans.snapshot import scd2_from_history, snapshot_apply


def test_scd2_from_history_collapses_runs(spark):
    rows = [
        (1, 10, 1, "a"), (1, 20, 2, "a"), (1, 30, 3, "b"), (1, 40, 4, "a"),
        (2, 10, 5, "x"),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "st"])
    got = {
        (r["k"], r["state"], r["valid_from"]): (r["valid_to"], r["is_current"])
        for r in scd2_from_history(df, "k", "ts", "st", "eid").collect()
    }
    assert got == {
        (1, "a", 10): (30, False),   # run a@10,a@20 collapsed
        (1, "b", 30): (40, False),
        (1, "a", 40): (None, True),
        (2, "x", 10): (None, True),
    }


def _snap_dict(df):
    return {
        (r["k"], str(r["dbt_valid_from"])): (r["v"], r["dbt_valid_to"] and str(r["dbt_valid_to"]))
        for r in df.collect()
    }


def test_snapshot_apply_three_ticks(spark):
    d1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    snap = snapshot_apply(None, d1, "k", ["v"], "2024-01-01 00:00:00")
    # tick 2: k=1 changes, k=2 unchanged, k=3 appears
    d2 = spark.createDataFrame([(1, "A"), (2, "b"), (3, "c")], ["k", "v"])
    snap = snapshot_apply(snap, d2, "k", ["v"], "2024-01-02 00:00:00")
    # tick 3: k=2 disappears (stays open per dbt default), k=3 changes
    d3 = spark.createDataFrame([(1, "A"), (3, "C")], ["k", "v"])
    snap = snapshot_apply(snap, d3, "k", ["v"], "2024-01-03 00:00:00")

    got = _snap_dict(snap)
    assert got == {
        (1, "2024-01-01 00:00:00"): ("a", "2024-01-02 00:00:00"),
        (1, "2024-01-02 00:00:00"): ("A", None),
        (2, "2024-01-01 00:00:00"): ("b", None),          # absent -> stays open
        (3, "2024-01-02 00:00:00"): ("c", "2024-01-03 00:00:00"),
        (3, "2024-01-03 00:00:00"): ("C", None),
    }
    # exactly one open version per live key
    opens = snap.filter(F.col("dbt_valid_to").isNull()).groupBy("k").count()
    assert all(r["count"] == 1 for r in opens.collect())


def test_snapshot_apply_null_safe_check(spark):
    d1 = spark.createDataFrame([(1, None), (2, "b")], ["k", "v"])
    snap = snapshot_apply(None, d1, "k", ["v"], "2024-01-01 00:00:00")
    # NULL -> NULL is NOT a change; NULL -> value is
    d2 = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    snap = snapshot_apply(snap, d2, "k", ["v"], "2024-01-02 00:00:00")
    got = _snap_dict(snap)
    assert got == {
        (1, "2024-01-01 00:00:00"): (None, None),
        (2, "2024-01-01 00:00:00"): ("b", "2024-01-02 00:00:00"),
        (2, "2024-01-02 00:00:00"): (None, None),
    }


def test_snapshot_apply_idempotent_tick(spark):
    d1 = spark.createDataFrame([(1, "a")], ["k", "v"])
    snap = snapshot_apply(None, d1, "k", ["v"], "2024-01-01 00:00:00")
    again = snapshot_apply(snap, d1, "k", ["v"], "2024-01-02 00:00:00")
    assert _snap_dict(again) == {(1, "2024-01-01 00:00:00"): ("a", None)}


def test_streaming_scd2_snapshot_sink(spark, tmp_path):
    """Two stream drains = two snapshot ticks: changed keys close + reopen,
    unchanged keys keep their original open version."""
    import json

    from dbt_repo_spark.streaming.ingest import scd2_snapshot_sink

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    snap_dir = str(tmp_path / "snap")
    schema = "k LONG, v STRING, event_ts TIMESTAMP"

    def drain():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            stream.writeStream.foreachBatch(scd2_snapshot_sink(snap_dir, "k", ["v"]))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"k": 1, "v": "a", "event_ts": "2024-01-01 10:00:00"},
                {"k": 1, "v": "a0", "event_ts": "2024-01-01 09:00:00"},  # older, loses
                {"k": 2, "v": "b", "event_ts": "2024-01-01 10:00:00"},
            ]
        )
    )
    drain()
    (src / "b2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"k": 1, "v": "A", "event_ts": "2024-01-02 10:00:00"},  # change
                {"k": 2, "v": "b", "event_ts": "2024-01-02 10:00:00"},  # unchanged
            ]
        )
    )
    drain()

    got = {
        (r["k"], str(r["dbt_valid_from"])): (r["v"], r["dbt_valid_to"] and str(r["dbt_valid_to"]))
        for r in spark.read.parquet(snap_dir).collect()
    }
    assert got == {
        (1, "2024-01-01 10:00:00"): ("a", "2024-01-02 10:00:00"),
        (1, "2024-01-02 10:00:00"): ("A", None),
        (2, "2024-01-01 10:00:00"): ("b", None),
    }


def test_snapshot_timestamp_strategy(spark):
    """timestamp strategy: newer updated_at supersedes, stale redelivery
    is a no-op, absent keys stay open, new keys insert."""
    import datetime as dt

    from dbt_repo_spark.plans.snapshot import snapshot_apply_timestamp

    t1, t2, t3 = (dt.datetime(2024, 1, d, 8) for d in (1, 2, 3))
    day1 = spark.createDataFrame(
        [(1, "a", t1), (2, "b", t1)], "k int, v string, updated_at timestamp"
    )
    snap1 = snapshot_apply_timestamp(None, day1, "k", "updated_at")
    assert snap1.count() == 2
    assert snap1.filter("dbt_valid_to IS NULL").count() == 2

    # day2: k=1 updated (newer), k=2 absent, k=3 new
    day2 = spark.createDataFrame(
        [(1, "a2", t2), (3, "c", t2)], "k int, v string, updated_at timestamp"
    )
    snap2 = snapshot_apply_timestamp(snap1, day2, "k", "updated_at")
    rows = {(r.k, r.v): (r.dbt_valid_from, r.dbt_valid_to) for r in snap2.collect()}
    assert rows[(1, "a")] == (t1, t2)       # closed at successor's stamp
    assert rows[(1, "a2")] == (t2, None)    # new open version
    assert rows[(2, "b")] == (t1, None)     # absent key stays open
    assert rows[(3, "c")] == (t2, None)     # new key
    assert snap2.count() == 4

    # stale redelivery of day1 state: nothing changes
    snap3 = snapshot_apply_timestamp(snap2, day1, "k", "updated_at")
    assert snap3.count() == 4
    assert snap3.filter("dbt_valid_to IS NULL").count() == 3
