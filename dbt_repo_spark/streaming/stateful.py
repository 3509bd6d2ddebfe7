"""Custom stateful streaming operator: per-key change detection.

The reference's stream stores every snapshot and derives "latest" /
"history" downstream in batch (models/facts/fact_station_status*.sql). At
100 TB-class stream volume the cheaper shape is a CHANGE-LOG: keep the
last seen value per key in the state store and emit a row only when the
tracked values actually change — a ~1/min feed where stations change a
few times an hour compresses ~50×, and downstream incremental facts
consume deltas instead of snapshots.

Spark has no built-in "emit-on-change" operator, so this is the
engine's example of the sanctioned custom-stateful path
(``applyInPandasWithState``): state is a tiny fixed-width tuple per key,
batches arrive as Arrow frames, and the watermark bounds state the same
way it bounds the dedup in ingest.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CHANGE_SCHEMA = StructType(
    [
        StructField("station_id", StringType()),
        StructField("report_time", TimestampType()),
        StructField("bikes_available", LongType()),
        StructField("docks_available", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("bikes_available", LongType()),
        StructField("docks_available", LongType()),
    ]
)


def _emit_changes(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit rows whose (bikes, docks) differ from the last seen state.

    Rows are processed in report_time order within the micro-batch; the
    state tuple carries the last emitted values across batches (and across
    restarts, via the checkpoint).
    """
    last = state.get if state.exists else (None, None)
    out_rows = []
    for pdf in pdfs:
        for row in pdf.sort_values("report_time").itertuples(index=False):
            cur = (int(row.bikes_available), int(row.docks_available))
            if cur != last:
                out_rows.append(
                    {
                        "station_id": key[0],
                        "report_time": row.report_time,
                        "bikes_available": cur[0],
                        "docks_available": cur[1],
                    }
                )
                last = cur
    state.update(last)
    if out_rows:
        yield pd.DataFrame(out_rows, columns=[f.name for f in CHANGE_SCHEMA.fields])


SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

SESSION_STATE_DDL = "start BIGINT, last BIGINT, n BIGINT, total DOUBLE"

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _session_row(key: tuple[Any, ...], s: tuple) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "session_start": [pd.to_datetime(int(s[0]), unit="ms")],
            "session_end": [pd.to_datetime(int(s[1]), unit="ms")],
            "n_events": [int(s[2])],
            "total_value": [float(s[3])],
        }
    )


def _session_fold(
    cur: tuple | None, pdfs: Iterator[pd.DataFrame], gap_ms: int
) -> tuple[list[tuple], tuple | None]:
    """Fold a micro-batch's rows into (closed_sessions, open_session)."""
    pdf = pd.concat(list(pdfs))
    if pdf.empty:
        return [], cur
    pdf = pdf.sort_values("ts")
    closed: list[tuple] = []
    for t, v in zip(
        (pdf["ts"].astype("int64") // 1_000_000).tolist(),
        pdf["value"].astype("float64").tolist(),
    ):
        if cur is not None and t - cur[1] > gap_ms:
            closed.append(cur)
            cur = None
        if cur is None:
            cur = (t, t, 1, v)
        else:
            cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v)
    return closed, cur


def sessionize(
    events: DataFrame, gap_minutes: int = 30, delay: str = "2 minutes"
) -> DataFrame:
    """Event-time sessionization with an inactivity TIMER
    (``applyInPandasWithState`` + ``EventTimeTimeout``).

    ``F.session_window`` covers gap-sessionization as a built-in
    aggregation; this operator exists for the semantics the built-in
    can't express: a session CLOSES and is emitted exactly when the
    watermark passes last_event + gap (the key's event-time timeout
    fires with an empty input group), so downstream consumers get one
    final row per session, and the state store holds ONE fixed-width
    open-session tuple per key — state is key-cardinality-bound, not
    event-volume-bound.

    Input stream columns: (user_id BIGINT, ts TIMESTAMP, value DOUBLE).
    Output: one row per CLOSED session (append mode).
    """
    gap_ms = gap_minutes * 60_000

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            yield _session_row(key, state.get)
            state.remove()
            return
        cur = state.get if state.exists else None
        closed, cur = _session_fold(cur, pdfs, gap_ms)
        for s in closed:
            yield _session_row(key, s)
        if cur is not None:
            state.update(cur)
            # fire when the watermark passes last + gap (timeout must be
            # strictly ahead of the current watermark)
            state.setTimeoutTimestamp(
                max(cur[1] + gap_ms, state.getCurrentWatermarkMs() + 1)
            )

    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def has_tws_deps() -> bool:
    """transformWithStateInPandas needs protobuf for its state protocol."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def sessionize_tws(
    events: DataFrame, gap_minutes: int = 30, delay: str = "2 minutes"
) -> DataFrame:
    """Spark-4-native twin of :func:`sessionize` on the
    ``transformWithStateInPandas`` API (state v2): named value state,
    explicit event-time timers (register/delete/list), RocksDB-backed.

    Semantics are identical to ``sessionize``; this variant is the
    forward path — state v2 adds TTL, multiple typed state variables and
    schema evolution. It is gated on ``has_tws_deps()`` (the state
    protocol speaks protobuf, which this container does not ship): the
    gate raises HERE, at call time, with a clear message — without it
    the missing dependency only surfaces deep inside a Python worker
    once the stream starts. The plumbing — processor, schemas, timer
    discipline — is real and the scenario test runs wherever protobuf
    exists; where it doesn't, the test pins this loud failure instead
    of skipping.
    """
    if not has_tws_deps():
        raise RuntimeError(
            "sessionize_tws needs google.protobuf (the "
            "transformWithStateInPandas state protocol); install "
            "protobuf or use sessionize() — identical semantics on the "
            "applyInPandasWithState API"
        )
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_ms = gap_minutes * 60_000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.open = handle.getValueState("open_session", SESSION_STATE_DDL)

        def handleInputRows(
            self,
            key: tuple[Any, ...],
            rows: Iterator[pd.DataFrame],
            timerValues: TimerValues,
        ) -> Iterator[pd.DataFrame]:
            cur = tuple(self.open.get()) if self.open.exists() else None
            closed, cur = _session_fold(cur, rows, gap_ms)
            for s in closed:
                yield _session_row(key, s)
            if cur is not None:
                # one open session per key -> exactly one pending timer
                for old in self.handle.listTimers():
                    self.handle.deleteTimer(old)
                self.open.update(cur)
                self.handle.registerTimer(cur[1] + gap_ms)

        def handleExpiredTimer(
            self,
            key: tuple[Any, ...],
            timerValues: TimerValues,
            expiredTimerInfo: ExpiredTimerInfo,
        ) -> Iterator[pd.DataFrame]:
            if self.open.exists():
                yield _session_row(key, tuple(self.open.get()))
                self.open.clear()

        def close(self) -> None:
            pass

    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(),
            outputStructType=SESSION_OUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )


def changes_only(status: DataFrame) -> DataFrame:
    """Stateful change-log over a (station_id, report_time, bikes, docks)
    stream: one output row per actual state transition per station.

    Works on the parsed status stream from ``parse_status_stream``; the
    state store holds one fixed-width tuple per station — station
    cardinality, not event volume, bounds memory.
    """
    return (
        status.select(
            "station_id", "report_time", "bikes_available", "docks_available"
        )
        .groupBy("station_id")
        .applyInPandasWithState(
            _emit_changes,
            outputStructType=CHANGE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_OUT_SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("ts", TimestampType()),
        StructField("x", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = StructType(
    [
        StructField("y", DoubleType()),
        StructField("n", LongType()),
    ]
)


def ewma_stream(
    events: DataFrame, alpha: float = 0.25, delay: str = "2 minutes"
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.ewma_recursive``: per-key
    EWMA maintained ONLINE across micro-batches. State is the last
    smoothed value + count — one fixed-width tuple per key, so the state
    store is key-cardinality-bound — and survives checkpoint restarts
    (the equivalence test restarts the query mid-series and the smoothed
    values stay bit-identical to the batch recurrence over the full
    input). Rows sort by event time within each micro-batch; the same
    two-multiply one-add IEEE step as the batch operator makes
    streaming-equals-batch exact, not approximate, when batches arrive
    in event order (the watermark drops later-than-delay stragglers,
    same bound as the ingest dedup).

    Input stream columns: (k STRING, ts TIMESTAMP, x DOUBLE).
    Output: one smoothed row per input row (append).
    """
    a = float(alpha)
    om = 1.0 - a

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs))
        if pdf.empty:
            return
        pdf = pdf.sort_values("ts", kind="mergesort")
        if state.exists:
            y, n = state.get
        else:
            y, n = 0.0, 0
        ks, tss, xs, ys = [], [], [], []
        for ts_v, x in zip(pdf["ts"], pdf["x"].astype("float64")):
            y = x if n == 0 else om * y + a * x
            n += 1
            ks.append(key[0])
            tss.append(ts_v)
            xs.append(x)
            ys.append(y)
        state.update((float(y), int(n)))
        yield pd.DataFrame({"k": ks, "ts": tss, "x": xs, "ewma": ys})

    return (
        events.select("k", "ts", "x")
        .withWatermark("ts", delay)
        .groupBy("k")
        .applyInPandasWithState(
            fn,
            outputStructType=EWMA_OUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


from pyspark.sql.types import ArrayType  # noqa: E402

MG_OUT_SCHEMA = StructType(
    [
        StructField("grp", StringType()),
        StructField("batch_max_ts", TimestampType()),
        StructField("key", LongType()),
        StructField("mg_count", LongType()),
    ]
)

MG_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def heavy_hitters_stream(
    events: DataFrame, capacity: int = 16, delay: str = "2 minutes"
) -> DataFrame:
    """Streaming heavy hitters per group via an ONLINE Misra-Gries
    summary — frequency tracking whose state is ``capacity`` counters
    per group no matter how many distinct keys flow past (the
    unbounded-state groupBy-count this replaces is exactly what a
    100 TB keyspace can't afford online). The MG guarantee survives
    streaming unchanged: after any prefix, true_count(k) ≥ mg_count(k)
    ≥ true_count(k) − N/capacity, so every key above that threshold is
    in the summary. Each micro-batch folds rows in (ts, key) order —
    the same fold the batch operator (sketches.py::heavy_hitters) runs
    per partition — and emits the full summary tagged with the batch's
    max event time (consumers take the latest tag; append sinks keep
    the summary's history for free).

    Input stream columns: (grp STRING, ts TIMESTAMP, key LONG).
    """

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs))
        if pdf.empty:
            return
        pdf = pdf.sort_values(["ts", "key"], kind="mergesort")
        if state.exists:
            ks, cs = state.get
            mg = dict(zip(list(ks), list(cs)))
        else:
            mg = {}
        for k in pdf["key"].astype("int64"):
            k = int(k)
            if k in mg:
                mg[k] += 1
            elif len(mg) < capacity:
                mg[k] = 1
            else:
                dead = []
                for kk in mg:
                    mg[kk] -= 1
                    if mg[kk] == 0:
                        dead.append(kk)
                for kk in dead:
                    del mg[kk]
        items = sorted(mg.items())
        state.update((
            [int(k) for k, _ in items], [int(c) for _, c in items],
        ))
        tag = pdf["ts"].max()
        yield pd.DataFrame(
            {
                "grp": key[0],
                "batch_max_ts": tag,
                "key": [k for k, _ in items],
                "mg_count": [c for _, c in items],
            }
        )

    return (
        events.select("grp", "ts", "key")
        .withWatermark("ts", delay)
        .groupBy("grp")
        .applyInPandasWithState(
            fn,
            outputStructType=MG_OUT_SCHEMA,
            stateStructType=MG_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
