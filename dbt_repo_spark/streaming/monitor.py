"""Streaming observability: a StreamingQueryListener that records every
micro-batch's progress as rows.

The reference runs its Pub/Sub ingest blind (no metrics surface in
`src/realtime_pubsub_to_spark.py`); production streaming needs the
numbers that answer "is the pipeline keeping up": input rows per batch,
processing rate, batch duration, and state-store size (the watermark
dedup's memory). This listener captures Spark's own per-batch
``QueryProgress`` events into an in-memory log and optionally appends
them to a warehouse table, so lag/throughput dashboards are a normal
batch query over ``ops.stream_progress`` — the engine monitors itself
with itself.

Scale note: one small row per micro-batch per query — the observability
table grows with TIME, not data volume; a daily-partitioned append sink
keeps it prunable forever.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Collects (query_id, batch_id, timestamp, num_input_rows,
    process_rate, duration_ms, state_rows) per completed micro-batch."""

    SCHEMA = (
        "query_id string, batch_id long, ts string, num_input_rows long, "
        "rows_per_sec double, duration_ms long, state_rows long"
    )

    def __init__(self):
        self.rows: list[tuple] = []
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface --------------------------------

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        state_rows = sum(s.get("numRowsTotal", 0) for s in state)
        dur = (p.get("durationMs") or {}).get("triggerExecution", 0)
        row = (
            p.get("id"),
            int(p.get("batchId", -1)),
            p.get("timestamp", ""),
            int(p.get("numInputRows", 0)),
            float(p.get("processedRowsPerSecond") or 0.0),
            int(dur or 0),
            int(state_rows),
        )
        with self._lock:
            self.rows.append(row)

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    # -- consumption -----------------------------------------------------

    def to_df(self, spark):
        with self._lock:
            rows = list(self.rows)
        return spark.createDataFrame(rows, self.SCHEMA)

    def flush_to_catalog(self, spark, catalog, layer="ops", name="stream_progress"):
        """Append captured progress to the warehouse and clear exactly
        the flushed prefix; each batch row appears once. Rows the
        listener thread appends BETWEEN the snapshot and the clear stay
        buffered for the next flush (clearing the whole list here would
        silently drop them), and the return value is the snapshot
        length — exactly what was written."""
        with self._lock:
            rows = list(self.rows)
        n = len(rows)
        if n == 0:
            return 0
        catalog.write(spark.createDataFrame(rows, self.SCHEMA), layer, name,
                      mode="append")
        with self._lock:
            del self.rows[:n]
        return n
