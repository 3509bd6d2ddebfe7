"""Paginated-endpoint source via the Spark 4 Python DataSource API.

Closes SURVEY.md §2.1-S12: the reference fetches a paginated REST API in
a driver-side loop and archives raw pages
(`/root/reference/src/api_to_bucket.py:137-177` — page N, append to
bucket, N+1 until empty). The Spark-native re-expression registers a
custom ``DataSource`` whose reader PARTITIONS THE PAGE RANGE: on a
1000-executor cluster each task pulls its own page slice concurrently
instead of one machine looping, and the result lands as an ordinary
DataFrame that the existing parse (P3 struct flatten) and archive (S11)
stages consume unchanged.

Transport is pluggable and defaults to a directory-backed endpoint
(``page-<n>.json`` files) because this environment has no network; a
real HTTP transport drops into ``_fetch_page`` without touching the
partitioning or the plan. Raw page text is preserved byte-for-byte
(the reference archives raw pages for replay — same contract).

Scale notes: page discovery is one driver-side listing (the reference
probes pages serially until a 404 — strictly worse); payload bytes never
pass through the driver — each task reads only its slice. Parsing stays
downstream in Spark SQL (``from_json``), so schema drift is handled by
the same P15 machinery as every other source.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator, Sequence

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_PAGE_RE = re.compile(r"^page-(\d+)\.json$")


def _list_pages(endpoint: str) -> list[int]:
    out = []
    for f in os.listdir(endpoint):
        m = _PAGE_RE.match(f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _fetch_page(endpoint: str, page: int) -> str:
    """Directory-backed transport: page-<n>.json is the response body.
    A real deployment swaps this for an HTTP GET with retry/backoff —
    the reader contract (page -> raw text) is the seam."""
    with open(os.path.join(endpoint, f"page-{page}.json")) as fh:
        return fh.read()


class _PageRange(InputPartition):
    def __init__(self, endpoint: str, pages: list[int]):
        self.endpoint = endpoint
        self.pages = pages


class _PagedJsonReader(DataSourceReader):
    def __init__(self, options: dict):
        self.endpoint = options.get("path")
        if not self.endpoint:
            raise ValueError("paged_json requires option 'path'")
        self.pages_per_partition = int(options.get("pagesperpartition", 8))

    def partitions(self) -> Sequence[InputPartition]:
        pages = _list_pages(self.endpoint)
        n = self.pages_per_partition
        ranges = [pages[i : i + n] for i in range(0, len(pages), n)]
        # an endpoint with no pages still needs one (empty) partition so
        # the scan yields an empty frame, not a planning error
        return [_PageRange(self.endpoint, r) for r in (ranges or [[]])]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        for page in partition.pages:
            yield (page, _fetch_page(partition.endpoint, page))


class _PagedJsonStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked STREAMING read of the same endpoint — the
    message-bus shape (reference: `realtime_pubsub_to_spark.py:99-115`
    subscribes to Pub/Sub): the offset is the next unread page number,
    each micro-batch drains pages [start, latest), and a checkpoint
    restart resumes from the committed offset — exactly-once without a
    broker, because pages are immutable and the offset is the replay
    cursor (Kafka semantics, page = record batch).

    ``readBetweenOffsets`` re-serves an EXACT prior range during
    recovery, which is what makes a failed micro-batch replay
    deterministic.
    """

    def __init__(self, options: dict):
        self.endpoint = options.get("path")
        if not self.endpoint:
            raise ValueError("paged_json requires option 'path'")

    def initialOffset(self) -> dict:
        return {"next_page": 0}

    def _rows(self, pages: list[int]) -> Iterator[tuple]:
        for p in pages:
            yield (p, _fetch_page(self.endpoint, p))

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        pages = [p for p in _list_pages(self.endpoint) if p >= start["next_page"]]
        if not pages:
            # empty tick: MUST be an iterator, not a list — the simple-
            # stream wrapper validates no-advance batches with next(it),
            # so a quiet endpoint under a running trigger would crash
            # the query with `'list' object is not an iterator`
            return iter(()), start
        end = {"next_page": pages[-1] + 1}
        # materialized list, not a generator: the simple-stream wrapper
        # PICKLES the prefetched batch into its block cache. This is the
        # simple API's documented tradeoff (driver prefetch, low volume);
        # a high-volume endpoint would use DataSourceStreamReader with
        # executor-side partition reads like the batch path above.
        return list(self._rows(pages)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        pages = [
            p
            for p in _list_pages(self.endpoint)
            if start["next_page"] <= p < end["next_page"]
        ]
        return list(self._rows(pages))


class PagedJsonDataSource(DataSource):
    """``spark.read.format("paged_json").option("path", dir)`` →
    (page INT, payload STRING), one row per endpoint page. Also a
    STREAMING source: ``spark.readStream.format("paged_json")`` tails
    the endpoint with page-number offsets (see _PagedJsonStreamReader).
    """

    @classmethod
    def name(cls) -> str:
        return "paged_json"

    def schema(self) -> str:
        return "page int, payload string"

    def reader(self, schema) -> _PagedJsonReader:
        return _PagedJsonReader(self.options)

    def simpleStreamReader(self, schema) -> _PagedJsonStreamReader:
        return _PagedJsonStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "_PagedJsonStreamWriter":
        return _PagedJsonStreamWriter(self.options)

    def writer(self, schema, overwrite: bool) -> _PagedJsonWriter:
        if overwrite:
            raise ValueError(
                "paged_json sink is append-only (pages are immutable; "
                "the replay cursor depends on it)"
            )
        return _PagedJsonWriter(self.options)


@dataclass
class _PageBatch(WriterCommitMessage):
    """Staged files one task wrote: (staging_path, row_count) pairs."""

    files: list  # [(staged_path, n_rows)]


class _PagedJsonWriter(DataSourceWriter):
    """Archive sink with the V2 commit protocol: tasks write to a
    STAGING directory under task-unique names; ``commit`` renames the
    staged files into the endpoint with sequential page numbers
    (starting after the highest existing page — append semantics);
    ``abort`` deletes the staging dir. A reader never observes a
    partial PAGE: visibility is the per-file atomic rename at commit,
    the same contract the reference gets from GCS
    compose-after-upload. Whole-BATCH atomicity under a crash mid-way
    through the rename loop is the streaming writer's job (its
    two-phase marker pins the page range so a replay overwrites rather
    than appends); the one-shot batch path surfaces such a crash as a
    failed job with a partial prefix of pages published."""

    def __init__(self, options: dict):
        self.endpoint = options.get("path")
        if not self.endpoint:
            raise ValueError("paged_json sink requires option 'path'")
        self.staging = os.path.join(self.endpoint, "_staging")

    def write(self, iterator) -> _PageBatch:
        import uuid

        os.makedirs(self.staging, exist_ok=True)
        files = []
        for row in iterator:
            staged = os.path.join(self.staging, f"{uuid.uuid4().hex}.json")
            with open(staged, "w") as fh:
                fh.write(row.payload)
            files.append((staged, 1))
        return _PageBatch(files=files)

    def commit(self, messages) -> None:
        existing = _list_pages(self.endpoint)
        next_page = (existing[-1] + 1) if existing else 0
        for msg in messages:
            for staged, _ in msg.files:
                os.replace(
                    staged, os.path.join(self.endpoint, f"page-{next_page}.json")
                )
                next_page += 1
        self._cleanup()

    def abort(self, messages) -> None:
        self._cleanup()

    def _cleanup(self) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class _PagedJsonStreamWriter(DataSourceStreamWriter):
    """Streaming twin of the archive sink, exactly-once under every
    crash point via a two-phase marker (``_commits.json``):

    1. Before any rename, the commit records an INTENT — the batchId
       and the first page number of its range — with an atomic
       tmp + ``os.replace`` marker write.
    2. Staged files then publish to the PINNED range
       ``[first_page, first_page + n)``. A crash mid-publish and
       replay re-enters commit, finds the intent, DELETES every page
       numbered >= ``first_page`` (all of them belong to the crashed
       attempt — nothing later can have committed while the intent
       stood), and republishes the re-staged batch into the same
       range. The delete-then-overwrite makes the replay exact even
       when it plans a different number of non-empty partitions than
       the crashed attempt (page count is NOT assumed stable), and
       the same sweep scrubs partial pages of a discarded stale
       intent before the next batch picks its range.
    3. The marker is rewritten with ``last_batch_id = batchId``
       (clearing the intent). A crash between this step and the
       engine's checkpoint commit replays the batch; the marker turns
       it into a logged no-op.

    Together the endpoint-to-archive pipeline (paged_json readStream →
    paged_json writeStream) is exactly-once end to end — the
    reference's Pub/Sub→bucket path with the broker replaced by
    immutable pages.

    Marker lifetime: ``_commits.json`` is tied to the CHECKPOINT
    lifetime (same contract as upstream FileStreamSink's _spark_metadata
    log). Deleting or resetting the streaming checkpoint while reusing
    the same archive directory restarts batchIds at 0 and every commit
    would be skipped as a replay — each skip logs a warning so the
    misconfiguration is visible; delete the marker together with the
    checkpoint to start a fresh lineage."""

    def __init__(self, options: dict):
        self._batch = _PagedJsonWriter(options)
        self._marker = os.path.join(self._batch.endpoint, "_commits.json")

    def _state(self) -> dict:
        try:
            with open(self._marker) as fh:
                state = json.load(fh)
            return {
                "last_batch_id": int(state["last_batch_id"]),
                "pending": state.get("pending"),
            }
        except (OSError, ValueError, KeyError, TypeError):
            return {"last_batch_id": -1, "pending": None}

    def _write_marker(self, state: dict) -> None:
        tmp = self._marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self._marker)

    def write(self, iterator) -> _PageBatch:
        return self._batch.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        import logging

        state = self._state()
        if batchId <= state["last_batch_id"]:
            # Replayed micro-batch (crash after sink commit, before the
            # engine checkpointed): the pages are already published —
            # publishing again would duplicate rows. Drop the re-staged
            # files and return. Loud, because the OTHER way to land here
            # is a reset checkpoint pointed at an old archive dir, which
            # would silently drop every batch.
            logging.getLogger(__name__).warning(
                "paged_json sink: skipping already-committed batch %d "
                "(last committed %d). Expected once after crash "
                "recovery; if this repeats for every batch, the "
                "checkpoint was reset while reusing %s — delete "
                "_commits.json along with the checkpoint.",
                batchId,
                state["last_batch_id"],
                self._batch.endpoint,
            )
            self._batch.abort(messages)
            return
        pending = state["pending"]
        if pending:
            # Any page numbered >= the intent's first_page was written
            # by the crashed attempt's partial publish: first_page was
            # chosen past every committed page at intent time, and no
            # later batch can have committed while the intent stood
            # (commit clears it). Deleting that suffix makes BOTH
            # pending paths exact without tracking the old attempt's
            # page count: a replay that plans FEWER non-empty
            # partitions than the crash left behind no longer strands
            # orphan pages beyond its new prefix, and a discarded
            # stale intent no longer leaves partial pages for the next
            # batch to append after.
            for pg in _list_pages(self._batch.endpoint):
                if pg >= int(pending["first_page"]):
                    os.remove(
                        os.path.join(self._batch.endpoint, f"page-{pg}.json")
                    )
        if pending and int(pending["batch_id"]) == batchId:
            # Crash mid-publish: reuse the pinned range so the replay
            # lands on the same page numbers the crash intended.
            first = int(pending["first_page"])
        else:
            if pending:
                logging.getLogger(__name__).warning(
                    "paged_json sink: discarding stale publish intent "
                    "for batch %s while committing batch %d",
                    pending.get("batch_id"),
                    batchId,
                )
            existing = _list_pages(self._batch.endpoint)
            first = (existing[-1] + 1) if existing else 0
            self._write_marker(
                {
                    "last_batch_id": state["last_batch_id"],
                    "pending": {"batch_id": batchId, "first_page": first},
                }
            )
        staged = [f for m in messages if m is not None for f in m.files]
        for i, (path, _) in enumerate(staged):
            os.replace(
                path,
                os.path.join(self._batch.endpoint, f"page-{first + i}.json"),
            )
        self._write_marker({"last_batch_id": batchId, "pending": None})
        self._batch._cleanup()

    def abort(self, messages, batchId: int) -> None:
        self._batch.abort(messages)


def register(spark) -> None:
    spark.dataSource.register(PagedJsonDataSource)
