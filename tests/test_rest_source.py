"""S12 paginated-endpoint source (Spark 4 Python DataSource API):
partitioned page fetch -> DataFrame -> existing parse/archive stages."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dbt_repo_spark.sources.rest_source import PagedJsonDataSource, register


@pytest.fixture()
def endpoint(tmp_path):
    for n in range(21):
        body = {"stations": [{"station_id": f"s{n}-{i}", "free": n + i} for i in range(3)]}
        (tmp_path / f"page-{n}.json").write_text(json.dumps(body))
    # a non-page file must be ignored by discovery
    (tmp_path / "manifest.txt").write_text("not a page")
    return str(tmp_path)


def test_reads_every_page_with_partitioned_fetch(spark, endpoint):
    register(spark)
    df = (
        spark.read.format("paged_json")
        .option("path", endpoint)
        .option("pagesPerPartition", 8)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 21
    assert {r.page for r in rows} == set(range(21))
    # 21 pages / 8 per partition -> 3 concurrent fetch tasks
    nparts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert nparts == 3
    # raw page text preserved byte-for-byte (archive-for-replay contract)
    body = json.loads(next(r.payload for r in rows if r.page == 4))
    assert body["stations"][0]["station_id"] == "s4-0"


def test_composes_with_downstream_json_parse(spark, endpoint):
    register(spark)
    df = spark.read.format("paged_json").option("path", endpoint).load()
    parsed = df.select(
        "page",
        F.explode(
            F.from_json(
                "payload",
                "struct<stations: array<struct<station_id: string, free: int>>>",
            ).stations
        ).alias("s"),
    ).select("page", "s.station_id", "s.free")
    assert parsed.count() == 63
    assert parsed.filter(F.col("station_id") == "s7-2").collect()[0].free == 9


def test_empty_endpoint_yields_empty_frame(spark, tmp_path):
    register(spark)
    df = spark.read.format("paged_json").option("path", str(tmp_path)).load()
    assert df.count() == 0
    assert df.columns == ["page", "payload"]


def test_missing_path_option_fails_loudly(spark):
    register(spark)
    with pytest.raises(Exception, match="path"):
        spark.read.format("paged_json").load().collect()


def _drain(spark, endpoint, out_dir, ckpt):
    """One availableNow pass: stream endpoint -> parquet, then stop."""
    register(spark)
    q = (
        spark.readStream.format("paged_json")
        .option("path", endpoint)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_offsets_resume_across_restarts(spark, tmp_path):
    endpoint = tmp_path / "api"
    endpoint.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for n in range(5):
        (endpoint / f"page-{n}.json").write_text(json.dumps({"n": n}))
    _drain(spark, str(endpoint), out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 5

    # new pages arrive; a RESTARTED stream (same checkpoint) must pick up
    # ONLY pages >= the committed offset — no duplicates, no gaps
    for n in range(5, 8):
        (endpoint / f"page-{n}.json").write_text(json.dumps({"n": n}))
    _drain(spark, str(endpoint), out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 8
    assert sorted(r.page for r in rows) == list(range(8))
    # payloads intact end to end
    assert json.loads(next(r.payload for r in rows if r.page == 6)) == {"n": 6}


def test_writer_appends_pages_atomically(spark, tmp_path):
    endpoint = tmp_path / "sink"
    endpoint.mkdir()
    (endpoint / "page-0.json").write_text('{"seed": true}')
    register(spark)
    payloads = [json.dumps({"rec": i}) for i in range(6)]
    df = spark.createDataFrame([(0, p) for p in payloads], "page int, payload string")
    df.repartition(3).write.format("paged_json").option(
        "path", str(endpoint)
    ).mode("append").save()
    files = sorted(f.name for f in endpoint.iterdir() if f.name.startswith("page-"))
    # sequential numbering APPENDS after the existing page-0
    assert files == [f"page-{n}.json" for n in range(7)]
    bodies = [json.loads((endpoint / f"page-{n}.json").read_text()) for n in range(1, 7)]
    assert sorted(b["rec"] for b in bodies) == list(range(6))
    # no staging residue after commit
    assert not (endpoint / "_staging").exists()
    # round-trip: the reader sees exactly what the writer archived
    back = spark.read.format("paged_json").option("path", str(endpoint)).load()
    assert back.count() == 7


def test_writer_overwrite_mode_rejected(spark, tmp_path):
    register(spark)
    df = spark.createDataFrame([(0, "x")], "page int, payload string")
    with pytest.raises(Exception, match="append-only"):
        df.write.format("paged_json").option("path", str(tmp_path)).mode(
            "overwrite"
        ).save()


def test_writer_task_failure_leaves_no_pages(spark, tmp_path):
    endpoint = tmp_path / "sink2"
    endpoint.mkdir()
    register(spark)
    # payload column is non-nullable in the write path: a None payload
    # makes the task raise AFTER staging some rows — abort must clean up
    rows = [(0, "ok-1"), (0, "ok-2"), (0, None)]
    df = spark.createDataFrame(rows, "page int, payload string").coalesce(1)
    with pytest.raises(Exception):
        df.write.format("paged_json").option("path", str(endpoint)).mode(
            "append"
        ).save()
    assert [f.name for f in endpoint.iterdir() if f.name.startswith("page-")] == []


def test_stream_replication_endpoint_to_archive_exactly_once(spark, tmp_path):
    """The reference's bus->bucket pipeline as paged_json -> paged_json:
    stream-read the endpoint, stream-write the archive, restart across
    new data — archive holds each source page exactly once."""
    src = tmp_path / "api"
    dst = tmp_path / "archive"
    src.mkdir()
    dst.mkdir()
    ckpt = str(tmp_path / "ckpt")
    register(spark)

    def replicate():
        q = (
            spark.readStream.format("paged_json")
            .option("path", str(src))
            .load()
            .writeStream.format("paged_json")
            .option("path", str(dst))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for n in range(4):
        (src / f"page-{n}.json").write_text(json.dumps({"n": n}))
    replicate()
    for n in range(4, 7):
        (src / f"page-{n}.json").write_text(json.dumps({"n": n}))
    replicate()

    srcs = sorted(
        (src / f"page-{n}.json").read_text() for n in range(7)
    )
    outs = sorted(
        p.read_text() for p in dst.iterdir() if p.name.startswith("page-")
    )
    assert outs == srcs  # every page exactly once, bytes preserved
    assert not (dst / "_staging").exists()


def test_stream_commit_replay_is_noop(tmp_path):
    """ADVICE r03: a micro-batch replayed after a crash BETWEEN sink
    commit and the engine's checkpoint commit must not re-publish its
    pages. The sink persists the last committed batchId in
    _commits.json and turns the replayed commit into a no-op."""
    from dbt_repo_spark.sources.rest_source import (
        _PageBatch,
        _PagedJsonStreamWriter,
    )

    dst = tmp_path / "archive"
    dst.mkdir()
    w = _PagedJsonStreamWriter({"path": str(dst)})

    def stage(payloads):
        staging = dst / "_staging"
        staging.mkdir(exist_ok=True)
        files = []
        for i, p in enumerate(payloads):
            f = staging / f"t{i}.json"
            f.write_text(p)
            files.append((str(f), 1))
        return [_PageBatch(files=files)]

    w.commit(stage(['{"n": 0}', '{"n": 1}']), batchId=0)
    pages = sorted(f.name for f in dst.iterdir() if f.name.startswith("page-"))
    assert pages == ["page-0.json", "page-1.json"]

    # crash-replay of batch 0: same batchId, freshly re-staged files
    w2 = _PagedJsonStreamWriter({"path": str(dst)})  # fresh instance, as after restart
    w2.commit(stage(['{"n": 0}', '{"n": 1}']), batchId=0)
    pages = sorted(f.name for f in dst.iterdir() if f.name.startswith("page-"))
    assert pages == ["page-0.json", "page-1.json"]  # no duplicates
    assert not (dst / "_staging").exists()  # re-staged files cleaned up

    # the NEXT batch still publishes
    w2.commit(stage(['{"n": 2}']), batchId=1)
    pages = sorted(f.name for f in dst.iterdir() if f.name.startswith("page-"))
    assert pages == [f"page-{n}.json" for n in range(3)]


def test_stream_commit_crash_mid_publish_republishes_same_range(tmp_path):
    """ADVICE r04: a crash AFTER some page renames but BEFORE the
    committed-batch marker update must not duplicate rows on replay.
    The sink records a publish INTENT (batchId, first_page) before any
    rename, so the replayed commit republishes the re-staged batch
    into the SAME page range, overwriting the partial attempt."""
    import json as _json

    from dbt_repo_spark.sources.rest_source import (
        _PageBatch,
        _PagedJsonStreamWriter,
    )

    dst = tmp_path / "archive"
    dst.mkdir()

    def stage(payloads):
        staging = dst / "_staging"
        staging.mkdir(exist_ok=True)
        files = []
        for i, p in enumerate(payloads):
            f = staging / f"t{i}.json"
            f.write_text(p)
            files.append((str(f), 1))
        return [_PageBatch(files=files)]

    # batch 0 commits normally
    w = _PagedJsonStreamWriter({"path": str(dst)})
    w.commit(stage(['{"n": 0}']), batchId=0)

    # batch 1 crashes mid-publish: simulate by writing the intent and
    # ONE of its two pages, exactly the on-disk state commit() leaves
    # if the process dies between the first and second os.replace
    marker = dst / "_commits.json"
    marker.write_text(
        _json.dumps(
            {"last_batch_id": 0, "pending": {"batch_id": 1, "first_page": 1}}
        )
    )
    (dst / "page-1.json").write_text('{"n": 1, "attempt": "partial"}')

    # replay of batch 1 (fresh writer, as after restart): same rows
    # re-staged; must land on pages 1-2, overwriting the partial page,
    # NOT append as pages 3-4
    w2 = _PagedJsonStreamWriter({"path": str(dst)})
    w2.commit(stage(['{"n": 1}', '{"n": 2}']), batchId=1)
    pages = sorted(f.name for f in dst.iterdir() if f.name.startswith("page-"))
    assert pages == ["page-0.json", "page-1.json", "page-2.json"]
    assert (dst / "page-1.json").read_text() == '{"n": 1}'  # partial overwritten
    state = _json.loads(marker.read_text())
    assert state == {"last_batch_id": 1, "pending": None}

    # and the replay-after-full-commit path still no-ops with the new state shape
    w2.commit(stage(['{"n": 1}', '{"n": 2}']), batchId=1)
    pages = sorted(f.name for f in dst.iterdir() if f.name.startswith("page-"))
    assert pages == ["page-0.json", "page-1.json", "page-2.json"]


def test_stream_commit_replay_with_fewer_partitions_leaves_no_orphans(tmp_path):
    """ADVICE r05: a replayed micro-batch may plan FEWER non-empty
    partitions than the crashed attempt (AQE, different parallelism
    after restart). Pages the crash published beyond the replay's new
    prefix must be deleted, not survive as duplicate rows."""
    import json as _json

    from dbt_repo_spark.sources.rest_source import (
        _PageBatch,
        _PagedJsonStreamWriter,
    )

    dst = tmp_path / "archive"
    dst.mkdir()

    def stage(payloads):
        staging = dst / "_staging"
        staging.mkdir(exist_ok=True)
        files = []
        for i, p in enumerate(payloads):
            f = staging / f"t{i}.json"
            f.write_text(p)
            files.append((str(f), 1))
        return [_PageBatch(files=files)]

    w = _PagedJsonStreamWriter({"path": str(dst)})
    w.commit(stage(['{"n": 0}']), batchId=0)

    # batch 1 crashed after publishing THREE pages (three non-empty
    # partitions) but before the marker cleared the intent
    marker = dst / "_commits.json"
    marker.write_text(
        _json.dumps(
            {"last_batch_id": 0, "pending": {"batch_id": 1, "first_page": 1}}
        )
    )
    for i in (1, 2, 3):
        (dst / f"page-{i}.json").write_text(f'{{"n": {i}, "attempt": "partial"}}')

    # the replay re-stages the same rows but plans ONE partition
    w2 = _PagedJsonStreamWriter({"path": str(dst)})
    w2.commit(stage(['{"n": 1}\n{"n": 2}\n{"n": 3}']), batchId=1)
    pages = sorted(f.name for f in dst.iterdir() if f.name.startswith("page-"))
    assert pages == ["page-0.json", "page-1.json"]  # pages 2-3 scrubbed
    assert (dst / "page-1.json").read_text() == '{"n": 1}\n{"n": 2}\n{"n": 3}'
    state = _json.loads(marker.read_text())
    assert state == {"last_batch_id": 1, "pending": None}

    # the next batch continues the numbering from the survivor set
    w2.commit(stage(['{"n": 4}']), batchId=2)
    pages = sorted(f.name for f in dst.iterdir() if f.name.startswith("page-"))
    assert pages == ["page-0.json", "page-1.json", "page-2.json"]


def test_stream_commit_stale_intent_partial_pages_scrubbed(tmp_path):
    """ADVICE r05 second path: discarding a STALE intent must also
    delete the discarded attempt's partially-published pages — the
    next batch must not append after orphan rows of a batch that will
    never commit."""
    import json as _json

    from dbt_repo_spark.sources.rest_source import (
        _PageBatch,
        _PagedJsonStreamWriter,
    )

    dst = tmp_path / "archive"
    dst.mkdir()

    def stage(payloads):
        staging = dst / "_staging"
        staging.mkdir(exist_ok=True)
        files = []
        for i, p in enumerate(payloads):
            f = staging / f"t{i}.json"
            f.write_text(p)
            files.append((str(f), 1))
        return [_PageBatch(files=files)]

    w = _PagedJsonStreamWriter({"path": str(dst)})
    w.commit(stage(['{"n": 0}']), batchId=0)

    # batch 1 left an intent + two partial pages, but the engine is now
    # committing batch 2 (batch 1's data was dropped upstream)
    marker = dst / "_commits.json"
    marker.write_text(
        _json.dumps(
            {"last_batch_id": 0, "pending": {"batch_id": 1, "first_page": 1}}
        )
    )
    (dst / "page-1.json").write_text('{"n": 1, "attempt": "orphan"}')
    (dst / "page-2.json").write_text('{"n": 2, "attempt": "orphan"}')

    w2 = _PagedJsonStreamWriter({"path": str(dst)})
    w2.commit(stage(['{"n": 9}']), batchId=2)
    pages = sorted(f.name for f in dst.iterdir() if f.name.startswith("page-"))
    assert pages == ["page-0.json", "page-1.json"]  # orphans gone, no gap
    assert (dst / "page-1.json").read_text() == '{"n": 9}'
    state = _json.loads(marker.read_text())
    assert state == {"last_batch_id": 2, "pending": None}


def test_streaming_empty_tick_does_not_crash(spark, tmp_path):
    """A drain over an endpoint with NO new pages must be a clean no-op:
    the simple-stream wrapper validates no-advance batches with
    next(it), so read() must return an iterator (not a list) on the
    empty tick."""
    endpoint = tmp_path / "api"
    endpoint.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (endpoint / "page-0.json").write_text('{"n": 0}')
    _drain(spark, str(endpoint), out, ckpt)
    _drain(spark, str(endpoint), out, ckpt)  # nothing new — empty tick
    assert spark.read.parquet(out).count() == 1
