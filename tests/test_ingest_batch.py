"""Batch-ingestion tests (SURVEY.md §3.2): JSON raw load with schema-drift
drop + serialization fallback, and the CSV trips load."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dbt_repo_spark.sources.catalog import Catalog
from dbt_repo_spark.sources.ingest_batch import (
    drop_nested_station_field,
    gbfs_raw_load,
    historic_trips_load,
)

FEED = {
    "last_updated": 1735700000,
    "ttl": 60,
    "version": "2.3",
    "data": {
        "stations": [
            {
                "station_id": "st000",
                "num_bikes_available": 4,
                "station_area": {"type": "Polygon"},  # the drifted field
            },
            {
                "station_id": "st001",
                "num_bikes_available": 7,
                "station_area": None,
            },
        ]
    },
}


def _landing(tmp_path, payload: dict) -> str:
    d = tmp_path / "landing" / "2025" / "01"  # nested: recursive lookup
    d.mkdir(parents=True)
    (d / "feed.json").write_text(json.dumps(payload))
    return str(tmp_path / "landing")


def test_gbfs_raw_load_drops_drifted_field(spark, tmp_path):
    landing = _landing(tmp_path, FEED)
    catalog = Catalog(spark, str(tmp_path / "wh"))
    out = gbfs_raw_load(spark, landing, catalog, "station_status")
    station_fields = (
        out.select(F.explode("data.stations").alias("s")).select("s.*").columns
    )
    assert "station_area" not in station_fields
    assert "station_id" in station_fields
    assert out.count() == 1
    assert "ingest_datetime" in out.columns
    # append semantics (S7): loading again doubles the rows
    gbfs_raw_load(spark, landing, catalog, "station_status")
    assert catalog.read("raw", "station_status").count() == 2


def test_drop_nested_field_noop_without_drift(spark, tmp_path):
    clean = json.loads(json.dumps(FEED))
    for s in clean["data"]["stations"]:
        del s["station_area"]
    landing = _landing(tmp_path, clean)
    df = spark.read.option("multiLine", "true").option(
        "recursiveFileLookup", "true"
    ).json(landing)
    assert drop_nested_station_field(df, "station_area") is df


def test_gbfs_raw_load_serialize_fallback(spark, tmp_path):
    landing = _landing(tmp_path, FEED)
    catalog = Catalog(spark, str(tmp_path / "wh"))
    out = gbfs_raw_load(
        spark, landing, catalog, "station_information", serialize_data=True
    )
    assert "data" not in out.columns and "data_json" in out.columns
    sid = out.select(
        F.get_json_object("data_json", "$.stations[0].station_id").alias("s")
    ).first()
    assert sid.s == "st000"


def test_historic_trips_load(spark, tmp_path):
    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    header = "started_at,ended_at,duration,start_station_id,end_station_id"
    rows = [
        "2025-01-01 04:37:39.287000+00:00,2025-01-01 04:47:39.287000+00:00,600,101,202",
        "2025-01-02 10:00:00.000000+00:00,2025-01-02 10:05:30.000000+00:00,330,103,204",
        ",2025-01-03 00:00:00.000000+00:00,60,105,206",  # NULL started_at → dropped
    ]
    (csv_dir / "01_2025.csv").write_text("\n".join([header, *rows]))
    catalog = Catalog(spark, str(tmp_path / "wh"))
    out = historic_trips_load(spark, str(csv_dir / "*.csv"), catalog)
    assert out.count() == 2
    row = out.orderBy("started_at").first()
    assert row.start_station_id == "101" and isinstance(row.start_station_id, str)
    assert row.duration == 600
    assert F.unix_timestamp  # noqa: B018 - keep import visible
    epoch = out.select(F.unix_timestamp(F.col("started_at")).alias("e")).orderBy("e").first().e
    assert epoch == 1735706259  # 2025-01-01T04:37:39Z
    # overwrite semantics (S8): re-load keeps count
    out = historic_trips_load(spark, str(csv_dir / "*.csv"), catalog)
    assert out.count() == 2


def test_catalog_orc_and_csv_roundtrip(spark, tmp_path):
    """S7/S8 generalized: the catalog writes/reads ORC (columnar alt) and
    CSV (interchange) through the same path API."""
    from pyspark.sql import functions as F

    from dbt_repo_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], ["k", "s", "v"])
    cat.write(df, "raw", "t_orc", fmt="orc")
    back = cat.read("raw", "t_orc", fmt="orc")
    assert back.schema == df.schema  # orc preserves types
    assert sorted(r["k"] for r in back.collect()) == [1, 2]

    cat.write(df.withColumn("v", F.col("v").cast("string")), "raw", "t_csv", fmt="csv")
    n = cat.read("raw", "t_csv", fmt="csv").count()
    assert n == 2


def test_read_with_quarantine_splits_bad_json(spark, tmp_path):
    """PERMISSIVE scan: clean rows parse, malformed records land in the
    quarantine with their original bytes, nothing is dropped."""
    from pyspark.sql import types as T

    from dbt_repo_spark.sources.readers import read_with_quarantine

    p = tmp_path / "feed"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"station_id": "s1", "bikes": 3}\n'
        'THIS IS NOT JSON\n'
        '{"station_id": "s2", "bikes": "not_a_number"}\n'
        '{"station_id": "s3", "bikes": 7}\n'
    )
    schema = T.StructType(
        [T.StructField("station_id", T.StringType()),
         T.StructField("bikes", T.LongType())]
    )
    good, bad = read_with_quarantine(spark, str(p), schema, fmt="json")
    assert {(r.station_id, r.bikes) for r in good.collect()} == {
        ("s1", 3), ("s3", 7)
    }
    bad_rows = [r._corrupt_record for r in bad.collect()]
    assert len(bad_rows) == 2
    assert any("NOT JSON" in b for b in bad_rows)
    assert any("not_a_number" in b for b in bad_rows)  # original bytes kept


def test_read_media_dir_binary_file_source(spark, tmp_path):
    """binaryFile landing scan -> multimodal shape -> feature extraction:
    ids are path-stable, types derive from extension, and the decode
    stage consumes the scan output unchanged."""
    from dbt_repo_spark.operators.multimodal import extract_media_features
    from dbt_repo_spark.sources.readers import read_media_dir

    media = tmp_path / "media"
    (media / "sub").mkdir(parents=True)
    (media / "a.jpg").write_bytes(b"\xff\xd8fakejpeg")
    (media / "b.wav").write_bytes(b"RIFFfakewav")
    (media / "sub" / "c.mp4").write_bytes(b"\x00\x00fakemp4")
    (media / "notes.txt").write_bytes(b"not media")

    df = read_media_dir(spark, str(media))
    rows = {r.source_path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.jpg", "b.wav", "c.mp4", "notes.txt"}
    assert rows["a.jpg"].media_type == "image"
    assert rows["b.wav"].media_type == "audio"
    assert rows["c.mp4"].media_type == "video"
    assert rows["notes.txt"].media_type == "binary"
    assert rows["a.jpg"].n_bytes == 10
    assert bytes(rows["b.wav"].content) == b"RIFFfakewav"

    # re-scan gives identical ids (content-addressed by path)
    again = {r.source_path: r.media_id for r in read_media_dir(spark, str(media)).collect()}
    assert all(again[r.source_path] == r.media_id for r in rows.values())

    # glob filters at listing time
    assert read_media_dir(spark, str(media), glob="*.jpg").count() == 1

    # the decode stage consumes the scan output directly
    feats = extract_media_features(df.select("media_id", "media_type", "content"))
    assert feats.count() == 4
    assert {f.name for f in feats.schema.fields} >= {"media_id", "n_bytes", "checksum"}


def test_catalog_schema_evolution_merge(spark, tmp_path):
    """An append under an evolved schema (new column) reads back with the
    unified schema under merge_schema=True; old rows carry NULL."""
    from pyspark.sql import functions as F

    from dbt_repo_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    v1 = spark.range(3).select(F.col("id"), F.lit("a").alias("tag"))
    cat.write(v1, "raw", "evolving", mode="overwrite")
    v2 = spark.range(3, 5).select(
        F.col("id"), F.lit("b").alias("tag"), F.lit(1.5).alias("score")
    )
    cat.write(v2, "raw", "evolving", mode="append")

    merged = cat.read("raw", "evolving", merge_schema=True)
    assert {f.name for f in merged.schema.fields} == {"id", "tag", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[0].score is None and rows[4].score == 1.5
    assert merged.count() == 5


def test_catalog_write_codec_and_file_size_knobs(spark, tmp_path):
    """compression picks the parquet codec (zstd denser than snappy on
    repetitive data); maxRecordsPerFile bounds rows per file."""
    import os

    from pyspark.sql import functions as F

    from dbt_repo_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(50_000).select(
        F.col("id"), F.lit("the same repetitive text payload " * 4).alias("body")
    ).coalesce(1)

    cat.write(df, "raw", "snappy_t")
    cat.write(df, "raw", "zstd_t", compression="zstd")

    def table_bytes(name):
        d = cat.path("raw", name)
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert table_bytes("zstd_t") < table_bytes("snappy_t")
    zfiles = [f for f in os.listdir(cat.path("raw", "zstd_t")) if f.endswith(".parquet")]
    assert any(f.endswith(".zstd.parquet") for f in zfiles)

    cat.write(df, "raw", "bounded_t", max_records_per_file=10_000)
    n_files = len(
        [f for f in os.listdir(cat.path("raw", "bounded_t")) if f.endswith(".parquet")]
    )
    assert n_files >= 5  # 50k rows / 10k cap
    assert cat.read("raw", "bounded_t").count() == 50_000


def test_archive_loaded_sources_moves_then_deletes(spark, tmp_path):
    """S11 (src/pyspark_gbfs_raw_load.py:117-121): after a successful
    load, landing files retire — archived with relative layout preserved,
    or deleted outright when no archive dir is given. The loaded table is
    unaffected either way."""
    from dbt_repo_spark.sources.ingest_batch import archive_loaded_sources

    landing = _landing(tmp_path, FEED)
    catalog = Catalog(spark, str(tmp_path / "wh"))
    archive = tmp_path / "archive"
    out = gbfs_raw_load(
        spark, landing, catalog, "station_status",
        archive_dir=str(archive), retire_sources=True,
    )
    assert out.count() == 1
    # file moved, landing empty, relative layout kept
    assert (archive / "2025" / "01" / "feed.json").is_file()
    import pathlib
    assert not any(p.is_file() for p in pathlib.Path(landing).rglob("*"))
    # table still reads after the sources are gone
    assert catalog.read("raw", "station_status").count() == 1

    # delete mode (the reference's exact semantics)
    landing2 = _landing(tmp_path / "second", FEED)
    retired = None
    gbfs_raw_load(spark, landing2, catalog, "station_status", retire_sources=True)
    assert not any(p.is_file() for p in pathlib.Path(landing2).rglob("*"))
    assert catalog.read("raw", "station_status").count() == 2

    # best-effort helper returns the retired paths
    landing3 = _landing(tmp_path / "third", FEED)
    retired = archive_loaded_sources(landing3)
    assert len(retired) == 1 and retired[0].endswith("feed.json")


def test_gbfs_raw_load_failure_keeps_sources(spark, tmp_path, monkeypatch):
    """If the write raises, retirement never runs — the landing dir is
    intact for the retry (the reference only deletes after a successful
    BigQuery write)."""
    import pathlib

    import pytest

    landing = _landing(tmp_path, FEED)
    catalog = Catalog(spark, str(tmp_path / "wh"))

    def boom(*a, **k):
        raise RuntimeError("simulated sink failure")

    monkeypatch.setattr(catalog, "write", boom)
    with pytest.raises(RuntimeError, match="simulated sink failure"):
        gbfs_raw_load(spark, landing, catalog, "station_status", retire_sources=True)
    assert any(p.is_file() for p in pathlib.Path(landing).rglob("*"))
