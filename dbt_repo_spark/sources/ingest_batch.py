"""Batch ingestion jobs: the reference's two Dataproc loader scripts as
engine functions (SURVEY.md §3.2).

- ``gbfs_raw_load``       ≙ src/pyspark_gbfs_raw_load.py:48-135 — recursive
  JSON dir scan, schema-drift column drop, ingest timestamp, optional
  nested-struct→JSON-string serialization, append into the raw layer.
- ``historic_trips_load`` ≙ src/historical_bucket_to_bq.py:57-153 — CSV
  glob scan, key NULL-filter, timestamp parse, typed casts, overwrite into
  the raw layer.

Both write through the layered Catalog (partitioned parquet), so the
BigQuery sinks (S7/S8) become partition-prunable tables. No driver-side
row handling anywhere — each job is one Catalyst plan ending in a write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_repo_spark.sources.catalog import Catalog
from dbt_repo_spark.sources.readers import read_csv_glob, read_json_dir


def drop_nested_station_field(df: DataFrame, field: str) -> DataFrame:
    """P15: schema-drift guard — drop ``field`` from every struct in
    ``data.stations`` by rebuilding the struct via a higher-order transform.

    Mirrors src/pyspark_gbfs_raw_load.py:74-83, which introspects the
    INFERRED schema and rebuilds each station struct minus the drifted
    column (``station_area`` in the reference feed). Runs entirely in
    Tungsten (no Python): ``transform`` + ``struct`` over the array.
    """
    stations_type = None
    for f0 in df.schema:
        if f0.name == "data":
            for f1 in f0.dataType:
                if f1.name == "stations":
                    stations_type = f1.dataType.elementType
    if stations_type is None or field not in stations_type.fieldNames():
        return df  # nothing drifted — no-op, same as the reference's guard
    keep = [n for n in stations_type.fieldNames() if n != field]
    rebuilt = F.transform(
        F.col("data.stations"),
        lambda s: F.struct(*[s[n].alias(n) for n in keep]),
    )
    return df.withColumn("data", F.struct(rebuilt.alias("stations")))


def archive_loaded_sources(
    landing_dir: str,
    archive_dir: str | None = None,
    pattern: str = "**/*",
) -> list[str]:
    """S11: retire landing files AFTER a successful load.

    Mirrors the reference's post-load source deletion
    (src/pyspark_gbfs_raw_load.py:117-121 — delete_blobs_in_prefix after
    the BigQuery write succeeds), with a safer default: when
    ``archive_dir`` is given, files MOVE there preserving their relative
    layout (the audit-friendly production shape); with ``archive_dir=None``
    they are deleted outright like the reference. Per-file failures are
    best-effort skipped — the reference logs-and-continues too — so a
    half-archived landing dir never fails the load that already
    committed. Returns the retired source paths.

    This is deliberately a DRIVER-side filesystem op, not a Spark job:
    landing-file counts are ingest-tick bound (thousands, not billions).
    On object stores the same contract maps to a bulk move/delete by
    prefix.
    """
    import shutil
    from pathlib import Path

    root = Path(landing_dir)
    retired: list[str] = []
    for src in sorted(p for p in root.glob(pattern) if p.is_file()):
        try:
            if archive_dir is None:
                src.unlink()
            else:
                dst = Path(archive_dir) / src.relative_to(root)
                dst.parent.mkdir(parents=True, exist_ok=True)
                shutil.move(str(src), str(dst))
            retired.append(str(src))
        except OSError:  # pragma: no cover - racing cleanup is best-effort
            continue
    return retired


def gbfs_raw_load(
    spark: SparkSession,
    landing_dir: str,
    catalog: Catalog,
    table: str,
    drop_fields: tuple[str, ...] = ("station_area",),
    serialize_data: bool = False,
    archive_dir: str | None = None,
    retire_sources: bool = False,
) -> DataFrame:
    """S1 scan → P15 drift-drop → P14 ingest ts → optional to_json → S7 append.

    ``serialize_data=True`` replaces the nested ``data`` struct with a
    ``data_json`` string (src/pyspark_gbfs_raw_load.py:102-104) — the
    reference's fallback for feeds whose nesting the warehouse rejects;
    the staging model re-extracts with json path functions.
    ``retire_sources=True`` archives (or, with ``archive_dir=None``,
    deletes) the landing files after the write commits — S11, the
    reference's delete-after-load step. Returns the DataFrame re-read
    from the raw layer.
    """
    df = read_json_dir(spark, landing_dir)
    for fld in drop_fields:
        df = drop_nested_station_field(df, fld)
    df = df.withColumn("ingest_datetime", F.current_timestamp())
    if serialize_data:
        df = df.withColumn("data_json", F.to_json("data")).drop("data")
    catalog.write(df, "raw", table, mode="append")
    out = catalog.read("raw", table)
    if retire_sources:
        # only after the write above committed — a failed write raises
        # before reaching this point, leaving the landing dir intact
        archive_loaded_sources(landing_dir, archive_dir)
    return out


TRIP_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSSXXX"  # historical_bucket_to_bq.py:80-81
# (µs-precision source timestamps with +00:00 offsets — data/01_2025.csv:2)


def _to_ts(df: DataFrame, col: str) -> DataFrame:
    """Parse ``col`` with the trip-CSV format iff it's still a string.

    With ``inferSchema=true`` Spark may already have inferred a timestamp
    (the reference relies on exactly that); the explicit parse is the
    deterministic path when inference was disabled or fell back to string.
    """
    if dict(df.dtypes)[col] == "string":
        return df.withColumn(col, F.to_timestamp(F.col(col), TRIP_TS_FMT))
    return df


def historic_trips_load(
    spark: SparkSession,
    csv_glob: str,
    catalog: Catalog,
    table: str = "historic_trips",
) -> DataFrame:
    """S2 CSV scan → P4 dropna keys → to_timestamp ×2 → P7 casts → S8 overwrite.

    Mirrors src/historical_bucket_to_bq.py:57-119: header+inferSchema CSV
    read, NULL-key filter on started_at/ended_at, explicit timestamp parse
    with the +00:00-offset format, integer/string casts, full overwrite.
    """
    df = read_csv_glob(spark, csv_glob)
    df = df.na.drop(subset=["started_at", "ended_at"])
    df = _to_ts(_to_ts(df, "started_at"), "ended_at")
    df = (
        df.withColumn("duration", F.col("duration").cast("integer"))
        .withColumn("start_station_id", F.col("start_station_id").cast("string"))
        .withColumn("end_station_id", F.col("end_station_id").cast("string"))
    )
    catalog.write(df, "raw", table, mode="overwrite")
    return catalog.read("raw", table)
