"""Batch sources (SURVEY.md §2.1, S1-S5).

The reference reads GCS; here paths are plain filesystem/URI strings — the
same `spark.read` calls work unchanged against s3a://, gs://, hdfs:// on a
real cluster, so these helpers ARE the scale path (Spark's DataSource V2
handles split planning, predicate pushdown, and column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_json_dir(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Recursive multi-line JSON directory scan.

    Mirrors src/pyspark_gbfs_raw_load.py:94-99 (S1). Schema inference is a
    separate job; pass an explicit schema on hot paths.
    """
    reader = (
        spark.read.option("multiLine", "true")
        .option("recursiveFileLookup", "true")
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_json_file(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Single multiline JSON file (station metadata enrichment side).

    Mirrors src/realtime_pubsub_to_spark.py:164-177 (S3).
    """
    reader = spark.read.option("multiline", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv_glob(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    infer: bool = True,
) -> DataFrame:
    """CSV glob scan with header; inferred or explicit schema.

    Mirrors src/historical_bucket_to_bq.py:57-62 (S2).
    """
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load the driver's synthetic parquet tables from an sf directory."""
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "json",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """Permissive scan that splits clean rows from quarantined raw records.

    The reference trusts its feeds (inferSchema CSV at
    src/historical_bucket_to_bq.py:59-61, schema'd JSON at
    src/realtime_pubsub_to_spark.py:60-79); at 100 TB a malformed record
    per million rows is a certainty and a fail-the-job policy is a
    non-starter. PERMISSIVE mode parses what it can and lands the raw
    text of anything unparseable in ``_corrupt_record``; one scan feeds
    both outputs (Catalyst shares it) and the quarantine side keeps the
    ORIGINAL bytes so the bad records can be replayed after a fix.

    Returns (good, quarantined): good has the user schema, quarantined is
    (_corrupt_record string).

    Spark disallows plans whose referenced columns are ONLY the corrupt
    column (the parser would skip real parsing and report nothing), so
    the helper caches the parsed scan — the documented pattern — which
    also means the two returned sides share one physical parse instead
    of re-reading the files. Call ``.unpersist()`` on either side's
    ``.sparkSession``-cached source when done, or let it age out.
    """
    corrupt_col = "_corrupt_record"
    full = schema.add(corrupt_col, "string") if corrupt_col not in schema.names else schema
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.format(fmt).load(path).cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad


MEDIA_EXT_TYPES = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary media landing-dir scan via Spark's ``binaryFile`` source.

    Reads a directory of image/audio/video blobs into the engine's
    multimodal shape (operators/multimodal.py::MEDIA_SCHEMA): media_id is
    the xxhash64 of the file path (content-addressed id, stable across
    re-scans), media_type derives from the extension, content is the raw
    bytes. The source is split-planned by Spark — files distribute
    across tasks up to ``spark.sql.files.maxPartitionBytes`` — and
    metadata-only pipelines that select (path, length) without content
    never read the blob bytes (the binaryFile reader prunes the content
    column). Pass ``glob`` (e.g. "*.jpg") to filter at listing time
    rather than post-scan.
    """
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    type_map = F.create_map(
        *[F.lit(x) for kv in MEDIA_EXT_TYPES.items() for x in kv]
    )
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.coalesce(type_map[ext], F.lit("binary")).alias("media_type"),
        F.col("content"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
    )
