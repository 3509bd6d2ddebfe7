"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design: media travels as a ``binary`` column next to a typed metadata
struct; per-item decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages (the only place Python is allowed in
this engine — decode is inherently a Python/native-lib boundary).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
``decode_fn`` defaults to a clearly-marked deterministic fake that derives
"features" from the raw bytes; swap in a real decoder via the same
signature in production. The Spark-side plumbing — schema, Arrow batch
shape, partition sizing — is real and tested.

Scale notes: binary payloads dominate partition size, so callers should
``repartition`` by a size-aware key or set ``maxRecordsPerBatch`` low
enough that an Arrow batch of blobs fits executor memory; metadata-only
transformations should ``select`` away the binary column first (column
pruning drops the blob bytes at the parquet scan).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_repo_spark.session import fan_out
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
    ]
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def fake_decode(content: bytes, media_type: str) -> dict:
    """STUB decoder — deterministic fake standing in for PIL/ffmpeg.

    Real deployments replace this with an actual codec call; everything
    else in the pipeline (schema, batching, partitioning) is unchanged.
    Derives pseudo width/height from a crc and a 8-dim byte-histogram
    "feature vector", so outputs are stable across runs and machines.
    """
    if content is None:
        return {"n_bytes": 0, "checksum": "", "width": None, "height": None, "features": None}
    crc = zlib.crc32(content)
    hist = [0] * 8
    for b in content:
        hist[b & 7] += 1
    total = max(len(content), 1)
    return {
        "n_bytes": len(content),
        "checksum": hashlib.md5(content).hexdigest(),
        "width": 16 + (crc & 0xFF) if media_type == "image" else None,
        "height": 16 + ((crc >> 8) & 0xFF) if media_type == "image" else None,
        "features": [h / total for h in hist],
    }


def real_decode(content: bytes, media_type: str) -> dict:  # pragma: no cover
    """Placeholder for a real codec-backed decoder (libs not installed)."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "pass decode_fn=fake_decode or provide a codec-backed decoder"
    )


def extract_media_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], dict] = fake_decode,
    id_col: str = "media_id",
    type_col: str = "media_type",
    content_col: str = "content",
) -> DataFrame:
    """Arrow-batched decode/feature-extract over a binary media column.

    ``mapInPandas`` keeps the blobs in Arrow buffers end-to-end (no
    per-row pickling); each batch yields one metadata frame with the blob
    column dropped — downstream plans never carry the bytes again.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, blob in zip(pdf[id_col], pdf[type_col], pdf[content_col]):
                blob_bytes = bytes(blob) if blob is not None else None
                d = decode_fn(blob_bytes, mtype)
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "n_bytes": d["n_bytes"],
                        "checksum": d["checksum"],
                        "width": d["width"],
                        "height": d["height"],
                        "features": d["features"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields])

    return fan_out(media.select(id_col, type_col, content_col)).mapInPandas(
        decode_batches, schema=MEDIA_FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 1024,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Frame-sampling shape: one row per sampled offset of each blob.

    For video this is where a real decoder would emit keyframes; the fake
    samples fixed byte offsets. Pure Spark: posexplode over an offset
    array computed from the blob length — no Python.
    """
    n = F.length(F.col(content_col))
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return media.select(
        F.col(id_col),
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("target_width", IntegerType(), False),
        StructField("target_height", IntegerType(), False),
        StructField("content", BinaryType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)


def fake_resize(content: bytes, media_type: str, w: int, h: int) -> bytes:
    """STUB resize — deterministic fake standing in for PIL.Image.resize.

    Emits a byte payload whose size scales with the target area (every
    w*h-th byte of the source, cycled), so tests can assert the
    shrink/grow plumbing without a codec. Swap in a real resampler with
    the same signature in production.
    """
    if content is None:
        return b""
    target_len = max(w * h // 64, 1)
    if not content:
        return b""
    return bytes(content[i % len(content)] for i in range(target_len))


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, str, int, int], bytes] = fake_resize,
    id_col: str = "media_id",
    type_col: str = "media_type",
    content_col: str = "content",
) -> DataFrame:
    """Arrow-batched resize over a binary media column (mapInPandas).

    Same plumbing contract as ``extract_media_features``: blobs stay in
    Arrow buffers, one output row per input row, resized payload replaces
    the original so downstream stages shuffle the SMALL representation
    (at 100 TB the whole point of early resize is shrinking the bytes
    before the first exchange).
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, blob in zip(pdf[id_col], pdf[type_col], pdf[content_col]):
                blob_bytes = bytes(blob) if blob is not None else None
                out = resize_fn(blob_bytes, mtype, width, height)
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "target_width": width,
                        "target_height": height,
                        "content": out,
                        "n_bytes": len(out),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return fan_out(media.select(id_col, type_col, content_col)).mapInPandas(
        resize_batches, schema=RESIZED_SCHEMA
    )


def synthetic_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture (text bytes as blob).

    Lets the multimodal plumbing be exercised on the driver's tables
    without binary fixtures: blob = utf-8 bytes of the text.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )
