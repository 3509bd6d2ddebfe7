"""Training-dataset export: split, shard, write, and MANIFEST — the
deliverable end of the cleaning/sampling pipelines.

A 100 TB training corpus ships as split directories of fixed-count
shards plus a manifest the consumer can verify: row counts and an
ORDER-INDEPENDENT content checksum per (split, shard). The checksum is
a sum of per-row 64-bit hashes folded in Spark (commutative — partition
order, shard file order, and task retries cannot change it), so
re-reading the exported files and recomputing the manifest is a full
integrity check that costs one scan, no sort.

Everything is content-addressed and deterministic (sampling.py rules):
split assignment is the md5-nibble `hash_split`, shard assignment is
`pmod(xxhash64(id), shards_per_split)` — a re-export of identical data
is byte-stable at the manifest level regardless of cluster layout.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_repo_spark.operators.sampling import hash_split


def _row_digest(cols: list[str]) -> F.Column:
    """64-bit per-row content hash over the named columns (null-safe:
    nulls serialize as a sentinel distinct from empty string)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols
    ]
    return F.xxhash64(*parts)


def export_dataset(
    df: DataFrame,
    path: str,
    id_col: str,
    splits: dict[str, int] | None = None,
    shards_per_split: int = 4,
) -> dict:
    """Write ``df`` as ``path/<split>/shard=N/*.parquet`` plus
    ``path/manifest.json``; returns the manifest dict.

    Manifest entries per (split, shard): ``rows`` and ``content_sum``
    (the commutative row-hash fold). One extra aggregate job computes
    every entry in a single pass BEFORE the write; the write itself is
    one partitioned sink per split (repartition on shard → one file per
    shard directory). ``verify_export`` re-reads and recomputes.
    """
    data_cols = sorted(c for c in df.columns)
    tagged = hash_split(df, id_col, splits).withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col).cast("string")), shards_per_split)
    )
    stats = (
        tagged.groupBy("split", "shard")
        .agg(
            F.count("*").alias("rows"),
            F.sum(_row_digest(data_cols)).alias("content_sum"),
        )
        .collect()
    )
    manifest = {
        "columns": data_cols,
        "shards_per_split": shards_per_split,
        "entries": {
            f"{r.split}/shard={r.shard}": {
                "rows": r.rows,
                "content_sum": int(r.content_sum),
            }
            for r in stats
        },
    }
    for split in {r.split for r in stats}:
        (
            tagged.filter(F.col("split") == split)
            .drop("split")
            .repartition(shards_per_split, "shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(os.path.join(path, split))
        )
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_export(spark, path: str) -> dict:
    """Integrity check: re-read every exported split, recompute the
    per-shard row counts and content sums, and diff against the
    manifest. Returns {"ok": bool, "mismatches": [...]} — one scan per
    split, no sort, no collect of data rows."""
    with open(os.path.join(path, "manifest.json")) as fh:
        manifest = json.load(fh)
    cols = manifest["columns"]
    mismatches = []
    seen = set()
    for split in sorted({k.split("/")[0] for k in manifest["entries"]}):
        got = (
            spark.read.parquet(os.path.join(path, split))
            .groupBy("shard")
            .agg(
                F.count("*").alias("rows"),
                F.sum(_row_digest(cols)).alias("content_sum"),
            )
            .collect()
        )
        for r in got:
            key = f"{split}/shard={r.shard}"
            seen.add(key)
            want = manifest["entries"].get(key)
            if want is None or want["rows"] != r.rows or want["content_sum"] != int(
                r.content_sum
            ):
                mismatches.append(key)
    missing = sorted(set(manifest["entries"]) - seen)
    return {"ok": not mismatches and not missing,
            "mismatches": sorted(mismatches) + missing}
