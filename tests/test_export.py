"""Dataset export + manifest verification: determinism, integrity
detection, split/shard stability."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dbt_repo_spark.sources.export import export_dataset, verify_export


def _corpus(spark, n=300):
    return spark.range(1, n + 1).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_export_roundtrip_and_verify(spark, tmp_path):
    path = str(tmp_path / "ds")
    man = export_dataset(_corpus(spark), path, "doc_id", shards_per_split=3)
    # every split/shard accounted; totals match the corpus
    assert sum(e["rows"] for e in man["entries"].values()) == 300
    assert {k.split("/")[0] for k in man["entries"]} == {"train", "val", "test"}
    res = verify_export(spark, path)
    assert res["ok"], res


def test_export_manifest_deterministic(spark, tmp_path):
    m1 = export_dataset(_corpus(spark), str(tmp_path / "a"), "doc_id")
    m2 = export_dataset(_corpus(spark), str(tmp_path / "b"), "doc_id")
    assert m1["entries"] == m2["entries"]  # content-addressed, layout-free


def test_export_verify_detects_tamper(spark, tmp_path):
    path = str(tmp_path / "ds")
    export_dataset(_corpus(spark), path, "doc_id", shards_per_split=2)
    # tamper: corrupt one manifest entry
    mp = f"{path}/manifest.json"
    man = json.load(open(mp))
    key = sorted(man["entries"])[0]
    man["entries"][key]["content_sum"] += 1
    json.dump(man, open(mp, "w"))
    res = verify_export(spark, path)
    assert not res["ok"] and key in res["mismatches"]
