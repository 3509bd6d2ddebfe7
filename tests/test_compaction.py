"""Small-file compaction: many micro-batch appends → few files, same data."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from dbt_repo_spark.sources.catalog import Catalog


def _file_count(path: str) -> int:
    return sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.startswith("part-")
    )


def test_compact_partitioned_table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    # simulate 12 micro-batch appends across 2 date partitions
    for b in range(12):
        rows = [
            Row(d=f"2025-01-0{1 + (b % 2)}", station_id=f"st{i}", v=b * 10 + i)
            for i in range(5)
        ]
        cat.write(
            spark.createDataFrame(rows),
            "analytics",
            "status",
            mode="append",
            partition_by=["d"],
        )
    before = _file_count(cat.path("analytics", "status"))
    assert before >= 12  # at least one file per append
    total_before = cat.read("analytics", "status").count()
    checksum_before = (
        cat.read("analytics", "status").agg(F.sum("v").alias("s")).first().s
    )

    n_after = cat.compact(
        "analytics", "status", partition_by=["d"], sort_within_partitions=["station_id"]
    )
    assert n_after < before
    assert cat.read("analytics", "status").count() == total_before
    assert (
        cat.read("analytics", "status").agg(F.sum("v").alias("s")).first().s
        == checksum_before
    )
    # partitioned layout survived
    parts = [
        p
        for p in os.listdir(cat.path("analytics", "status"))
        if p.startswith("d=")
    ]
    assert len(parts) == 2


def test_compact_unpartitioned(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    for b in range(6):
        cat.write(
            spark.createDataFrame([Row(x=b)]), "analytics", "tiny", mode="append"
        )
    assert _file_count(cat.path("analytics", "tiny")) >= 6
    n = cat.compact("analytics", "tiny")
    assert n == 1
    assert cat.read("analytics", "tiny").count() == 6
