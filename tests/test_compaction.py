"""Small-file compaction: many micro-batch appends → few files, same data."""

from __future__ import annotations

import os

import pytest

# r13 (r12 verdict ask #2): many-micro-batch append/compaction file-IO
# stress — the layout/compaction slow class. Deselected by default
# (pytest.ini addopts); run with `-m ""` to include.
pytestmark = pytest.mark.slow

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


def test_delete_where_partition_scoped(spark, tmp_path):
    """DELETE rewrites only partitions containing matches: untouched
    partition files keep their inodes; matching rows are gone."""
    import os

    from pyspark.sql import functions as F

    from dbt_repo_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).alias("p"),
        (F.col("id") * 10).alias("v"),
    )
    cat.write(df, "analytics", "mut", partition_by=["p"])

    def inodes(part):
        d = os.path.join(cat.path("analytics", "mut"), f"p={part}")
        return {
            f: os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if not f.startswith(".")
        }

    before_p3 = inodes(3)
    n = cat.delete_where(
        "analytics", "mut", (F.col("id") % 4 == 1) & (F.col("id") < 50),
        partition_by=["p"],
    )
    assert n == 13  # ids 1,5,...,49
    out = cat.read("analytics", "mut")
    assert out.count() == 87
    assert out.filter((F.col("id") % 4 == 1) & (F.col("id") < 50)).count() == 0
    # partition p=3 had no matches: same files, same inodes
    assert inodes(3) == before_p3
    # no-op delete returns 0 and changes nothing
    assert cat.delete_where("analytics", "mut", F.col("id") < 0, ["p"]) == 0


def test_update_where_partition_scoped(spark, tmp_path):
    """UPDATE rewrites matching rows in place, refuses partition-column
    assignments, and leaves non-matching partitions' files untouched."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from dbt_repo_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 2).alias("p"), F.lit("user@x.com").alias("email")
    )
    cat.write(df, "analytics", "mut2", partition_by=["p"])

    d0 = os.path.join(cat.path("analytics", "mut2"), "p=0")
    before = {f: os.stat(os.path.join(d0, f)).st_ino for f in os.listdir(d0)
              if not f.startswith(".")}

    n = cat.update_where(
        "analytics", "mut2",
        (F.col("p") == 1) & (F.col("id") < 20),
        {"email": F.lit("[redacted]")},
        partition_by=["p"],
    )
    assert n == 10
    out = cat.read("analytics", "mut2")
    assert out.filter(F.col("email") == "[redacted]").count() == 10
    assert out.count() == 40
    after = {f: os.stat(os.path.join(d0, f)).st_ino for f in os.listdir(d0)
             if not f.startswith(".")}
    assert after == before  # p=0 untouched

    with _pytest.raises(ValueError):
        cat.update_where("analytics", "mut2", F.col("id") < 5,
                         {"p": F.lit(9)}, partition_by=["p"])


def test_zero_copy_clone_is_linked_and_independent(spark, tmp_path):
    """dbt clone analog: hardlinked clone shares bytes (st_nlink==2),
    reads identically, and an overwrite of the clone leaves the source
    untouched (immutable files + staged replace)."""
    import os

    from dbt_repo_spark.sources.catalog import Catalog

    prod = Catalog(spark, str(tmp_path / "prod"))
    dev = Catalog(spark, str(tmp_path / "dev"))
    df = spark.range(100).withColumnRenamed("id", "x")
    prod.write(df, "analytics", "t")
    prod.clone_table("analytics", "t", dev)
    assert dev.read("analytics", "t").count() == 100
    # zero-copy: every data file shares its inode with the source
    ddir = dev.path("analytics", "t")
    data = [f for f in os.listdir(ddir) if f.endswith(".parquet") or f.startswith("part-")]
    assert data and all(os.stat(os.path.join(ddir, f)).st_nlink >= 2 for f in data)
    # clone diverges without touching prod
    dev.write(spark.range(5).withColumnRenamed("id", "x"), "analytics", "t")
    assert dev.read("analytics", "t").count() == 5
    assert prod.read("analytics", "t").count() == 100
