"""Versioned tables (sources/versioned.py): time travel, rollback,
vacuum, and crash invisibility."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_repo_spark.sources.catalog import Catalog
from dbt_repo_spark.sources.versioned import VersionedTable


@pytest.fixture()
def vt(spark, tmp_path):
    return VersionedTable(Catalog(spark, str(tmp_path / "wh")), "analytics", "t")


def test_time_travel_reads_each_committed_state(spark, vt):
    assert vt.latest_version() is None
    v1 = vt.commit(spark.range(3), "first")
    v2 = vt.commit(spark.range(10), "second")
    assert (v1, v2) == (1, 2)
    assert vt.read().count() == 10
    assert vt.read(version=1).count() == 3
    assert vt.read(version=2).count() == 10
    with pytest.raises(ValueError, match="never committed"):
        vt.read(version=99)


def test_rollback_is_nondestructive_and_audited(spark, vt):
    vt.commit(spark.range(3))
    vt.commit(spark.range(10))
    vt.rollback(1, "bad load")
    assert vt.latest_version() == 1
    assert vt.read().count() == 3
    assert vt.read(version=2).count() == 10  # still readable
    actions = [(e["action"], e["version"]) for e in vt.history()]
    assert actions == [("commit", 1), ("commit", 2), ("rollback", 1)]
    # a new commit after rollback continues the version sequence
    assert vt.commit(spark.range(5)) == 3
    assert vt.read().count() == 5


def test_vacuum_keeps_recent_and_latest(spark, vt):
    for n in (2, 4, 6, 8):
        vt.commit(spark.range(n))
    vt.rollback(1)  # latest is now the OLDEST version
    removed = vt.vacuum(keep_last=2)
    assert removed == [2]  # v3, v4 kept (recent); v1 kept (latest)
    assert vt.read().count() == 2
    assert vt.read(version=4).count() == 8
    with pytest.raises(ValueError, match="vacuumed"):
        vt.read(version=2)
    with pytest.raises(ValueError, match="vacuumed"):
        vt.rollback(2)


def test_crashed_commit_is_invisible_then_vacuumed(spark, vt):
    vt.commit(spark.range(3))
    # simulate a crash between the data write and the log replace:
    # the orphan directory exists but no log entry names it
    spark.range(99).write.parquet(os.path.join(vt.root, "v=2"))
    assert vt.latest_version() == 1
    assert vt.read().count() == 3
    with pytest.raises(ValueError, match="never committed"):
        vt.read(version=2)
    # the next commit does not collide with the orphan
    v = vt.commit(spark.range(7))
    assert v == 2  # log-derived numbering; overwrite replaces the orphan
    assert vt.read().count() == 7


def test_versioned_table_materialization_in_runner(spark, tmp_path):
    from dbt_repo_spark.plans.runner import ModelRunner, model

    holder = {"n": 3}

    @model("vt_model", deps=("src",), materialized="versioned_table")
    def vt_model(ctx):
        return ctx["src"].limit(holder["n"])

    cat = Catalog(spark, str(tmp_path / "wh"))
    src = spark.range(100).withColumnRenamed("id", "x")
    runner = ModelRunner(spark, cat, {"src": src}).add(vt_model)
    assert runner.run()["vt_model"].count() == 3
    holder["n"] = 7
    assert runner.run()["vt_model"].count() == 7
    vt = VersionedTable(cat, "analytics", "vt_model")
    assert vt.latest_version() == 2
    assert vt.read(version=1).count() == 3  # prior run still readable
    vt.rollback(1)
    assert vt.read().count() == 3
