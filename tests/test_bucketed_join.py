"""Bucketed co-located join: the fact-fact scale path.

Writing both sides bucketed on the join key must produce a sort-merge join
with NO Exchange (shuffle) on either side — the shuffle was paid once at
write time. This is a plan-shape assertion, the property that matters at
100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_repo_spark.sources.catalog import Catalog


@pytest.fixture()
def bucketed_catalog(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cat.write_bucketed(orders, "analytics", "orders_b", "o_orderkey", 8)
    cat.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "analytics",
        "lineitem_b",
        "o_orderkey",
        8,
    )
    yield cat
    spark.sql("DROP TABLE IF EXISTS analytics_orders_b")
    spark.sql("DROP TABLE IF EXISTS analytics_lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_catalog):
    o = bucketed_catalog.read_table("analytics", "orders_b")
    l = bucketed_catalog.read_table("analytics", "lineitem_b")
    # force SMJ path so the assertion is about bucketing, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(l, "o_orderkey").groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]  # below the agg
        assert "SortMergeJoin" in plan
        # no shuffle between the scans and the join
        assert "Exchange hashpartitioning" not in join_section
        # result correctness unchanged
        rows = {r.o_orderstatus: r["count"] for r in joined.collect()}
        expect = {
            r.o_orderstatus: r["count"]
            for r in spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            .join(
                spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
                .withColumnRenamed("l_orderkey", "o_orderkey"),
                "o_orderkey",
            )
            .groupBy("o_orderstatus")
            .count()
            .collect()
        }
        assert rows == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_single_table_agg_avoids_shuffle(spark, bucketed_catalog):
    """groupBy on the bucket key reuses the bucketed layout (no exchange)."""
    l = bucketed_catalog.read_table("analytics", "lineitem_b")
    agg = l.groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_analyze_records_stats_for_cbo(spark, bucketed_catalog):
    """ANALYZE TABLE fills the catalog stats slot (exact rowCount, size,
    per-column NDV/min/max) and, with CBO on, the optimizer carries a
    row-count estimate instead of a file-size guess."""
    cat = bucketed_catalog
    n = cat.read_table("analytics", "orders_b").count()
    stats = cat.analyze("analytics", "orders_b", ["o_orderkey", "o_totalprice"])
    assert stats["rowCount"] == n
    assert stats["sizeInBytes"] and stats["sizeInBytes"] > 0

    col = {
        r.info_name: r.info_value
        for r in spark.sql(
            "DESCRIBE TABLE EXTENDED analytics_orders_b o_orderkey"
        ).collect()
    }
    assert int(col["distinct_count"]) > 0
    assert col["min"] is not None and col["max"] is not None

    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        q = spark.table("analytics_orders_b").filter("o_totalprice < 1000")
        row_count = (
            q._jdf.queryExecution().optimizedPlan().stats().rowCount().toString()
        )
        assert row_count.startswith("Some(")  # estimate present, not None
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
