"""Materialized aggregate views (plans/mv.py): rollup-reuse rewrite must
be BIT-IDENTICAL to the direct base aggregate, refuse underivable
queries, and reflect refreshes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_repo_spark.plans.mv import AggMV, Measure, answer_or_base
from dbt_repo_spark.sources.catalog import Catalog


@pytest.fixture()
def base(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(
            "o_orderstatus",
            "o_orderpriority",
            F.col("o_totalprice").cast("decimal(14,2)").alias("price"),
        )
    )


@pytest.fixture()
def mv():
    return AggMV(
        name="mv_orders_rollup",
        keys=("o_orderstatus", "o_orderpriority"),
        measures={
            "sum_price": Measure("sum", "price"),
            "n": Measure("count"),
            "min_price": Measure("min", "price"),
            "max_price": Measure("max", "price"),
        },
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_coarser_rollup_bit_identical_to_base(spark, tmp_path, base, mv):
    cat = Catalog(spark, str(tmp_path / "wh"))
    mv.build(base, cat)
    want = {
        "total": ("sum", "price"),
        "orders": ("count", None),
        "cheapest": ("min", "price"),
        "priciest": ("max", "price"),
    }
    got, path = answer_or_base([mv], cat, base, ["o_orderstatus"], want)
    assert path == "mv:mv_orders_rollup"
    direct, path2 = answer_or_base([], cat, base, ["o_orderstatus"], want)
    assert path2 == "base"
    assert _rows(got) == _rows(direct)  # exact decimal fold both paths


def test_global_aggregate_from_mv(spark, tmp_path, base, mv):
    cat = Catalog(spark, str(tmp_path / "wh"))
    mv.build(base, cat)
    got, path = answer_or_base([mv], cat, base, [], {"total": ("sum", "price")})
    assert path.startswith("mv:")
    direct = base.agg(F.sum("price").alias("total"))
    assert _rows(got) == _rows(direct)


def test_avg_derives_from_sum_and_count(spark, tmp_path, base, mv):
    cat = Catalog(spark, str(tmp_path / "wh"))
    mv.build(base, cat)
    got, path = answer_or_base(
        [mv], cat, base, ["o_orderpriority"], {"mean_price": ("avg", "price")}
    )
    assert path.startswith("mv:")
    direct, _ = answer_or_base(
        [], cat, base, ["o_orderpriority"], {"mean_price": ("avg", "price")}
    )
    assert _rows(got) == _rows(direct)


def test_underivable_queries_fall_back_to_base(spark, tmp_path, base, mv):
    cat = Catalog(spark, str(tmp_path / "wh"))
    mv.build(base, cat)
    # key outside the MV key set
    _, path = answer_or_base(
        [mv], cat, base, ["o_orderstatus", "price"], {"n": ("count", None)}
    )
    assert path == "base"
    # measure the MV does not carry
    assert not mv.can_answer(["o_orderstatus"], {"m": ("sum", "missing_col")})
    # unsupported aggregate fn
    assert not mv.can_answer(["o_orderstatus"], {"m": ("median", "price")})


def test_refresh_reflects_new_data(spark, tmp_path, base, mv):
    cat = Catalog(spark, str(tmp_path / "wh"))
    mv.build(base.filter(F.col("o_orderstatus") == "F"), cat)
    got, _ = answer_or_base([mv], cat, base, [], {"n": ("count", None)})
    stale = got.collect()[0].n
    mv.refresh(base, cat)
    got2, _ = answer_or_base([mv], cat, base, [], {"n": ("count", None)})
    assert got2.collect()[0].n == base.count() > stale


def test_invalid_measure_definitions_rejected():
    with pytest.raises(ValueError, match="unsupported"):
        Measure("median", "x")
    with pytest.raises(ValueError, match="source column"):
        Measure("sum")


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path, base, mv):
    cat = Catalog(spark, str(tmp_path / "wh"))
    first = base.limit(900)
    rest = base.subtract(first)
    mv.build(first, cat)
    mv.refresh_incremental(rest, cat)
    got = cat.read(mv.layer, mv.name)

    cat2 = Catalog(spark, str(tmp_path / "wh2"))
    mv.build(base, cat2)
    full = cat2.read(mv.layer, mv.name)
    assert _rows(got.select(sorted(got.columns))) == _rows(
        full.select(sorted(full.columns))
    )


# ---- governance: column masking (plans/governance.py) ----------------


def test_mask_columns_strategies_and_roles(spark):
    import pytest as _pytest

    from dbt_repo_spark.plans.governance import mask_columns

    df = spark.createDataFrame(
        [(1, "Alice", 4216.50, "4111222233334444")],
        "id bigint, name string, bal double, card string",
    )
    pol = {"id": "hash", "name": "redact", "bal": "null", "card": "partial:4"}
    row = mask_columns(df, pol).collect()[0]
    assert len(row.id) == 32 and row.name == "***" and row.bal is None
    assert row.card == "***4444"
    # schema stable: null strategy keeps the column's own type
    assert dict(mask_columns(df, pol).dtypes)["bal"] == "double"
    # exempt role reads clear
    clear = mask_columns(df, pol, role="admin").collect()[0]
    assert clear.name == "Alice" and clear.bal == 4216.50
    # typo'd column / strategy fail loudly
    with _pytest.raises(ValueError, match="unknown columns"):
        mask_columns(df, {"ghost": "hash"})
    with _pytest.raises(ValueError, match="unknown mask strategy"):
        mask_columns(df, {"name": "rot13"})
