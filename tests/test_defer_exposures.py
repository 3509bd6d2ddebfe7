"""dbt --defer (refs resolve from a production catalog) and exposures
(declared downstream consumers, ``exposure:`` selector) — the Slim-CI
partners of state:modified."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_repo_spark.plans.runner import Exposure, ModelRunner, model
from dbt_repo_spark.sources.catalog import Catalog


def _models():
    @model("a", deps=("src",), materialized="table")
    def a(ctx):
        return ctx["src"]

    @model("b", deps=("a",), materialized="table")
    def b(ctx):
        return ctx["a"].withColumn("x2", F.col("x") * 2)

    @model("c", deps=("b",), materialized="table")
    def c(ctx):
        return ctx["b"].withColumn("x4", F.col("x2") * 2)

    return a, b, c


def _runner(spark, root, n=5):
    a, b, c = _models()
    cat = Catalog(spark, str(root))
    src = spark.range(n).withColumnRenamed("id", "x")
    return ModelRunner(spark, cat, {"src": src}).add(a, b, c), cat


def test_defer_reads_unselected_dep_from_prod(spark, tmp_path):
    # prod builds the full chain; a has 5 rows there
    prod, prod_cat = _runner(spark, tmp_path / "prod", n=5)
    prod.run()
    # dev selects only b, deferring to prod — a must NOT build in dev
    # (dev's src would give it 3 rows; prod's a has 5)
    dev, dev_cat = _runner(spark, tmp_path / "dev", n=3)
    built = dev.run(["b"], defer_to=prod_cat)
    assert set(built) == {"b"}
    assert built["b"].count() == 5  # read prod's a, not dev's src
    assert not dev_cat.exists("analytics", "a")
    assert dev_cat.exists("analytics", "b")


def test_defer_favors_locally_selected_models(spark, tmp_path):
    prod, prod_cat = _runner(spark, tmp_path / "prod", n=5)
    prod.run()
    dev, _ = _runner(spark, tmp_path / "dev", n=3)
    # a is selected too -> builds locally from dev's src despite defer
    built = dev.run(["a", "b"], defer_to=prod_cat)
    assert set(built) == {"a", "b"}
    assert built["b"].count() == 3


def test_defer_falls_back_when_prod_lacks_the_model(spark, tmp_path):
    prod, prod_cat = _runner(spark, tmp_path / "prod", n=5)
    prod.run(["a"])  # prod has ONLY a
    dev, _ = _runner(spark, tmp_path / "dev", n=3)
    built = dev.run(["c"], defer_to=prod_cat)
    # b absent from prod -> built locally (reading prod's a); c local
    assert set(built) == {"b", "c"}
    assert built["c"].count() == 5


def test_exposure_selector_builds_upstream_closure(spark, tmp_path):
    r, _ = _runner(spark, tmp_path / "wh")
    r.add_exposure(
        Exposure("weekly_dash", depends_on=("c",), kind="dashboard", owner="bi")
    )
    built = r.run(["exposure:weekly_dash"])
    assert set(built) == {"a", "b", "c"}


def test_exposure_unknown_name_raises(spark, tmp_path):
    r, _ = _runner(spark, tmp_path / "wh")
    with pytest.raises(ValueError, match="unknown exposure"):
        r.run(["exposure:nope"])


def test_exposure_with_unknown_dep_rejected(spark, tmp_path):
    r, _ = _runner(spark, tmp_path / "wh")
    with pytest.raises(ValueError, match="unknown model deps"):
        r.add_exposure(Exposure("bad", depends_on=("ghost",)))


def test_exposure_composes_with_defer(spark, tmp_path):
    # the Slim-CI shape end-to-end: prod is fully built; the exposure's
    # upstream resolves from prod except the one model being reworked
    prod, prod_cat = _runner(spark, tmp_path / "prod", n=5)
    prod.run()
    dev, _ = _runner(spark, tmp_path / "dev", n=3)
    dev.add_exposure(Exposure("dash", depends_on=("c",)))
    built = dev.run(["c"], defer_to=prod_cat)
    assert set(built) == {"c"}
    assert built["c"].count() == 5


def test_build_interleaves_tests_and_skips_downstream(spark, tmp_path):
    """dbt build semantics: a failing error-severity test on a model
    skips its consumers; siblings still build; warn doesn't block."""

    @model(
        "a_bad",
        deps=("src",),
        materialized="table",
        tests={"x": ["unique"]},  # src has duplicate x -> FAIL
    )
    def a_bad(ctx):
        return ctx["src"].unionByName(ctx["src"].limit(1))

    @model("b_child", deps=("a_bad",), materialized="table")
    def b_child(ctx):
        return ctx["a_bad"]

    @model("c_grandchild", deps=("b_child",), materialized="table")
    def c_grandchild(ctx):
        return ctx["b_child"]

    @model(
        "d_warn",
        deps=("src",),
        materialized="table",
        tests={"x": [{"unique": True, "config": {"severity": "warn"}}]},
    )
    def d_warn(ctx):
        return ctx["src"].unionByName(ctx["src"].limit(1))

    @model("e_sibling", deps=("src",), materialized="table")
    def e_sibling(ctx):
        return ctx["src"]

    cat = Catalog(spark, str(tmp_path / "wh"))
    src = spark.range(5).withColumnRenamed("id", "x")
    r = ModelRunner(spark, cat, {"src": src}).add(
        a_bad, b_child, c_grandchild, d_warn, e_sibling
    )
    built, status = r.build()
    assert status["a_bad"] == "fail"
    assert status["b_child"] == "skipped"
    assert status["c_grandchild"] == "skipped"
    assert status["d_warn"] == "ok"  # warn severity never blocks
    assert status["e_sibling"] == "ok"
    assert "b_child" not in built and "e_sibling" in built


def test_observed_run_collects_metrics_without_extra_scan(spark, tmp_path):
    """Spark Observation API: rows-built (and null-key) metrics arrive
    from the materializing job itself — dbt's rows-affected report."""

    @model("obs_t", deps=("src",), materialized="table")
    def obs_t(ctx):
        return ctx["src"].filter(F.col("x") < 7)

    @model(
        "obs_inc",
        deps=("src",),
        materialized="incremental",
        unique_key="x",
    )
    def obs_inc(ctx):
        return ctx["src"]

    cat = Catalog(spark, str(tmp_path / "wh"))
    src = spark.range(10).withColumnRenamed("id", "x")
    r = ModelRunner(spark, cat, {"src": src}).add(obs_t, obs_inc)
    built = r.run(observe=True)
    assert built["obs_t"].count() == 7
    assert r.last_run_metrics["obs_t"]["rows_built"] == 7
    assert r.last_run_metrics["obs_inc"] == {
        "rows_built": 10,
        "null_keys": 0,
    }
    # an un-observed run does not touch the last observed report; a new
    # OBSERVED run resets it first (no cross-run mixing)
    r.run(observe=False)
    assert r.last_run_metrics == {"obs_t": {"rows_built": 7},
                                  "obs_inc": {"rows_built": 10, "null_keys": 0}}
    r.run(["obs_t"], observe=True)
    assert set(r.last_run_metrics) == {"obs_t"}
