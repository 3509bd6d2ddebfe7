"""Unit properties of the round-3 continuation operators: Pareto
frontier, run-length collapse, group-mean imputation, triangle census,
co-occurrence lift, and the count-min sketch family. Oracle parity for
the registry twins runs in test_oracle_parity; these pin the semantic
invariants the SQL comparison alone would not surface (dominance
definition edge cases, sketch guarantees, orientation correctness on
known graphs).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from dbt_repo_spark.operators.graph import triangle_stats
from dbt_repo_spark.operators.relational import (
    collapse_runs,
    impute_group_mean,
    pareto_frontier,
)
from dbt_repo_spark.operators.sketches import countmin_estimate, countmin_table


# ---------------------------------------------------------------- pareto


def _pts(spark, rows):
    return spark.createDataFrame(rows, "grp string, id long, x long, y double")


def _brute_frontier(rows):
    out = set()
    for g, i, x, y in rows:
        dominated = any(
            pg == g
            and px >= x
            and py >= y
            and (px > x or py > y)
            for pg, _, px, py in rows
        )
        if not dominated:
            out.add(i)
    return out


def test_pareto_frontier_matches_brute_force_with_ties(spark):
    rows = [
        ("a", 1, 10, 1.0),
        ("a", 2, 10, 2.0),   # dominates 1 (same x, higher y)
        ("a", 3, 5, 3.0),
        ("a", 4, 12, 0.5),
        ("a", 5, 12, 0.5),   # exact duplicate of 4 -> both kept
        ("a", 6, 3, 3.0),    # dominated by 3 (same y, lower x)
        ("b", 7, 1, 1.0),    # other partition: alone -> kept
    ]
    got = {
        r["id"]
        for r in pareto_frontier(_pts(spark, rows), "x", "y", ["grp"]).collect()
    }
    assert got == _brute_frontier(rows) == {2, 3, 4, 5, 7}


def test_pareto_frontier_random_matches_brute_force(spark):
    # deterministic pseudo-random grid with many x-ties
    rows = [
        ("g", i, (i * 7919) % 13, float((i * 104729) % 17))
        for i in range(120)
    ]
    got = {
        r["id"]
        for r in pareto_frontier(_pts(spark, rows), "x", "y", ["grp"]).collect()
    }
    assert got == _brute_frontier(rows)


# ------------------------------------------------------------- collapse


def test_collapse_runs_compresses_and_preserves_counts(spark):
    rows = [
        (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"),
        (2, 1, None), (2, 2, None), (2, 3, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, state string")
    out = collapse_runs(df, ["k"], ["seq"], "state").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    # k=1: runs a(2), b(1), a(1) — the repeated state re-opens a new run
    k1 = sorted(by_key[1], key=lambda r: r["run_id"])
    assert [(r["state"], r["n_rows"]) for r in k1] == [("a", 2), ("b", 1), ("a", 1)]
    assert (k1[0]["run_start"], k1[0]["run_end"]) == (1, 2)
    # k=2: the NULL run collapses too (null-safe compare)
    k2 = sorted(by_key[2], key=lambda r: r["run_id"])
    assert [(r["state"], r["n_rows"]) for r in k2] == [(None, 2), ("x", 1)]
    # compression is lossless on row counts
    assert sum(r["n_rows"] for r in out) == len(rows)


# -------------------------------------------------------------- impute


def test_impute_group_mean_fills_only_nulls_exactly(spark):
    rows = [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = impute_group_mean(df, "v", ["g"]).collect()
    a = [r for r in out if r["g"] == "a"]
    assert {r["v_imputed"] for r in a} == {1.0, 2.0, 3.0}
    assert [r["was_imputed"] for r in a if r["v"] is None] == [True]
    # a group with no non-NULL values stays NULL and is NOT flagged
    b = [r for r in out if r["g"] == "b"][0]
    assert b["v_imputed"] is None and b["was_imputed"] is False


# ------------------------------------------------------------ triangles


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return triangle_stats(df).collect()[0]


def test_triangle_stats_known_graphs(spark):
    # K4: 4 nodes, 6 edges, 4 triangles, wedges = 4*C(3,2)=12, coeff 1.0
    k4 = _tri(spark, list(itertools.combinations(range(4), 2)))
    assert (k4["n_nodes"], k4["n_edges"], k4["n_wedges"], k4["n_triangles"]) == (
        4, 6, 12, 4,
    )
    assert k4["clustering_coeff"] == 1.0
    # path graph: no triangles; duplicate/reversed/self edges are cleaned
    path = _tri(spark, [(1, 2), (2, 3), (3, 2), (2, 2), (3, 4), (1, 2)])
    assert (path["n_edges"], path["n_triangles"]) == (3, 0)
    # star K1,5: wedges C(5,2)=10, no triangles — the hub orients INTO
    # itself being highest-degree, so it generates zero wedge rows
    star = _tri(spark, [(0, i) for i in range(1, 6)])
    assert (star["n_wedges"], star["n_triangles"]) == (10, 0)


# ------------------------------------------------------------ count-min


def test_countmin_never_underestimates_and_is_exact_when_sparse(spark):
    rows = [(k,) for k in ["a"] * 40 + ["b"] * 7 + ["c"] * 1]
    df = spark.createDataFrame(rows, "k string")
    sketch = countmin_table(df, "k", depth=4, width=256)
    probes = df.groupBy("k").agg(F.count("*").alias("exact"))
    est = {r["k"]: (r["exact"], r["cm_est"]) for r in
           countmin_estimate(sketch, probes, "k").collect()}
    for k, (exact, cm) in est.items():
        assert cm >= exact, f"count-min underestimated {k}"
    # 3 keys into 4x256 counters: collisions are impossible per row,
    # so estimates are exact here
    assert all(cm == exact for exact, cm in est.values())


def test_countmin_inner_product_depth_prefix(spark):
    """countmin_inner_product(depth=k) uses exactly the first k hash
    rows of BOTH sketches: merging a depth-8 sketch with a depth-4 one
    at depth=4 equals the depth-4×depth-4 estimate (the common-prefix
    contract — depth is validated, not ignored)."""
    from dbt_repo_spark.operators.sketches import countmin_inner_product

    a = spark.createDataFrame([(k,) for k in ["a"] * 9 + ["b"] * 3], "k string")
    b = spark.createDataFrame([(k,) for k in ["a"] * 5 + ["c"] * 2], "k string")
    ska8 = countmin_table(a, "k", depth=8, width=64)
    ska4 = countmin_table(a, "k", depth=4, width=64)
    skb4 = countmin_table(b, "k", depth=4, width=64)
    [mixed] = countmin_inner_product(ska8, skb4, depth=4).collect()
    [clean] = countmin_inner_product(ska4, skb4, depth=4).collect()
    assert mixed["cm_join_size_est"] == clean["cm_join_size_est"]
    # and the estimate keeps the one-sided guarantee: >= exact 9*5
    assert mixed["cm_join_size_est"] >= 45


def test_countmin_absent_key_estimates_zero_when_empty_buckets(spark):
    df = spark.createDataFrame([("x",)], "k string")
    sketch = countmin_table(df, "k", depth=4, width=256)
    probes = spark.createDataFrame([("never-seen",)], "k string")
    [row] = countmin_estimate(sketch, probes, "k").collect()
    # with one stored key, an absent probe collides in all 4 rows with
    # probability ~ (1/256)^4 — i.e. the estimate is 0
    assert row["cm_est"] == 0


def test_countmin_merges_across_periods(spark):
    import datetime

    rows = [("u", datetime.datetime(2024, 1, d, 12)) for d in (1, 2, 3)]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    sketch = countmin_table(df, "k", time_col="ts")  # 3 period rows
    assert sketch.select("period").distinct().count() == 3
    probes = spark.createDataFrame([("u",)], "k string")
    [row] = countmin_estimate(sketch, probes, "k").collect()
    assert row["cm_est"] == 3  # cell-wise sum across periods


# ------------------------------------------------------- max concurrency


def test_max_concurrency_half_open_boundaries(spark):
    rows = [
        ("k", 0, 10), ("k", 10, 20),   # touching: never concurrent
        ("k", 15, 25), ("k", 16, 17),  # 3-way overlap in [16,17)
        ("q", 0, 100),
    ]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    from dbt_repo_spark.operators.timeseries import max_concurrency

    out = {r["g"]: r["max_concurrent"] for r in
           max_concurrency(df, ["g"], "s", "e").collect()}
    assert out == {"k": 3, "q": 1}


# ------------------------------------------------------------------ ewma


def test_ewma_matches_pandas_ewm_bitwise(spark):
    """ewma_recursive ≡ pandas ewm(adjust=False).mean() bit-for-bit —
    an independent implementation of the same recurrence — on unsorted
    multi-key input with a non-binary-exact alpha."""
    import datetime

    import pandas as pd

    from dbt_repo_spark.operators.timeseries import ewma_recursive

    rows = []
    for k, vals in [("a", [10.0, 2.0, 7.0, 7.0, 0.5]), ("b", [3.25]),
                    ("c", [1e12, -1e12, 5.0, 0.125])]:
        for i, v in enumerate(vals):
            rows.append((k, datetime.datetime(2024, 1, 1 + i), v))
    rows.reverse()  # operator must sort within each series itself
    df = spark.createDataFrame(rows, "k string, o timestamp, x double")
    got = {
        (r["k"], r["o"]): r["ewma"]
        for r in ewma_recursive(df, "k", "o", "x", alpha=0.25).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "o", "x"]).sort_values(["k", "o"])
    for k, g in pdf.groupby("k"):
        want = g["x"].ewm(alpha=0.25, adjust=False).mean()
        for o, w in zip(g["o"], want):
            assert got[(k, pd.Timestamp(o).to_pydatetime())] == w, (k, o)


def test_ols_cramer_matches_numpy_lstsq(spark):
    """The integer-exact Cramer solve agrees with numpy's least-squares
    solver on the real fixture data (rtol bounded by the conditioning of
    the normal equations, not by the engine)."""
    import numpy as np

    from dbt_repo_spark.queries import QUERIES, t

    got = {
        r["l_returnflag"]: (r["b_intercept"], r["b_qty"], r["b_disc"])
        for r in QUERIES["ols_multifeature_cramer"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    pdf = (
        t(spark, "/root/testdata/sf0.001", "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    for flag, g in pdf.groupby("l_returnflag"):
        x1 = g["l_quantity"].to_numpy(dtype="float64")
        x2 = np.round(g["l_discount"].to_numpy(dtype="float64") * 100)
        y = np.round(g["l_extendedprice"].to_numpy(dtype="float64") * 100)
        A = np.column_stack([np.ones_like(x1), x1, x2])
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        np.testing.assert_allclose(got[flag], beta, rtol=1e-7)


def test_holt_constant_and_ramp_series(spark):
    """Holt invariants: a constant series is a fixed point (level == c,
    trend == 0, forecast == c exactly); on an exact linear ramp the
    trend estimate converges toward the true slope."""
    import datetime

    from dbt_repo_spark.operators.timeseries import holt_recursive

    rows = []
    for i in range(20):
        rows.append(("const", datetime.datetime(2024, 1, 1 + i), 42.0))
        rows.append(("ramp", datetime.datetime(2024, 1, 1 + i), 10.0 + 3.0 * i))
    df = spark.createDataFrame(rows, "k string, o timestamp, x double")
    out = holt_recursive(df, "k", "o", "x").collect()
    const = sorted([r for r in out if r["k"] == "const"], key=lambda r: r["o"])
    assert all(r["level"] == 42.0 and r["trend"] == 0.0 for r in const)
    assert const[0]["forecast"] is None
    assert all(r["forecast"] == 42.0 for r in const[1:])
    ramp = sorted([r for r in out if r["k"] == "ramp"], key=lambda r: r["o"])
    errs = [abs(r["trend"] - 3.0) for r in ramp]
    # geometric convergence from the b_0 = 0 start: ~7% error left after
    # 20 steps at α=0.25, γ=0.5 (relative to the slope 3.0)
    assert errs[-1] < 0.25 and errs[-1] < errs[3] / 4
    # one-step forecast beats the naive lag-1 forecast once warmed up
    naive_err = abs((10.0 + 3.0 * 18) - (10.0 + 3.0 * 19))
    assert abs(ramp[-1]["forecast"] - (10.0 + 3.0 * 19)) < naive_err
