"""Unit cross-checks for operators/evalmetrics.py against brute-force
NumPy references on small seeded data — independent of the DuckDB
oracles (which exercise the same queries at fixture scale)."""

from __future__ import annotations

import numpy as np
import pytest

from dbt_repo_spark.operators.evalmetrics import (
    ks_two_sample,
    lift_by_decile,
    ordered_prefix_sums,
    roc_auc,
)


def _brute_auc(scores, labels):
    """Pair-counting AUC with half-credit ties — O(n^2) reference."""
    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    num = 0.0
    for p in pos:
        for n in neg:
            if p > n:
                num += 1.0
            elif p == n:
                num += 0.5
    return num / (len(pos) * len(neg))


def _brute_ks(a, b):
    """Max CDF distance evaluated at every observed value."""
    vals = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    best = 0.0
    for v in vals:
        fa = sum(1 for x in a if x <= v) / na
        fb = sum(1 for x in b if x <= v) / nb
        best = max(best, abs(fa - fb))
    return best


def test_roc_auc_matches_pair_counting(spark):
    rng = np.random.default_rng(7)
    scores = rng.integers(0, 40, size=200).astype(float)  # many ties
    labels = (scores + rng.normal(0, 10, size=200)) > 20
    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in zip(scores, labels)], ["s", "y"]
    )
    row = roc_auc(df, "s", "y").collect()[0]
    expected = _brute_auc(scores.tolist(), labels.tolist())
    assert row.n_pos == int(labels.sum())
    assert row.n_neg == int((~labels).sum())
    assert row.auc == pytest.approx(expected, abs=1e-12)
    # identity: auc_num / auc_den IS the auc
    assert row.auc == row.auc_num / row.auc_den


def test_ks_two_sample_matches_brute_force(spark):
    rng = np.random.default_rng(11)
    a = rng.normal(0, 1, 150).round(1)
    b = rng.normal(0.6, 1.2, 120).round(1)
    rows = [(float(v), True) for v in a] + [(float(v), False) for v in b]
    df = spark.createDataFrame(rows, ["v", "g"])
    row = ks_two_sample(df, "v", "g").collect()[0]
    assert row.n_a == 150 and row.n_b == 120
    assert row.d_stat == pytest.approx(_brute_ks(a.tolist(), b.tolist()), abs=1e-12)
    # at_value must be an observed value where the gap is attained
    fa = sum(1 for x in a if x <= row.at_value) / 150
    fb = sum(1 for x in b if x <= row.at_value) / 120
    assert abs(fa - fb) == pytest.approx(row.d_stat, abs=1e-12)


def test_ks_identical_samples_zero(spark):
    rows = [(float(v), bool(i % 2)) for i, v in enumerate([1, 1, 2, 2, 3, 3])]
    df = spark.createDataFrame(rows, ["v", "g"])
    row = ks_two_sample(df, "v", "g").collect()[0]
    assert row.d_stat == 0.0


def test_ordered_prefix_sums_equals_sorted_cumsum(spark):
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1000, 500)
    wts = rng.integers(1, 9, 500)
    df = spark.createDataFrame(
        [(int(v), int(w)) for v, w in zip(vals, wts)], ["v", "w"]
    ).groupBy("v").sum("w").withColumnRenamed("sum(w)", "w")
    out = ordered_prefix_sums(df, "v", ["w"], num_partitions=7)
    got = {r.v: (r.cum_w_before, r.total_w) for r in out.collect()}
    import collections

    agg = collections.defaultdict(int)
    for v, w in zip(vals, wts):
        agg[int(v)] += int(w)
    acc, total = 0, sum(agg.values())
    for v in sorted(agg):
        assert got[v] == (acc, total), f"at v={v}"
        acc += agg[v]


def test_ordered_prefix_sums_decimal_survives_past_bigint(spark):
    """sum_type='decimal(38,0)' carries cumulative sums exactly where a
    BIGINT accumulator would overflow: four rows of 2^62 put the last
    exclusive prefix (3·2^62) and the grand total (2^64) past the long
    range; every intermediate (per-partition sums, window prefix,
    offset literals, output columns) must ride the decimal type."""
    big = 1 << 62
    df = spark.createDataFrame([(i, big) for i in range(4)], "v long, w long")
    out = ordered_prefix_sums(
        df, "v", ["w"], num_partitions=2, sum_type="decimal(38,0)"
    )
    rows = {r.v: int(r.cum_w_before) for r in out.collect()}
    assert rows == {0: 0, 1: big, 2: 2 * big, 3: 3 * big}
    assert int(out.select("total_w").first()[0]) == 4 * big
    assert dict(out.dtypes)["cum_w_before"] == "decimal(38,0)"


def test_ordered_prefix_sums_decimal_offsets_past_1e20(spark):
    """Offset literals must use the FULL decimal(38,0) range: a Python
    Decimal literal infers DecimalType(38,18) (integer part capped at
    ~1e20) before any cast, so accumulated offsets >= 1e20 used to fail
    at literal creation. Four rows of 10^25 drive the last partition's
    offset to 3*10^25."""
    from decimal import Decimal

    big = 10**25
    df = spark.createDataFrame(
        [(i, Decimal(big)) for i in range(4)], "v long, w decimal(38,0)"
    )
    out = ordered_prefix_sums(
        df, "v", ["w"], num_partitions=4, sum_type="decimal(38,0)"
    )
    rows = {r.v: int(r.cum_w_before) for r in out.collect()}
    assert rows == {0: 0, 1: big, 2: 2 * big, 3: 3 * big}
    assert int(out.select("total_w").first()[0]) == 4 * big


def test_lift_by_decile_buckets_and_totals(spark):
    rows = [(i, float(100 - i), i < 30) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "s", "y"])
    out = lift_by_decile(df, "id", "s", "y").collect()
    assert [r.decile for r in out] == list(range(1, 11))
    assert sum(r.n for r in out) == 100
    assert sum(r.responders for r in out) == 30
    # top 3 deciles hold ALL responders (scores rank them first)
    assert out[0].responders == 10 and out[1].responders == 10
    assert out[2].responders == 10 and out[3].responders == 0
    assert out[2].cum_capture == pytest.approx(1.0)
    # lift of a perfect decile = 1 / base rate
    assert out[0].lift == pytest.approx(1.0 / 0.3)


# ---- hypothesis properties: adversarial inputs, not just one seed ----

from hypothesis import given, settings, strategies as st  # noqa: E402
from pyspark.sql.functions import col as F_col  # noqa: E402

HSET = dict(max_examples=5, deadline=None)

labeled_scores = st.lists(
    st.tuples(st.integers(min_value=0, max_value=12), st.booleans()),
    min_size=4,
    max_size=60,
).filter(
    lambda xs: any(y for _, y in xs) and any(not y for _, y in xs)
)


@given(labeled_scores)
@settings(**HSET)
def test_roc_auc_property_matches_brute_force(spark, xs):
    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in xs], ["s", "y"]
    )
    row = roc_auc(df, "s", "y", num_partitions=3).collect()[0]
    assert row.auc == pytest.approx(
        _brute_auc([s for s, _ in xs], [y for _, y in xs]), abs=1e-12
    )


@given(labeled_scores)
@settings(**HSET)
def test_roc_auc_label_flip_complements(spark, xs):
    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in xs], ["s", "y"]
    )
    flipped = df.select("s", (~F_col("y")).alias("y"))
    a = roc_auc(df, "s", "y", num_partitions=3).collect()[0].auc
    b = roc_auc(flipped, "s", "y", num_partitions=3).collect()[0].auc
    assert a + b == pytest.approx(1.0, abs=1e-12)


@given(labeled_scores)
@settings(**HSET)
def test_ks_symmetry_and_bounds(spark, xs):
    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in xs], ["v", "g"]
    )
    swapped = df.select("v", (~F_col("g")).alias("g"))
    d1 = ks_two_sample(df, "v", "g", num_partitions=3).collect()[0]
    d2 = ks_two_sample(swapped, "v", "g", num_partitions=3).collect()[0]
    assert d1.d_stat == d2.d_stat  # |Fa-Fb| is symmetric in the samples
    assert 0.0 <= d1.d_stat <= 1.0
    assert d1.d_stat == pytest.approx(
        _brute_ks(
            [s for s, y in xs if y], [s for s, y in xs if not y]
        ),
        abs=1e-12,
    )


# ---- table_diff property: random mutations vs brute-force dict diff --

mutation_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=39),      # key
        st.sampled_from(["keep", "drop", "change"]),  # fate in v2
    ),
    min_size=10,
    max_size=40,
    unique_by=lambda kv: kv[0],
)


@given(mutation_sets, st.integers(min_value=0, max_value=5))
@settings(**HSET)
def test_table_diff_property_matches_dict_diff(spark, fates, n_added):
    from dbt_repo_spark.operators.relational import table_diff

    a_rows = [(k, float(k * 10)) for k, _ in fates]
    b_rows = [
        (k, float(k * 10) if fate == "keep" else float(k * 10 + 1))
        for k, fate in fates
        if fate != "drop"
    ] + [(1000 + i, 0.0) for i in range(n_added)]
    a = spark.createDataFrame(a_rows, "k long, v double")
    b = spark.createDataFrame(b_rows, "k long, v double")
    row = table_diff(a, b, ["k"], ["v"]).collect()[0]
    da, db = dict(a_rows), dict(b_rows)
    want_removed = len(set(da) - set(db))
    want_added = len(set(db) - set(da))
    want_changed = sum(1 for k in set(da) & set(db) if da[k] != db[k])
    want_same = sum(1 for k in set(da) & set(db) if da[k] == db[k])
    assert (row.n_a, row.n_b) == (len(da), len(db))
    assert (row.added, row.removed) == (want_added, want_removed)
    assert (row.changed, row.unchanged) == (want_changed, want_same)
    assert row.changed_v == want_changed
    # conservation: both sides fully accounted for
    assert row.removed + row.changed + row.unchanged == row.n_a
    assert row.added + row.changed + row.unchanged == row.n_b


def test_source_overlap_sampling(spark):
    """source_overlap_matrix runs on a seeded 50% SIGNATURE sample
    (join key space — no cross-sample matches exist to lose). The
    certificate: on the fixture's seeded overlap, every source pair
    the exact matrix reports with enough sampled mass appears with a
    Jaccard estimate close to exact, and sampled sizes are ~half the
    exact ones."""
    from pyspark.sql import functions as F

    from dbt_repo_spark.queries import QUERIES, t

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["source_overlap_matrix"](spark, sf).collect()
    assert rows, "seeded overlap must survive sampling"

    # exact twin: same pipeline without the signature sample
    docs = t(spark, sf, "documents")
    d1 = docs.select("doc_id", "text").filter(F.col("doc_id") % 7 == 0)
    d2 = docs.select((F.col("doc_id") - 1).alias("doc_id"), "source")
    borrowed = d1.join(d2, "doc_id").select("source", "text")
    corpus = docs.select("source", "text").unionByName(borrowed)
    sigs = corpus.select("source", F.md5("text").alias("sig")).distinct()
    exact_pairs = (
        sigs.alias("a")
        .join(sigs.alias("b"),
              (F.col("a.sig") == F.col("b.sig"))
              & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"))
        .count()
        .collect()
    )
    exact_common = {(r.sa, r.sb): r["count"] for r in exact_pairs}
    exact_sizes = {
        r.source: r["count"] for r in sigs.groupBy("source").count().collect()
    }
    for r in rows:
        # sampled n_common can never exceed exact, and sampled source
        # sizes concentrate around half (binomial, p=1/2)
        assert r.n_common <= exact_common[(r.source_a, r.source_b)]
        for src, n in ((r.source_a, r.n_a), (r.source_b, r.n_b)):
            # wide bounds: per-source counts are ~30 at sf0.001, so the
            # binomial spread around n/2 is large in relative terms
            assert 0.15 * exact_sizes[src] <= n <= 0.85 * exact_sizes[src]
    # aggregate unbiasedness: total sampled common mass ≈ half of exact
    tot_s = sum(r.n_common for r in rows)
    tot_e = sum(exact_common.values())
    assert 0.3 * tot_e <= tot_s <= 0.7 * tot_e
