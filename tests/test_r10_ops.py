"""Round-10 operator tests: Markov removal-effect attribution."""

from __future__ import annotations

import pytest

from dbt_repo_spark.queries import QUERIES, t

SF = "/root/testdata/sf0.001"


def _python_markov(rows, channels, units, rounds):
    """Pure-Python twin of attribution_markov's chain build + truncating
    value iteration (identical integer arithmetic)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, ts, eid, et in rows:
        by_user[uid].append((ts, eid, et))
    trans = defaultdict(int)
    for uid, evs in by_user.items():
        evs.sort()
        fp = next(
            ((ts, eid) for ts, eid, et in evs if et == "purchase"), None
        )
        kept = [e for e in evs if fp is None or (e[0], e[1]) <= fp]
        prev = "__start__"
        for _, _, et in kept:
            dst = "__conv__" if et == "purchase" else et
            trans[(prev, dst)] += 1
            prev = et
        if fp is None:
            trans[(kept[-1][2], "__null__")] += 1
    n = defaultdict(int)
    for (s, _), c in trans.items():
        n[s] += c
    tp = {
        (s, d): c * units // n[s]
        for (s, d), c in trans.items()
        if d != "__null__"
    }
    states = sorted(n)

    def solve(removed):
        p = {
            s: 0 for s in states if removed is None or s != removed
        }
        for _ in range(rounds):
            pa = dict(p)
            pa["__conv__"] = units
            nxt = {}
            for s in p:
                acc = 0
                for (a, b), u in tp.items():
                    if a != s:
                        continue
                    if removed is not None and (a == removed or b == removed):
                        continue
                    acc += u * pa.get(b, 0)
                nxt[s] = acc // units
            p = nxt
        return p["__start__"]

    base = solve(None)
    eff = {c: base - solve(c) for c in channels}
    return base, eff


def test_attribution_markov_matches_python_twin(spark):
    from dbt_repo_spark.queries_r10 import (
        _MARKOV_CHANNELS,
        _MARKOV_ROUNDS,
        _MARKOV_UNITS,
    )

    rows = [
        (r.user_id, r.ts, r.event_id, r.event_type)
        for r in t(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    ]
    base, eff = _python_markov(
        rows, _MARKOV_CHANNELS, _MARKOV_UNITS, _MARKOV_ROUNDS
    )
    got = {
        r.channel: r for r in QUERIES["attribution_markov"](spark, SF).collect()
    }
    assert set(got) == set(_MARKOV_CHANNELS)
    for c in _MARKOV_CHANNELS:
        assert got[c].conv_prob_units == base, c
        assert got[c].removal_effect_units == eff[c], c
    # model properties: removing a channel never helps conversion, and
    # the shares partition the total effect
    assert all(r.removal_effect_units >= 0 for r in got.values())
    total = sum(r.removal_effect_units for r in got.values())
    if total > 0:
        assert (
            abs(sum(r.attribution_share for r in got.values()) - 1.0) < 1e-12
        )


def test_attribution_markov_hand_graph(spark):
    """Hand-checkable chain: u1 click->purchase, u2 click->view (no
    purchase), u3 view->purchase. Removing 'click' kills u1's path,
    removing 'view' kills u3's; START->click carries 2 users."""
    import datetime as dt

    from dbt_repo_spark.queries_r10 import _MARKOV_UNITS

    t0 = dt.datetime(2024, 1, 1)

    def mk(uid, seq):
        return [
            (uid, t0 + dt.timedelta(minutes=i), uid * 100 + i, et)
            for i, et in enumerate(seq)
        ]

    rows = (
        mk(1, ["click", "purchase"])
        + mk(2, ["click", "view"])
        + mk(3, ["view", "purchase"])
    )
    base, eff = _python_markov(rows, ("click", "view"), _MARKOV_UNITS, 16)
    # START: 2/3 -> click, 1/3 -> view; click: 1/2 conv, 1/2 view;
    # view(as state): of 2 view occurrences one absorbs NULL (u2 end),
    # one converts (u3) -> 1/2 conv. Exact: P(conv) = 2/3*(1/2 + 1/2*1/2)
    # + 1/3*1/2 = 2/3*3/4 + 1/6 = 2/3. Truncation keeps it within 2 units.
    assert abs(base - 2 * _MARKOV_UNITS // 3) <= 2
    assert eff["click"] > 0 and eff["view"] > 0


def test_record_linkage_fs_matches_python_twin(spark):
    """record_linkage_fs == a pure-Python integer EM over the same
    blocked comparison patterns (identical truncating arithmetic),
    and the learned model separates: the all-agree pattern is the
    match class with m_i > u_i structure implied by its posterior."""
    from dbt_repo_spark.queries_r10 import _FS_ROUNDS, _FS_UNITS

    docs = [
        (r.doc_id, r.lang, r.source, r.n_chars, r.text)
        for r in t(spark, SF, "documents").collect()
    ]
    U = _FS_UNITS
    recs = []
    for did, lang, source, n_chars, text in docs:
        toks = text.split(" ")
        recs.append(
            (did, lang, source, toks[0], n_chars // 100, " ".join(toks[:3]))
        )
    cnt = {}
    for i in range(len(recs)):
        for j in range(len(recs)):
            a, x = recs[i], recs[j]
            if a[0] >= x[0] or a[3] != x[3] or a[4] != x[4]:
                continue
            g = (
                1 if a[1] == x[1] else 0,
                1 if a[2] == x[2] else 0,
                1 if a[5] == x[5] else 0,
            )
            cnt[g] = cnt.get(g, 0) + 1
    m, u, p = [9 * U // 10] * 3, [U // 10] * 3, U // 10

    def estep():
        ws = {}
        for g in cnt:
            pm = pu = U
            for i in range(3):
                pm = pm * (m[i] if g[i] else U - m[i]) // U
                pu = pu * (u[i] if g[i] else U - u[i]) // U
            nm, nu = p * pm // U, (U - p) * pu // U
            ws[g] = (nm * U // (nm + nu)) if nm + nu else 0
        return ws

    for _ in range(_FS_ROUNDS):
        ws = estep()
        sw = sum(cnt[g] * ws[g] for g in cnt)
        su = sum(cnt[g] * (U - ws[g]) for g in cnt)
        m = [
            sum(cnt[g] * ws[g] * g[i] for g in cnt) * U // max(sw, 1)
            for i in range(3)
        ]
        u = [
            sum(cnt[g] * (U - ws[g]) * g[i] for g in cnt) * U // max(su, 1)
            for i in range(3)
        ]
        p = sw // sum(cnt.values())
    ws = estep()
    got = {
        (r.g_lang, r.g_source, r.g_prefix): r
        for r in QUERIES["record_linkage_fs"](spark, SF).collect()
    }
    assert set(got) == set(cnt)
    for g, r in got.items():
        assert r.n_pairs == cnt[g], g
        assert r.posterior_units == ws[g], g
        assert r.is_match == (ws[g] > U - ws[g]), g
    # separation: posterior is monotone in total agreement on this corpus
    if (1, 1, 1) in got and (0, 0, 0) in got:
        assert (
            got[(1, 1, 1)].posterior_units > got[(0, 0, 0)].posterior_units
        )


def test_attribution_shapley_matches_python_twin(spark):
    """attribution_shapley == a pure-Python exact Shapley over the same
    windowed coalition function, and the efficiency axiom holds
    bit-exactly over the anchored v: sum(phi*24) == 24*v(full)."""
    from itertools import combinations

    from dbt_repo_spark.queries_r10 import (
        _MARKOV_CHANNELS,
        _MARKOV_UNITS,
        _SHAPLEY_WINDOW,
    )

    U = _MARKOV_UNITS
    rows = [
        (r.user_id, r.ts, r.event_id, r.event_type)
        for r in t(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    ]
    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, ts, eid, et in rows:
        by_user[uid].append((ts, eid, et))
    ma = defaultdict(lambda: [0, 0])
    bit = {c: 1 << i for i, c in enumerate(_MARKOV_CHANNELS)}
    for uid, evs in by_user.items():
        evs.sort()
        w8 = evs[:_SHAPLEY_WINDOW]
        prn = next(
            (i for i, e in enumerate(w8, 1) if e[2] == "purchase"), None
        )
        kept = w8 if prn is None else w8[:prn]
        mask = 0
        for _, _, et in kept:
            mask |= bit.get(et, 0)
        ma[mask][0] += 1
        ma[mask][1] += 1 if prn is not None else 0
    def v(S):
        if S == 0:
            return 0
        nu = sum(n for m, (n, _) in ma.items() if m & S == m)
        nc = sum(c for m, (_, c) in ma.items() if m & S == m)
        return (nc * U) // nu if nu else 0

    w24 = {0: 6, 1: 2, 2: 2, 3: 6}
    phi = {}
    for c, b in bit.items():
        acc = 0
        for S in range(16):
            if S & b:
                continue
            acc += w24[bin(S).count("1")] * (v(S | b) - v(S))
        phi[c] = acc
    got = {
        r.channel: r
        for r in QUERIES["attribution_shapley"](spark, SF).collect()
    }
    assert set(got) == set(_MARKOV_CHANNELS)
    for c in _MARKOV_CHANNELS:
        assert got[c].shapley_x24_units == phi[c], c
        assert got[c].v_full_units == v(15), c
    # efficiency over the anchored characteristic function
    assert sum(phi.values()) == 24 * v(15)


def test_eval_conformal_mondrian_matches_python_twin(spark):
    """eval_conformal_mondrian == a pure-Python split-conformal twin
    (same md5-nibble splits, integer mean, ceil rank, order statistic),
    and the finite-sample guarantee shows: per-group CALIBRATION mass
    at or below q_hat is >= k/n_cal >= 0.9 by construction."""
    import hashlib
    from collections import defaultdict
    from decimal import Decimal

    rows = [
        (r.o_orderkey, r.o_orderpriority, r.o_totalprice)
        for r in t(spark, SF, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    ]
    split = defaultdict(lambda: defaultdict(list))
    for ok, prio, price in rows:
        nib = int(hashlib.md5(str(ok).encode()).hexdigest()[0], 16)
        cents = int(
            (Decimal(str(price)).quantize(Decimal("0.01"))) * 100
        )
        which = "train" if nib < 8 else ("cal" if nib < 12 else "test")
        split[prio][which].append(cents)
    exp = {}
    for prio, d in split.items():
        if not d["train"] or not d["cal"] or not d["test"]:
            continue
        pred = sum(d["train"]) // len(d["train"])
        errs = sorted(abs(c - pred) for c in d["cal"])
        n_cal = len(errs)
        k = ((n_cal + 1) * 9 + 9) // 10
        qh = errs[k - 1] if k <= n_cal else None
        covered = sum(
            1
            for c in d["test"]
            if qh is None or abs(c - pred) <= qh
        )
        exp[prio] = (len(d["train"]), n_cal, k, qh, len(d["test"]), covered)
    got = {
        r.priority: r
        for r in QUERIES["eval_conformal_mondrian"](spark, SF).collect()
    }
    assert set(got) == set(exp)
    for prio, (ntr, ncal, k, qh, nte, cov) in exp.items():
        r = got[prio]
        assert (r.n_train, r.n_cal, r.k_cal) == (ntr, ncal, k), prio
        assert r.q_hat_cents == qh, prio
        assert (r.n_test, r.n_covered) == (nte, cov), prio
        # the calibration-side guarantee is structural: k/(n_cal+1) >= 0.9
        assert 10 * k >= 9 * (ncal + 1), prio


def test_gram_partials_null_and_ragged_contract(spark):
    """fit.gram_partials: NULL arrays contribute nothing (posexplode
    semantics), wrong-length arrays fail loudly with a named error."""
    from pyspark.sql import functions as F

    from dbt_repo_spark.operators.fit import gram_partials

    ok = spark.createDataFrame(
        [([1, 2],), (None,), ([3, 4],)], "q array<bigint>"
    )
    parts = gram_partials(ok, "q", 2).collect()
    got: dict = {}
    for r in parts:  # per-partition partials: the caller's groupBy-sum
        got[(r.i, r.j)] = got.get((r.i, r.j), 0) + r.p
    # gram of [[1,2],[3,4]]: [[10,14],[14,20]]; col sums [4,6] at j=-1
    assert got[(0, 0)] == 10 and got[(0, 1)] == 14
    assert got[(1, 1)] == 20 and got[(0, -1)] == 4 and got[(1, -1)] == 6
    bad = spark.createDataFrame([([1, 2],), ([9],)], "q array<bigint>")
    with pytest.raises(Exception, match="length != 2"):
        gram_partials(bad, "q", 2).collect()


# ---------------------------------------------------------------- hypothesis

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_H = dict(max_examples=10, deadline=None, derandomize=True)

_EVT = st.sampled_from(["click", "error", "signup", "view", "purchase"])


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 30), _EVT),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    )
)
@settings(**_H)
def test_attribution_markov_random_journeys(spark, event_list):
    """attribution_markov == the Python twin on arbitrary tiny event
    tables: purchase-first users, users with one event, ts ties broken
    by event_id, channels missing from the data entirely."""
    import datetime as dt

    from dbt_repo_spark.queries_r10 import (
        _MARKOV_CHANNELS,
        _MARKOV_ROUNDS,
        _MARKOV_UNITS,
        attribution_markov,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (uid, t0 + dt.timedelta(minutes=off // 3), uid * 1000 + off, et)
        for uid, off, et in event_list
    ]
    base, eff = _python_markov(
        rows, _MARKOV_CHANNELS, _MARKOV_UNITS, _MARKOV_ROUNDS
    )
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    import dbt_repo_spark.queries_r10 as r10
    import dbt_repo_spark.queries as qmod

    # drive the operator body directly on the synthetic table by
    # monkeypatching the table loader it calls
    orig = qmod.t
    try:
        qmod.t = lambda s, sf, name: df
        r10.t = qmod.t
        got = {r.channel: r for r in attribution_markov(spark, "_")
               .collect()}
    finally:
        qmod.t = orig
        r10.t = orig
    for c in _MARKOV_CHANNELS:
        assert got[c].conv_prob_units == base, c
        assert got[c].removal_effect_units == eff[c], c


def _python_bh(groups, alpha_micros=50_000):
    """Pure-Python twin of eval_bh_fdr's z/p/step-up (same A&S 7.1.26
    text; libm-vs-JVM exp drift is absorbed by the 6-dp round except at
    exact micro boundaries, so callers compare p with +-1 tolerance)."""
    import math

    tot_n = sum(len(v) for v in groups.values())
    tot_s = sum(sum(v) for v in groups.values())
    tot_ss = sum(sum(x * x for x in v) for v in groups.values())
    rows = []
    for gname, v in sorted(groups.items()):
        n1, s1, ss1 = len(v), sum(v), sum(x * x for x in v)
        n2, s2, ss2 = tot_n - n1, tot_s - s1, tot_ss - ss1
        if n1 < 2 or n2 < 2:
            continue
        # mirror the engines' CAST-then-divide exactly: float(int) is the
        # same round-to-nearest as CAST(x AS DOUBLE); bare s1/n1 in Python
        # is the correctly-rounded EXACT-rational quotient, which differs
        # in the last ulp when the sums aren't double-representable
        fn1, fn2 = float(n1), float(n2)
        m1, m2 = float(s1) / fn1, float(s2) / fn2
        v1 = (float(ss1) / fn1 - m1 * m1) * (fn1 / float(n1 - 1)) / fn1
        v2 = (float(ss2) / fn2 - m2 * m2) * (fn2 / float(n2 - 1)) / fn2
        if not v1 + v2 > 0:  # both-sides-constant: no valid Welch test
            continue
        z = (m1 - m2) / math.sqrt(v1 + v2)
        x = abs(z) / math.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                    + t * (-1.453152027 + t * 1.061405429))))
        p = poly * math.exp(-(x * x))
        rows.append((gname, z, round(p * 1_000_000)))
    m = len(rows)
    rows.sort(key=lambda r: (r[2], r[0]))
    k_max = 0
    for k, (_, _, pm) in enumerate(rows, 1):
        if pm * m <= k * alpha_micros:
            k_max = k
    return rows, k_max


def test_eval_bh_fdr_matches_python_twin(spark):
    """z bit-identical, p within 1 micro (exp ulp class), identical BH
    verdicts on the fixture."""
    from pyspark.sql import functions as F

    rows = [
        (r.n_name, r.cents)
        for r in t(spark, SF, "orders")
        .join(
            t(spark, SF, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            t(spark, SF, "nation").select("n_nationkey", "n_name"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .selectExpr(
            "n_name",
            "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"
            " AS cents",
        )
        .collect()
    ]
    from collections import defaultdict

    groups = defaultdict(list)
    for n, c in rows:
        groups[n].append(c)
    exp_rows, exp_k = _python_bh(groups)
    exp = {n: (z, pm) for n, z, pm in exp_rows}
    got = {r.n_name: r for r in QUERIES["eval_bh_fdr"](spark, SF).collect()}
    assert set(got) == set(exp)
    for n, r in got.items():
        ez, epm = exp[n]
        assert r.z == ez, (n, r.z, ez)  # bit-identical double chain
        assert abs(r.p_micros - epm) <= 1, n
        assert r.k_max == exp_k, n


def test_eval_bh_fdr_rejects_on_planted_shift(spark):
    """BH machinery end-to-end on planted data: one group's values are
    shifted far from the rest — it must be rejected (rank 1, k_max >= 1)
    while the null groups survive."""
    import dbt_repo_spark.queries_r10 as r10
    import dbt_repo_spark.queries as qmod

    # G0 is small (n=40) and shifted +100k; the five null groups are big
    # (n=200) with wide within-group spread, so G0's contamination of
    # each null group's "rest" mean (~+4k) stays inside the null noise —
    # group-vs-rest tests are not independent, and a huge planted group
    # would drag every complement along with it
    rows = []
    for g in range(6):
        base = 200_000 if g == 0 else 100_000
        n = 40 if g == 0 else 200
        for i in range(n):
            rows.append((g * 1000 + i, g, base + (i % 37) * 3_000))
    orders = spark.createDataFrame(
        [(k, k, v / 100.0) for k, g, v in rows],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(k, g) for k, g, _ in rows], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame(
        [(g, f"G{g}") for g in range(6)], "n_nationkey long, n_name string"
    )
    tables = {"orders": orders, "customer": customer, "nation": nation}
    orig = qmod.t
    try:
        qmod.t = lambda s, sf, name: tables[name]
        r10.t = qmod.t
        got = {r.n_name: r for r in r10.eval_bh_fdr(spark, "_").collect()}
    finally:
        qmod.t = orig
        r10.t = orig
    assert got["G0"].bh_reject and got["G0"].rank == 1
    assert got["G0"].k_max >= 1
    # the five null groups all carry the same |z| class and survive
    assert not any(got[f"G{g}"].bh_reject for g in range(2, 6))


def test_eval_bh_fdr_degenerate_zero_variance(spark):
    """Every value identical everywhere → every group's pooled Welch
    variance is 0 AND the mean difference is 0 (z would be 0/0 = NaN,
    where non-ANSI Spark and DuckDB disagree): the variance filter must
    drop every group, yielding an empty result rather than an
    engine-divergent one."""
    import dbt_repo_spark.queries_r10 as r10
    import dbt_repo_spark.queries as qmod

    rows = [(g * 100 + i, g) for g in range(3) for i in range(5)]
    orders = spark.createDataFrame(
        [(k, k, 123.45) for k, _ in rows],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame(
        [(g, f"G{g}") for g in range(3)], "n_nationkey long, n_name string"
    )
    tables = {"orders": orders, "customer": customer, "nation": nation}
    orig = qmod.t
    try:
        qmod.t = lambda s, sf, name: tables[name]
        r10.t = qmod.t
        assert r10.eval_bh_fdr(spark, "_").count() == 0
    finally:
        qmod.t = orig
        r10.t = orig
