"""Round-9 wave property tests: brute-force twins and guarantee pins for
DSIR importance weights, the FD audit, the count-min join-size estimate,
and bounded-round weighted SSSP — independent of the DuckDB oracles."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from dbt_repo_spark.queries import QUERIES, t

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_dsir_matches_pure_python(spark):
    """Every doc's score equals a hashlib+math reimplementation of the
    DSIR recipe (bucket hash, Laplace smoothing, 6-dp half-up rounding,
    integer sum) — the cross-engine exactness claim, certified against a
    third implementation."""
    B = 256
    docs = {
        r.doc_id: (r.lang, [w for w in r.text.split(" ") if w != ""])
        for r in t(spark, SF, "documents").collect()
    }

    def bucket(w: str) -> int:
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % B

    src: dict[int, int] = {}
    tgt: dict[int, int] = {}
    ts = tt = 0
    for lang, ws in docs.values():
        for w in ws:
            b = bucket(w)
            src[b] = src.get(b, 0) + 1
            ts += 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
                tt += 1
    ratio = {
        b: int(
            Decimal(
                (
                    math.log((tgt.get(b, 0) + 1) / (tt + B))
                    - math.log((src.get(b, 0) + 1) / (ts + B))
                )
                * 1e6
            ).quantize(0, rounding=ROUND_HALF_UP)
        )
        for b in range(B)
    }
    rows = {r.doc_id: r for r in QUERIES["dsir_importance_weights"](spark, SF).collect()}
    assert set(rows) == {d for d, (_, ws) in docs.items() if ws}
    for did, (lang, ws) in docs.items():
        if not ws:
            continue
        exp = sum(ratio[bucket(w)] for w in ws)
        assert rows[did].score_micros == exp, did
        assert rows[did].n_toks == len(ws)
        assert rows[did].keep == (exp > 0)
        assert rows[did].lang == lang


def test_dsir_tilts_toward_target(spark):
    """Direction check on the real fixture: the mean score of 'en' docs
    (the target slice) exceeds the mean score of non-'en' docs — the
    entire point of importance resampling."""
    rows = QUERIES["dsir_importance_weights"](spark, SF01).collect()
    en = [r.score_micros / r.n_toks for r in rows if r.lang == "en"]
    rest = [r.score_micros / r.n_toks for r in rows if r.lang != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_fd_audit_verdicts(spark):
    """The audit separates held from violated FDs on the fixture: the
    key FD reports zero violations, every non-key FD reports at least
    one, and the rate arithmetic is consistent with the counts."""
    rows = {r.fd: r for r in QUERIES["fd_violations"](spark, SF01).collect()}
    assert rows["documents.doc_id->lang"].n_violating_keys == 0
    assert rows["documents.doc_id->lang"].max_distinct_rhs == 1
    for name, r in rows.items():
        assert 0 <= r.n_violating_keys <= r.n_keys
        assert r.violation_rate_micros == r.n_violating_keys * 1_000_000 // r.n_keys
        if name != "documents.doc_id->lang":
            assert r.n_violating_keys > 0, name
            assert r.max_distinct_rhs > 1, name


@pytest.mark.parametrize("sf", [SF, SF01])
def test_cm_join_estimate_upper_bounds_exact(spark, sf):
    """Cormode-Muthukrishnan guarantee: the sketch inner product never
    underestimates the true join size (counters are non-negative, so
    collisions only ADD cross terms)."""
    r = QUERIES["join_size_cm_estimate"](spark, sf).collect()[0]
    assert r.exact_join_size > 0  # the probe is non-degenerate
    assert r.cm_join_size_est >= r.exact_join_size
    assert r.overcount == r.cm_join_size_est - r.exact_join_size


def test_weighted_sssp_matches_bellman_ford(spark):
    """graph.weighted_sssp == a pure-Python bounded-round Bellman-Ford
    on a small weighted digraph (cycle + chords + an unreachable node),
    including the <=iters-edge path bound."""
    from dbt_repo_spark.operators.graph import weighted_sssp

    edges = [
        (0, 1, 5), (1, 2, 1), (2, 3, 1), (0, 3, 9), (3, 4, 2),
        (4, 0, 1), (2, 0, 7), (5, 6, 1),  # 5->6 unreachable from 0
        (0, 2, 4),
    ]
    iters = 3
    dist = {0: 0}
    for _ in range(iters):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, 1 << 60):
                nxt[d] = dist[s] + w
        dist = nxt
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: r.dist
        for r in weighted_sssp(e, seeds, iters=iters).collect()
    }
    assert got == dist
    # weighted vs hop semantics: the direct edge 0->3 costs 9, but the
    # 2-edge path 0->2->3 costs 4+1=5 — weight wins over hop count
    assert got[3] == 5


@pytest.mark.parametrize("sf", [SF, SF01])
def test_pca_direction_matches_numpy(spark, sf):
    """The integer power iteration's direction agrees with NumPy's exact
    eigendecomposition of the float covariance: |cosine| > 0.999 (the
    3-dp quantization + 8 rounds bound the residual; sign is
    canonicalized separately so only alignment matters)."""
    import numpy as np

    rows = sorted(
        QUERIES["embed_top_principal_direction"](spark, sf).collect(),
        key=lambda r: r.dim,
    )
    v = np.array([r.component for r in rows], dtype=float)
    X = np.array(
        [r.embedding for r in t(spark, sf, "embeddings").collect()], dtype=float
    )
    C = np.cov(X, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(C)
    top = vecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999, cos
    # sign canonicalization: first nonzero component positive
    nz = v[v != 0]
    assert nz[0] > 0


def test_interval_join_pairs_within_window(spark):
    """Every emitted stream-stream pair satisfies the interval contract
    (0 <= lag <= 30 days), and per-user pair counts equal the batch
    brute-force on the fixture."""
    rows = QUERIES["streaming_interval_join"](spark, SF).collect()
    assert rows
    ev = t(spark, SF, "events").select("event_id", "user_id", "ts", "event_type")
    sig = {
        (r.user_id, r.event_id): r.ts
        for r in ev.filter(F.col("event_type") == "signup").collect()
    }
    pur = {
        (r.user_id, r.event_id): r.ts
        for r in ev.filter(F.col("event_type") == "purchase").collect()
    }
    expected = {
        (pu, pe, su, se)
        for (pu, pe), pts in pur.items()
        for (su, se), sts in sig.items()
        if pu == su and sts <= pts and (pts - sts).total_seconds() <= 30 * 86400
    }
    got = {(r.user_id, r.purchase_id, r.user_id, r.signup_id) for r in rows}
    assert got == expected
    for r in rows:
        assert 0 <= r.lag_sec <= 30 * 86400
