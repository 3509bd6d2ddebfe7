"""The driver checks only a bounded prefix of ``queries()`` per round, so
the rotation in __spark_entry__ must (a) surface never-checked and
failed/changed queries first and (b) stay in sync with the committed
CORRECTNESS_r{N}.json ledger WITHOUT hand-maintenance (the r02 verdict
flagged the manual set as the failure mode)."""

from __future__ import annotations

import importlib
import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

importlib.reload(entry_mod)


def test_rotation_covers_registry_exactly():
    from dbt_repo_spark.queries import QUERIES

    ordered = entry_mod.queries()
    assert set(ordered) == set(QUERIES)
    assert len(ordered) == len(QUERIES)


def _active_rechecks(latest, failed):
    """The listed rechecks still holding priority: a listed name
    SELF-RETIRES once a ledger from _RECHECK_LISTED_FOR_ROUND or later
    shows it green (r03 verdict: the test must model the same rule the
    rotation implements, or it goes red the moment the driver's ledger
    for the listed round lands on disk). Failures never retire."""
    return {
        n for n in entry_mod._RECHECK_THIS_ROUND
        if n in failed
        or latest.get(n, 0) < entry_mod._RECHECK_LISTED_FOR_ROUND
    }


def test_never_checked_and_failed_lead_the_window():
    latest, failed = entry_mod._check_history()
    ordered = list(entry_mod.queries())
    never = {n for n in ordered if n not in latest}
    recheck = _active_rechecks(latest, failed) | failed
    # the window head is exactly the never-checked + ACTIVE recheck sets
    # (order within: listed never-checked first, then rechecks — a FAIL
    # re-verification must never be pushed past the ~50-entry driver
    # window by this round's new registrations — then remaining
    # never-checked)
    head = ordered[: len(never | recheck)]
    assert set(head) == never | recheck
    # every latest-failed query sits in the first 50 (the driver's
    # bounded check window) and before any green least-recently-verified
    # entry
    greens = [n for n in ordered if n in latest and n not in failed
              and n not in recheck]
    first_green = ordered.index(greens[0])
    for name in failed:
        assert ordered.index(name) < min(first_green, 50), name


def test_window_head_is_ledger_independent(monkeypatch, tmp_path):
    """Fixture-pinned variant: the rotation invariants must hold against
    a SYNTHETIC ledger directory, so the assertion does not depend on
    which CORRECTNESS_r*.json files happen to exist on disk (the r03
    failure mode: a driver ledger landing after the builder's last
    commit flipped the on-disk expected set)."""
    import json

    from dbt_repo_spark.queries import ORACLES, QUERIES

    names = list(QUERIES)
    listed = entry_mod._RECHECK_THIS_ROUND
    target = entry_mod._RECHECK_LISTED_FOR_ROUND
    # Ledger 1 (round target-1): everything green except one hard fail
    # and three never-checked; listed rechecks green only at target-1,
    # so they stay ACTIVE.
    never_names = [n for n in names if n not in listed][-3:]
    fail_name = next(n for n in names if n in ORACLES
                     and n not in never_names and n not in listed)
    old = {}
    for n in names:
        if n in never_names:
            continue
        if n in ORACLES:
            ok = n != fail_name
            old[n] = {"rows_match": ok, "schema_match": ok,
                      "hash_match": ok, "spark_rows": 1,
                      "oracle_rows": 1, "err": None}
        else:
            old[n] = {"spark_rows": 1, "err": "no_oracle"}
    (tmp_path / f"CORRECTNESS_r{target - 1:02d}.json").write_text(
        json.dumps(old)
    )
    monkeypatch.setattr(entry_mod, "_REPO_DIR", str(tmp_path))

    latest, failed = entry_mod._check_history()
    assert failed == {fail_name}
    ordered = list(entry_mod.queries())
    active = _active_rechecks(latest, failed)
    assert active == set(listed)  # only checked at target-1 -> active
    head = ordered[: len(set(never_names) | active | failed)]
    assert set(head) == set(never_names) | active | failed
    assert ordered.index(fail_name) < 50

    # Ledger 2 (round target): listed rechecks verified green -> they
    # retire behind every never-checked entry; the hard fail (not
    # re-run) keeps priority.
    new = {n: {"rows_match": True, "schema_match": True,
               "hash_match": True, "spark_rows": 1, "oracle_rows": 1,
               "err": None}
           if n in ORACLES else {"spark_rows": 1, "err": "no_oracle"}
           for n in listed}
    (tmp_path / f"CORRECTNESS_r{target:02d}.json").write_text(
        json.dumps(new)
    )
    latest, failed = entry_mod._check_history()
    assert failed == {fail_name}
    assert _active_rechecks(latest, failed) == set()
    ordered = list(entry_mod.queries())
    head = ordered[: len(set(never_names) | {fail_name})]
    assert set(head) == set(never_names) | {fail_name}
    last_never = max(ordered.index(n) for n in never_names)
    for n in listed:
        assert ordered.index(n) > last_never, n


def test_history_classifies_rows_only_records():
    """A clean rows-only record (err='no_oracle', count present) is NOT a
    failure; a recorded traceback or a missing count is."""
    latest, failed = entry_mod._check_history()
    # Queries that GAINED an oracle after rows-only ledger records (r07:
    # multimodal_features, dedup_minhash_lsh, the IVF pair, the graph
    # iteratives; r08: bpe_tokenize, the sketch trio, the solver-sized
    # pair generator, and finally text_pii_spans — the registry's last
    # rows-only row) must re-queue for a full check, not ride the old
    # rows-only pass (each leaves `failed` once a hash-green row lands)
    for gained in (
        "bpe_tokenize",
        "text_pii_spans",
        "approx_distinct_sketch",
        "distinct_sketch_rollup",
        "quantile_sketch_rollup",
        "embed_near_dup_pairs_scaled",
    ):
        if latest.get(gained, 0) < 8:
            assert gained in failed, gained
    for gained in (
        "multimodal_features",
        "dedup_minhash_lsh",
        "embed_ivf_topk",
        "graph_pagerank_parts",
        "graph_kcore_parts",
    ):
        if latest.get(gained, 0) < 7:
            assert gained in failed, gained
    # timeseries_gapfill hard-failed in r02 (oracle tz drift, since fixed;
    # stays queued for re-check until a green round lands)
    if latest.get("timeseries_gapfill", 0) == 2:
        assert "timeseries_gapfill" in failed


def test_listed_rechecks_self_retire_after_green_round(monkeypatch):
    """Once a ledger from _RECHECK_LISTED_FOR_ROUND (or later) shows a
    listed recheck green, it drops out of the priority window; failures
    never retire."""
    real_latest, real_failed = entry_mod._check_history()
    target = entry_mod._RECHECK_LISTED_FOR_ROUND
    fake_latest = dict(real_latest)
    for n in entry_mod._RECHECK_THIS_ROUND:
        fake_latest[n] = target  # pretend the r{target} driver checked them
    # everyone green in the new round except one stubborn failure
    stubborn = entry_mod._RECHECK_THIS_ROUND[0]
    fake_failed = {stubborn}
    monkeypatch.setattr(
        entry_mod, "_check_history", lambda: (fake_latest, fake_failed)
    )
    ordered = list(entry_mod.queries())
    # the stubborn failure stays up front...
    assert ordered.index(stubborn) < 50
    # ...while retired greens sort AFTER every never-checked entry
    never = [n for n in ordered if n not in fake_latest]
    if never:
        last_never = max(ordered.index(n) for n in never)
        for n in entry_mod._RECHECK_THIS_ROUND[1:]:
            assert ordered.index(n) > last_never, n
