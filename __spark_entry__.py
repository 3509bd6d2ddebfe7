"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extension ops) to a (spark, sf_dir) -> DataFrame callable; ``oracle_sql()``
holds the DuckDB-equivalent ANSI SQL for each SQL-expressible query.
Registry lives in dbt_repo_spark/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_repo_spark.queries import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Driver-side correctness evidence ledger, derived AUTOMATICALLY from the
# CORRECTNESS_r{N}.json files the driver commits each round (the r02
# verdict flagged the hand-maintained set as easy to forget — this can't
# be). The driver checks a bounded window (first ~50 registry entries)
# per round, so ``queries()`` orders entries: never-driver-checked first,
# then queries whose LATEST driver record failed or that changed this
# round, then least-recently-verified.
import glob as _glob
import json as _json
import os as _os
import re as _re

_REPO_DIR = _os.path.dirname(_os.path.abspath(__file__))


def _check_history() -> tuple[dict[str, int], set[str]]:
    """(latest round each query was driver-checked, names whose latest
    record was a hard failure)."""
    latest: dict[str, int] = {}
    status: dict[str, tuple[int, bool]] = {}
    for path in sorted(_glob.glob(_os.path.join(_REPO_DIR, "CORRECTNESS_r*.json"))):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = _json.load(fh)
        except Exception:
            continue
        for name, rec in data.items():
            latest[name] = max(latest.get(name, 0), rnd)
            if name in ORACLES:
                # Oracle contract: full rows+schema+hash green. A query
                # that GAINED an oracle after a rows-only record also
                # lands here and is queued for a full re-check.
                ok = bool(
                    rec.get("rows_match")
                    and rec.get("schema_match")
                    and rec.get("hash_match")
                )
            else:
                # Rows-only contract: the driver records err="no_oracle"
                # with the observed row count; a traceback or a missing
                # count is the failure signal.
                ok = (
                    rec.get("err") in (None, "no_oracle")
                    and rec.get("spark_rows") is not None
                )
            if name not in status or rnd >= status[name][0]:
                status[name] = (rnd, ok)
    failed = {n for n, (_, ok) in status.items() if not ok}
    return latest, failed


# Hand-ordered head of the never-checked set. The round-2 TPC-H list
# retired (all ten driver-checked green in CORRECTNESS_r03); empty now —
# never-checked entries order by registry index, which already puts the
# 39-query round-3 backlog ahead of this round's additions.
_NEVER_CHECKED_FIRST: list[str] = []

# Changed this round — re-verify right after the never-checked set
# (the r04 list self-retired: all three were driver-checked clean in
# CORRECTNESS_r04). Round-5 rewrites: safe_cast gained the control-char
# NULL guard (functions/bq.py — BQ/DuckDB parity fix for the r04
# Hypothesis drift), which is in the plans of safe_math and
# typed_null_filter. Queries whose latest driver record FAILED are
# appended automatically. multimodal_near_dedup's plan changed again in
# r5 (signature-relation caching replaced the gram-string persist —
# same results, 6.8 -> 2.9s median), so its rows-only driver check
# re-runs too.
_RECHECK_THIS_ROUND = [
    # r13 (r12 verdict ask #4): the r12 session rewired ~21 query paths
    # (unigram DP → one Arrow stage, connected_components persist
    # discipline, markov driver solve, graph loop folds) but 17 of them
    # were in NEITHER r11's nor r12's 50-query driver sample — the driver
    # has never executed the rewritten code paths. They head the window
    # this round, together with the paths r13 touched again (CC label-init
    # materialization, pagerank_units static relations, LPA fold, triangle
    # bytes-derived broadcast gate, prefix-join broadcast, RAKE shared
    # materialization, tdp_v2 single-scan quality gate).
    "unigram_lm_tokenize",
    "unigram_lm_em_round",
    "unigram_lm_train",
    "attribution_markov",
    "graph_pagerank_parts",
    "graph_label_prop_communities",
    "graph_bfs_hops",
    "graph_weighted_sssp",
    "graph_weighted_sssp_converged",
    "graph_kcore_parts",
    "graph_triangle_census",
    "dedup_clusters",
    "entity_resolution_docs",
    "embed_near_dup_clusters",
    "dedup_canonical_quality",
    "dedup_semantic",
    "training_data_pipeline_v3",
    "training_data_pipeline_v7",
    "multimodal_phash_groups",
    "geo_dbscan_clusters",
    # r13-only touches
    "training_data_pipeline_v2",
    "similarity_join_prefix",
    "text_keyphrase_rake",
    "text_quality",            # passes_quality now via text.quality_gate
    "training_data_pipeline",  # same quality_scores composite
]

# The round whose driver run is meant to verify the list above: a listed
# name SELF-RETIRES once a correctness ledger from this round (or later)
# shows it green, so stale lists can't hog window slots in later rounds.
_RECHECK_LISTED_FOR_ROUND = 13


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on /root/testdata/sf0.001."""
    return QUERIES["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so a bounded driver check window reaches every operator:
    never-driver-checked first (TPC-H rewrites leading), then queries
    changed this round or whose latest driver record failed, then
    least-recently-verified (older rounds first).
    """
    latest, failed = _check_history()
    recheck = list(_RECHECK_THIS_ROUND) + sorted(
        failed - set(_RECHECK_THIS_ROUND)
    )

    def rank(item: tuple[int, str]) -> tuple[int, int, int]:
        # Priority: listed never-checked (TPC-H rewrites) → failed/changed
        # rechecks (a FAIL re-verification must never be pushed out of the
        # bounded window by this round's newly registered queries) → other
        # never-checked (including new registrations, registry order) →
        # least-recently-verified. A listed recheck SELF-RETIRES once a
        # ledger from _RECHECK_LISTED_FOR_ROUND or later shows it green —
        # without this, the hand list would hog priority-1 window slots
        # in every later round; auto-detected failures never retire.
        idx, name = item
        if name not in latest and name in _NEVER_CHECKED_FIRST:
            return (0, _NEVER_CHECKED_FIRST.index(name), idx)
        if name in recheck and (
            name in failed
            or latest.get(name, 0) < _RECHECK_LISTED_FOR_ROUND
        ):
            return (1, recheck.index(name), idx)
        if name not in latest:
            return (2, 0, idx)
        return (3, latest[name], idx)

    ordered = sorted(enumerate(QUERIES), key=rank)
    return {name: QUERIES[name] for _, name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` (same column names).

    COMPLETE since r8: every registry key has a full value oracle —
    zero rows-only entries (pinned by tests/test_oracle_parity.py,
    which asserts ORACLES covers QUERIES and runs every pair). The last
    holdouts left the rows-only set via portable sketch states, stdlib
    codecs, md5-reproducible embedding CTEs, integer micro-unit
    iterative algorithms with unrolled-round CTEs (PageRank, k-core,
    PCA squaring, Markov/Shapley attribution, Fellegi-Sunter EM,
    unigram-LM training), and shared brute-force SQL. Approximate
    operators additionally carry in-plan quality certificates
    (recall@k, pair_recall, rel_err, rank_err, L1 residual) with floors
    pinned in tests — see COVERAGE.md row by row.
    """
    return dict(ORACLES)
