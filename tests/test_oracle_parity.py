"""DuckDB-oracle differential tests — the local twin of the driver's t2
correctness gate, run at sf0.001 for speed (driver uses sf0.01)."""

from __future__ import annotations

import pytest

from dbt_repo_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import compare

ORACLE_QUERIES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, sf_dir):
    result = compare(name, spark, sf_dir)
    assert result["cols_match"], f"column mismatch: {result}"
    assert result["dtypes_match"], f"dtype mismatch: {result}"
    assert result["rows_match"], f"row-count mismatch: {result}"
    assert result["values_match"], f"value mismatch: {result}"


def test_every_query_has_an_oracle():
    """r08 milestone, pinned as an invariant: the registry carries ZERO
    rows-only entries — every query has a full DuckDB value oracle. A
    new query without one fails here (add the oracle, or consciously
    revive the rows-only harness this test replaced)."""
    assert sorted(set(QUERIES) - set(ORACLES)) == []
