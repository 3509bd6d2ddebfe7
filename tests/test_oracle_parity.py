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


NO_ORACLE = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
