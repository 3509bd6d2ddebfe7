"""Golden end-to-end run on the reference's REAL shipped data (r11
verdict ask #1 — the last surface every prior round exercised only with
synthetic lookalike fixtures).

`/root/reference/data/{01,02,05}_2025.csv` are the reference's actual
historic trip exports (42,819 rows, µs-precision `+00:00` timestamps —
data/01_2025.csv:2): real NULL patterns, real station-id formats, real
duplicate trips (4 trip_id collisions from genuinely duplicated rows).
This module drives them through the PRODUCTION path — the `ingest-trips`
CLI (src/historical_bucket_to_bq.py analog), the full model DAG (GBFS
status models skip exactly as in production when their feeds are absent),
and the declared D9 data tests — then pins the marts two ways:

1. against a DuckDB oracle computing the same stg→fact→mart semantics
   (models/staging/stg_historic_trips.sql, models/facts/fact_trips.sql,
   models/marts/mart_trip_metrics.sql) directly over the same CSVs —
   full-frame equality on mart_trip_metrics, aggregate+checksum equality
   on fact_trips;
2. against PINNED literals (the golden ledger — COVERAGE.md r12) so a
   regression is caught even where DuckDB and Spark would drift together.

Read-only on /root/reference; skips cleanly if the data dir is absent.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

REF_DATA = "/root/reference/data"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REF_DATA), reason="reference data dir absent"
    ),
]

# The golden ledger: computed once from the shipped CSVs (r12), verified
# engine-vs-oracle below. If the reference ships new data these move —
# that's a conscious re-pin, not a silent drift.
GOLDEN = {
    "n_trips": 42819,
    "n_trip_ids": 42815,  # 4 md5 collisions = genuinely duplicated rows
    "sum_raw_duration_s": 30965326,
    "sum_computed_duration_s": 30965326,  # reported ≡ computed on real data
    "trip_id_fold": 91755963472945,  # Σ first-8-hex-of-md5 as BIGINT
    "n_trip_days": 64,
    "n_start_stations": 270,
    "n_mart_rows": 9372,
}

_ORACLE = """
WITH raw AS (
  SELECT * FROM read_csv('{glob}', header=true)
  WHERE started_at IS NOT NULL AND ended_at IS NOT NULL),
stg AS (
  SELECT started_at, ended_at,
         CAST(duration AS INTEGER) AS duration_s,
         CAST(start_station_id AS VARCHAR) AS start_station_id,
         CAST(end_station_id AS VARCHAR) AS end_station_id,
         CAST(started_at AS DATE) AS trip_date,
         -- timestamp_diff semantics: TRUE µs difference truncated
         -- toward zero (functions/bq.py timestamp_diff)
         CASE WHEN epoch_us(ended_at) - epoch_us(started_at) >= 0
              THEN (epoch_us(ended_at) - epoch_us(started_at)) // 1000000
              ELSE -((epoch_us(started_at) - epoch_us(ended_at)) // 1000000)
         END AS computed_duration_s
  FROM raw),
fact AS (
  SELECT md5(strftime(started_at, '%Y-%m-%d %H:%M:%S')
             || strftime(ended_at, '%Y-%m-%d %H:%M:%S')
             || start_station_id || end_station_id) AS trip_id,
         duration_s AS raw_duration_s, computed_duration_s,
         trip_date, start_station_id
  FROM stg)
"""


def _duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


@pytest.fixture(scope="module")
def golden_wh(spark, tmp_path_factory):
    """Ingest the real CSVs and run the DAG once for the module."""
    from dbt_repo_spark.__main__ import main

    wh = str(tmp_path_factory.mktemp("golden_wh"))
    assert main(["ingest-trips", "--csv", f"{REF_DATA}/*.csv",
                 "--warehouse", wh]) == 0
    assert main(["run", "--warehouse", wh]) == 0
    return wh


def test_golden_ingest_row_count(golden_wh, spark):
    """Every non-NULL-key CSV row lands in raw.historic_trips — the
    real files carry no NULL started_at/ended_at, so nothing drops."""
    from dbt_repo_spark.sources.catalog import Catalog

    raw = Catalog(spark, golden_wh).read("raw", "historic_trips")
    assert raw.count() == GOLDEN["n_trips"]
    # µs precision survived the parse (timestamps are not second-floored)
    frac = raw.where(
        F.unix_micros("started_at") % 1_000_000 != 0
    ).count()
    assert frac > GOLDEN["n_trips"] // 2


def test_golden_declared_data_tests_pass(golden_wh):
    """D9 not_null tests on all seven stg_historic_trips key columns
    pass on the real data (the reference's schema.yml contract)."""
    from dbt_repo_spark.__main__ import main

    assert main(["test", "--warehouse", golden_wh]) == 0


def test_golden_fact_trips_matches_duckdb_and_ledger(golden_wh, spark):
    """fact_trips vs the DuckDB oracle over the same CSVs: row count,
    distinct-key count, duration sums, md5-key checksum, date/station
    cardinalities — all exactly equal, and equal to the pinned ledger."""
    from dbt_repo_spark.sources.catalog import Catalog

    ft = Catalog(spark, golden_wh).read("analytics", "fact_trips")
    got = ft.agg(
        F.count("*").alias("n_trips"),
        F.countDistinct("trip_id").alias("n_trip_ids"),
        F.sum("raw_duration_s").cast("long").alias("sum_raw_duration_s"),
        F.sum("computed_duration_s").cast("long")
        .alias("sum_computed_duration_s"),
        F.sum(
            F.expr("CAST(conv(substring(trip_id,1,8),16,10) AS BIGINT)")
        ).alias("trip_id_fold"),
        F.countDistinct("trip_date").alias("n_trip_days"),
        F.countDistinct("start_station_id").alias("n_start_stations"),
    ).collect()[0].asDict()

    oracle = _duck().execute(
        _ORACLE.format(glob=f"{REF_DATA}/*.csv")
        + """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_trips,
               CAST(COUNT(DISTINCT trip_id) AS BIGINT) AS n_trip_ids,
               CAST(SUM(raw_duration_s) AS BIGINT) AS sum_raw_duration_s,
               CAST(SUM(computed_duration_s) AS BIGINT)
                 AS sum_computed_duration_s,
               CAST(SUM(list_reduce(list_transform(
                    string_split_regex(substr(trip_id,1,8), ''),
                    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                    (a, b) -> a * 16 + b)) AS BIGINT) AS trip_id_fold,
               CAST(COUNT(DISTINCT trip_date) AS BIGINT) AS n_trip_days,
               CAST(COUNT(DISTINCT start_station_id) AS BIGINT)
                 AS n_start_stations
        FROM fact
        """
    ).fetchdf().iloc[0].to_dict()

    for k in oracle:
        assert got[k] == int(oracle[k]), (k, got[k], oracle[k])
        assert got[k] == GOLDEN[k], (k, got[k], GOLDEN[k])


def test_golden_mart_trip_metrics_full_frame(golden_wh, spark):
    """mart_trip_metrics vs DuckDB, EVERY row: (date, station) grain,
    trip counts, mismatch counts exactly; avg durations to 6 dp (the
    repo's float-output convention)."""
    from dbt_repo_spark.sources.catalog import Catalog

    mt = Catalog(spark, golden_wh).read("analytics", "mart_trip_metrics")
    sdf = mt.toPandas()
    assert len(sdf) == GOLDEN["n_mart_rows"]

    ddf = _duck().execute(
        _ORACLE.format(glob=f"{REF_DATA}/*.csv")
        + """
        SELECT trip_date AS date_key, start_station_id AS station_id,
               CAST(COUNT(*) AS BIGINT) AS total_trips_started,
               AVG(raw_duration_s) AS avg_reported_duration_s,
               AVG(computed_duration_s) AS avg_computed_duration_s,
               CAST(SUM(CASE WHEN raw_duration_s != computed_duration_s
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS count_mismatched_durations
        FROM fact GROUP BY 1, 2
        """
    ).fetchdf()
    assert len(ddf) == len(sdf)

    def norm(df):
        out = df.copy()
        out["date_key"] = out["date_key"].astype(str).str[:10]
        for c in ("avg_reported_duration_s", "avg_computed_duration_s"):
            out[c] = out[c].astype(float).round(6)
        for c in ("total_trips_started", "count_mismatched_durations"):
            out[c] = out[c].astype("int64")
        return (
            out[sorted(out.columns)]
            .sort_values(["date_key", "station_id"])
            .reset_index(drop=True)
        )

    left, right = norm(sdf), norm(ddf)
    assert left.equals(right), (
        left.compare(right).head(20) if left.shape == right.shape
        else (left.shape, right.shape)
    )
