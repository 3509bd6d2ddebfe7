"""End-to-end model-DAG tests: the reference's 15 GBFS models + 4 demo
models run on synthetic GBFS-shaped fixtures through the ModelRunner.

Covers SURVEY.md §2.11 D1-D12: materializations (view/table/incremental),
incremental idempotence (running twice adds zero rows — the NOT-IN
template of models/facts/fact_station_status.sql:30-32), and the four
dbt generic tests on the demo models (models_demo/schema.yml:8-41).
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbt_repo_spark.models import DEMO_MODELS, GBFS_MODELS
from dbt_repo_spark.plans.runner import ModelRunner
from dbt_repo_spark.sources.catalog import Catalog

UTC = dt.timezone.utc

STATION_STRUCT = T.StructType(
    [
        T.StructField("station_id", T.StringType()),
        T.StructField("last_reported", T.LongType()),
        T.StructField("num_bikes_available", T.LongType()),
        T.StructField("num_docks_available", T.LongType()),
        T.StructField("is_installed", T.BooleanType()),
        T.StructField("is_renting", T.BooleanType()),
        T.StructField("is_returning", T.BooleanType()),
    ]
)

RAW_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("ingest_datetime", T.TimestampType()),
        T.StructField("last_updated", T.LongType()),
        T.StructField("ttl", T.LongType()),
        T.StructField("version", T.StringType()),
        T.StructField(
            "data",
            T.StructType([T.StructField("stations", T.ArrayType(STATION_STRUCT))]),
        ),
    ]
)

BASE_EPOCH = 1735700000  # 2025-01-01T02:13:20Z


def _status_snapshot(feed_epoch: int, n_stations: int = 5):
    stations = [
        Row(
            station_id=f"st{i:03d}",
            last_reported=feed_epoch - 30,
            num_bikes_available=(i * 3 + feed_epoch) % 20,
            num_docks_available=20 - (i * 3 + feed_epoch) % 20,
            is_installed=True,
            is_renting=i % 4 != 0,
            is_returning=i % 5 != 0,
        )
        for i in range(n_stations)
    ]
    return Row(
        ingest_datetime=dt.datetime.fromtimestamp(feed_epoch + 5, tz=UTC),
        last_updated=feed_epoch,
        ttl=60,
        version="2.3",
        data=Row(stations=stations),
    )


def _info_payload(n_stations: int = 5) -> str:
    return json.dumps(
        {
            "stations": [
                {
                    "station_id": f"st{i:03d}",
                    "name": f"Station {i}",
                    "lat": 59.9 + i * 0.01,
                    "lon": 10.7 + i * 0.01,
                    "address": f"Street {i}",
                    "cross_street": None,
                    "capacity": 20 + i,
                    "is_virtual_station": "true" if i % 3 == 0 else "false",
                    "rental_uris": {
                        "android": f"app://android/{i}",
                        "ios": f"app://ios/{i}",
                        "web": f"https://example.org/{i}",
                    },
                }
                for i in range(n_stations)
            ],
            "tariffs": [
                {
                    "tariff_id": "day",
                    "name": "Day pass",
                    "cost_per_hour": "15.0",
                    "currency": "NOK",
                    "duration_minutes": "60",
                },
                {
                    "tariff_id": "season",
                    "name": "Season pass",
                    "cost_per_hour": "oops-not-a-number",  # exercises safe_cast → NULL
                    "currency": "NOK",
                    "duration_minutes": "45",
                },
            ],
        }
    )


@pytest.fixture(scope="module")
def gbfs_sources(spark):
    raw_status = spark.createDataFrame(
        [_status_snapshot(BASE_EPOCH + 60 * k) for k in range(4)], RAW_STATUS_SCHEMA
    )
    raw_info = spark.createDataFrame(
        [
            Row(
                ingest_datetime=dt.datetime.fromtimestamp(BASE_EPOCH, tz=UTC),
                last_updated=BASE_EPOCH,
                ttl=60,
                version="2.3",
                data_json=_info_payload(),
            )
        ]
    )
    trips = [
        Row(
            started_at=dt.datetime.fromtimestamp(BASE_EPOCH + i * 700, tz=UTC),
            ended_at=dt.datetime.fromtimestamp(BASE_EPOCH + i * 700 + 540 + i, tz=UTC),
            duration=540 + i - (i % 7 == 0),  # some mismatched reported durations
            start_station_id=f"st{i % 5:03d}",
            start_station_name=f"Station {i % 5}",
            start_station_description="",
            start_station_latitude=59.9,
            start_station_longitude=10.7,
            end_station_id=f"st{(i + 2) % 5:03d}",
            end_station_name=f"Station {(i + 2) % 5}",
            end_station_description="",
            end_station_latitude=59.95,
            end_station_longitude=10.75,
        )
        for i in range(40)
    ]
    raw_trips = spark.createDataFrame(trips)
    return {
        "raw_station_status": raw_status,
        "raw_station_information": raw_info,
        "raw_historic_trips": raw_trips,
    }


@pytest.fixture()
def runner(spark, gbfs_sources, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "warehouse"))
    r = ModelRunner(spark, catalog, gbfs_sources)
    r.add(*GBFS_MODELS)
    return r


def test_full_dag_runs(runner):
    built = runner.run()
    assert set(built) == {m.name for m in GBFS_MODELS}
    # staging explode: 4 snapshots × 5 stations
    assert built["stg_station_status"].count() == 20
    # dim dedup: 5 stations, 2 tariffs
    assert built["dim_stations"].count() == 5
    assert built["dim_tariff"].count() == 2
    # latest-per-key keeps exactly one row per station (W1)
    latest = built["fact_station_status_latest"]
    assert latest.count() == 5
    max_epoch = BASE_EPOCH + 60 * 3
    ts = {r.status_timestamp.timestamp() for r in latest.collect()}
    assert ts == {float(max_epoch)}


def test_safe_cast_null_on_bad_input(runner):
    built = runner.run(["dim_tariff"])
    bad = built["dim_tariff"].filter(F.col("tariff_id") == "season").first()
    assert bad.cost_per_hour is None
    assert bad.duration_minutes == 45


def test_json_nested_paths(runner):
    built = runner.run(["stg_station_information"])
    row = built["stg_station_information"].filter(F.col("station_id") == "st001").first()
    assert row.uri_android == "app://android/1"
    assert row.capacity == 21
    assert row.is_virtual_station is False
    assert abs(row.lat - 59.91) < 1e-9


def test_incremental_idempotent(runner, gbfs_sources, spark):
    built1 = runner.run(["fact_station_status", "fact_station_status_history"])
    n1 = built1["fact_station_status"].count()
    h1 = built1["fact_station_status_history"].count()
    assert n1 == 20 and h1 == 20
    # second run with identical input: anti-join drops everything → no growth
    built2 = runner.run(["fact_station_status", "fact_station_status_history"])
    assert built2["fact_station_status"].count() == n1
    assert built2["fact_station_status_history"].count() == h1
    # new snapshot arrives → exactly 5 new rows appended
    extra = spark.createDataFrame(
        [_status_snapshot(BASE_EPOCH + 600)], RAW_STATUS_SCHEMA
    )
    runner.sources["raw_station_status"] = gbfs_sources["raw_station_status"].union(extra)
    built3 = runner.run(["fact_station_status_history"])
    assert built3["fact_station_status_history"].count() == h1 + 5
    # keys stay unique after the append
    hist = built3["fact_station_status_history"]
    assert hist.select("snapshot_id").distinct().count() == h1 + 5


def test_incremental_full_refresh(runner):
    runner.run(["fact_station_status_history"])
    built = runner.run(["fact_station_status_history"], full_refresh=True)
    assert built["fact_station_status_history"].count() == 20


def test_insert_overwrite_strategy(spark, tmp_path):
    """insert_overwrite rewrites ONLY the partitions present in the new
    batch; untouched partitions survive."""
    import pyspark.sql.functions as SF

    from dbt_repo_spark.plans.runner import ModelRunner, model

    @model(
        "daily_counts",
        deps=("raw_rows",),
        materialized="incremental",
        incremental_strategy="insert_overwrite",
        partition_by=["d"],
    )
    def daily_counts(ctx) -> "DataFrame":
        return ctx["raw_rows"].groupBy("d").agg(SF.count("*").alias("n"))

    catalog = Catalog(spark, str(tmp_path / "wh"))
    day1 = [Row(d="2025-01-01", v=i) for i in range(3)]
    day2 = [Row(d="2025-01-02", v=i) for i in range(5)]
    r = ModelRunner(spark, catalog, {"raw_rows": spark.createDataFrame(day1 + day2)})
    r.add(daily_counts)
    built = r.run()
    assert {(str(x.d), x.n) for x in built["daily_counts"].collect()} == {
        ("2025-01-01", 3),
        ("2025-01-02", 5),
    }
    # reprocess ONLY day 2 with different contents → day 1 untouched
    r.sources["raw_rows"] = spark.createDataFrame(
        [Row(d="2025-01-02", v=i) for i in range(8)]
    )
    built = r.run()
    assert {(str(x.d), x.n) for x in built["daily_counts"].collect()} == {
        ("2025-01-01", 3),
        ("2025-01-02", 8),
    }


def test_partitioned_layout(runner, tmp_path):
    runner.run(["fact_trips"])
    import os

    table_dir = os.path.join(str(tmp_path / "warehouse"), "analytics", "fact_trips")
    parts = [d for d in os.listdir(table_dir) if d.startswith("trip_date=")]
    assert parts, "fact_trips must be hive-partitioned by trip_date"


def test_uptime_and_marts(runner):
    built = runner.run()
    up = built["fact_station_uptime"]
    r = up.filter(F.col("station_id") == "st000").first()
    # st000: i%4==0 → is_renting False → never fully up
    assert r.uptime_pct == 0.0 and r.total_count == 4
    r3 = up.filter(F.col("station_id") == "st003").first()
    assert r3.uptime_pct == 1.0
    avail = built["mart_station_availability"]
    assert avail.count() == 20
    row = avail.first()
    assert row.total_capacity == row.bikes_available + row.docks_available
    metrics = built["mart_trip_metrics"]
    mm = metrics.agg(F.sum("count_mismatched_durations").alias("n")).first()
    assert mm.n == 6  # i in {0,7,14,21,28,35} had duration off by one


def test_mart_uptime_ratios(runner):
    built = runner.run(["mart_station_uptime"])
    mu = built["mart_station_uptime"]
    assert mu.count() == 5
    r = mu.filter(F.col("station_id") == "st000").first()
    assert r.total_snapshots == 4
    assert r.installed_snapshots == 4
    assert r.renting_snapshots == 0
    assert r.pct_time_renting == 0.0


def test_dim_date_spine(runner):
    built = runner.run(["dim_date"])
    dd = built["dim_date"].orderBy("date_key")
    first = dd.first()
    assert first.date_key == dt.date(2025, 1, 1)
    assert first.date_int == "20250101"
    assert first.weekday == 4  # 2025-01-01 is a Wednesday; BQ/Spark 1=Sunday
    # spine is contiguous through today
    n = dd.count()
    span = (dt.date.today() - dt.date(2025, 1, 1)).days + 1
    assert n == span


# ---------------------------------------------------------------------------
# demo models + dbt generic tests (D9-D12)
# ---------------------------------------------------------------------------


@pytest.fixture()
def demo_runner(spark, tmp_path):
    raw_customers = spark.createDataFrame(
        [Row(id=i, first_name=f"F{i}", last_name=f"L{i}") for i in range(1, 6)]
    )
    raw_orders = spark.createDataFrame(
        [
            Row(
                id=i,
                user_id=(i % 5) + 1,
                order_date=dt.date(2025, 1, 1) + dt.timedelta(days=i),
                status=["placed", "shipped", "completed", "return_pending", "returned"][
                    i % 5
                ],
            )
            for i in range(1, 21)
        ]
    )
    catalog = Catalog(spark, str(tmp_path / "wh"))
    r = ModelRunner(
        spark, catalog, {"raw_customers": raw_customers, "raw_orders": raw_orders}
    )
    r.add(*DEMO_MODELS)
    return r


def test_gbfs_staging_schema_tests(runner):
    """The reference's staging schema.yml not_null battery passes on the
    GBFS fixtures (models/staging/schema.yml:9-110)."""
    built = runner.run()
    results = runner.test(built)
    staging = {k: v for k, v in results.items() if k.startswith("stg_")}
    assert len(staging) == 3
    flat = [t for rs in staging.values() for t in rs]
    assert len(flat) >= 18
    failures = [t for t in flat if not t.passed]
    assert not failures, f"staging schema tests failed: {failures}"


def test_demo_dag_and_generic_tests(demo_runner):
    built = demo_runner.run()
    cust = built["customers"]
    assert cust.count() == 5
    assert cust.agg(F.sum("number_of_orders").alias("n")).first().n == 20
    results = demo_runner.test(built)
    flat = [t for rs in results.values() for t in rs]
    assert flat, "demo models must declare generic tests"
    failures = [t for t in flat if not t.passed]
    assert not failures, f"generic tests failed: {failures}"


def test_generic_tests_catch_violations(spark, tmp_path):
    """Negative control: a duplicate PK and an orphan FK must be reported."""
    from dbt_repo_spark.plans.testing import relationships, unique

    dup = spark.createDataFrame([Row(id=1), Row(id=1), Row(id=2)])
    res = unique(dup, "id")
    assert not res.passed and res.violations == 1
    parent = spark.createDataFrame([Row(pk=1)])
    child = spark.createDataFrame([Row(fk=1), Row(fk=99)])
    res = relationships(child, "fk", parent, "pk")
    assert not res.passed and res.violations == 1


def test_merge_strategy_upserts(spark, tmp_path):
    """merge: batch rows replace same-key target rows, new keys insert,
    untouched keys survive; idempotent on re-run."""
    from dbt_repo_spark.plans.runner import ModelRunner, model

    @model(
        "state",
        deps=("raw_rows",),
        materialized="incremental",
        incremental_strategy="merge",
        unique_key="k",
    )
    def state(ctx) -> "DataFrame":
        return ctx["raw_rows"]

    catalog = Catalog(spark, str(tmp_path / "wh"))
    r = ModelRunner(
        spark, catalog,
        {"raw_rows": spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")])},
    )
    r.add(state)
    assert {(x.k, x.v) for x in r.run()["state"].collect()} == {(1, "a"), (2, "b")}
    # k=2 updated, k=3 inserted, k=1 untouched
    r.sources["raw_rows"] = spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c")])
    got = {(x.k, x.v) for x in r.run()["state"].collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    # idempotent: same batch again → same state
    assert {(x.k, x.v) for x in r.run()["state"].collect()} == got


def test_merge_strategy_partition_scoped(spark, tmp_path):
    """Partitioned merge physically rewrites only the partitions the batch
    touches: the untouched partition's files keep their inodes."""
    import os

    from dbt_repo_spark.plans.runner import ModelRunner, model

    @model(
        "part_state",
        deps=("raw_rows",),
        materialized="incremental",
        incremental_strategy="merge",
        unique_key="k",
        partition_by=["d"],
    )
    def part_state(ctx) -> "DataFrame":
        return ctx["raw_rows"]

    catalog = Catalog(spark, str(tmp_path / "wh"))
    r = ModelRunner(
        spark, catalog,
        {"raw_rows": spark.createDataFrame(
            [Row(k=1, v="a", d="2025-01-01"), Row(k=2, v="b", d="2025-01-02")]
        )},
    )
    r.add(part_state)
    r.run()
    tdir = catalog.path("analytics", "part_state")

    def inodes(day):
        p = os.path.join(tdir, f"d={day}")
        return {f: os.stat(os.path.join(p, f)).st_ino
                for f in os.listdir(p) if f.startswith("part-")}

    day1_before = inodes("2025-01-01")
    # batch touches only day 2 (update k=2, insert k=3)
    r.sources["raw_rows"] = spark.createDataFrame(
        [Row(k=2, v="B", d="2025-01-02"), Row(k=3, v="c", d="2025-01-02")]
    )
    got = {(x.k, x.v, str(x.d)) for x in r.run()["part_state"].collect()}
    assert got == {
        (1, "a", "2025-01-01"), (2, "B", "2025-01-02"), (3, "c", "2025-01-02"),
    }
    assert inodes("2025-01-01") == day1_before, "untouched partition was rewritten"


def test_full_dag_runs_parallel_matches_sequential(runner):
    """parallelism>1 materializes independent models concurrently via
    driver threads; results are identical to the sequential run and
    dependency order holds (a model sees its deps materialized)."""
    seq_run = runner.run()
    # materialize the sequential results BEFORE the parallel re-run
    # overwrites the same table files
    seq = {n: df.orderBy(*df.columns).collect() for n, df in seq_run.items()}
    par_run = runner.run(parallelism=4, full_refresh=True)
    assert set(par_run) == set(seq)
    for name, rows in seq.items():
        df = par_run[name]
        assert df.orderBy(*df.columns).collect() == rows, name


def test_store_failures_writes_audit_tables(spark, tmp_path):
    """dbt --store-failures semantics: a failing test materializes its
    violation summary under the audit layer; passing tests write
    nothing; a re-run overwrites with the latest state."""
    from dbt_repo_spark.plans.testing import run_tests

    catalog = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [Row(id=1, st="ok"), Row(id=1, st="ok"), Row(id=2, st="bad")]
    )
    spec = {"id": ["not_null", "unique"], "st": [{"accepted_values": ["ok"]}]}
    results = run_tests(df, spec, catalog=catalog)
    by_name = {r.name: r for r in results}
    assert by_name["not_null:id"].passed
    assert by_name["not_null:id"].stored_at is None
    uq = by_name["unique:id"]
    assert not uq.passed and uq.stored_at == "dbt_test__audit.unique__id"
    stored = catalog.read("dbt_test__audit", "unique__id").collect()
    assert [(r["id"], r["n_duplicates"]) for r in stored] == [(1, 2)]
    av = by_name["accepted_values:st"]
    assert not av.passed and av.stored_at is not None
    bad = catalog.read("dbt_test__audit", "accepted_values__st").collect()
    assert [(r["st"], r["n_rows"]) for r in bad] == [("bad", 1)]
    # fix the data, re-run: audit table is overwritten with... nothing to
    # store (test passes) -- the stale table remains but results say PASS
    fixed = spark.createDataFrame([Row(id=1, st="ok"), Row(id=2, st="ok")])
    results2 = run_tests(fixed, spec, catalog=catalog)
    assert all(r.passed and r.stored_at is None for r in results2)
