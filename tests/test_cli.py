"""CLI end-to-end: ingest-trips → run (partial DAG w/ skips) → test."""

from __future__ import annotations

from dbt_repo_spark.__main__ import main

HEADER = (
    "started_at,ended_at,duration,start_station_id,start_station_name,"
    "start_station_description,start_station_latitude,start_station_longitude,"
    "end_station_id,end_station_name,end_station_description,"
    "end_station_latitude,end_station_longitude"
)


def _row(i: int) -> str:
    mm = 1 + (i % 28)
    return (
        f"2025-01-{mm:02d} 04:{i % 60:02d}:00.000000+00:00,"
        f"2025-01-{mm:02d} 04:{i % 60:02d}:{30 + i % 30:02d}.000000+00:00,"
        f"{30 + i % 30},{100 + i % 3},Station {i % 3},desc,59.9,10.7,"
        f"{200 + i % 4},End {i % 4},desc,59.95,10.75"
    )


def test_cli_ingest_run_test(spark, tmp_path, capsys):
    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    (csv_dir / "01_2025.csv").write_text(
        "\n".join([HEADER, *[_row(i) for i in range(25)]])
    )
    wh = str(tmp_path / "wh")

    rc = main(["ingest-trips", "--csv", str(csv_dir / "*.csv"), "--warehouse", wh])
    assert rc == 0
    assert "raw.historic_trips: 25 rows" in capsys.readouterr().out

    rc = main(["run", "--warehouse", wh])
    captured = capsys.readouterr()
    assert rc == 0
    assert "OK table        fact_trips" in captured.out
    assert "OK table        mart_trip_metrics" in captured.out
    # GBFS status feeds were never ingested → those models skip, not crash
    assert "fact_station_status" in captured.err

    rc = main(["run", "--warehouse", wh, "--select", "fact_trips"])
    assert rc == 0

    rc = main(["test", "--warehouse", wh])
    assert rc == 0  # no FAILing declared tests on the trips subtree


def test_cli_stream_available_now(spark, tmp_path):
    import json

    payload = {
        "last_updated": 1735700000,
        "ttl": 60,
        "version": "2.3",
        "data": {
            "stations": [
                {
                    "station_id": "st000",
                    "last_reported": 1735699990,
                    "num_bikes_available": 3,
                    "num_docks_available": 17,
                    "is_installed": True,
                    "is_renting": True,
                    "is_returning": True,
                }
            ]
        },
    }
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.json").write_text(json.dumps(payload))
    rc = main(
        [
            "stream",
            "--landing",
            str(landing),
            "--out",
            str(tmp_path / "out"),
            "--checkpoint",
            str(tmp_path / "ckpt"),
            "--available-now",
        ]
    )
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 1 and out.first().station_id == "st000"
