"""The reference's 15 GBFS models re-expressed as DataFrame builders.

Each function cites the dbt model it re-implements (path relative to
/root/reference/). Layer/materialization mirror dbt_project.yml:41-77:
src = ephemeral, staging = view, dimensions/facts/marts = table, the two
fact_station_status* = incremental on snapshot_id.

Spark-first notes: staging models stay lazy (ephemeral src folds into one
Catalyst plan → cross-model predicate pushdown); dims are small → broadcast
side of fact joins; facts partition by status_date and cluster by
station_id, mirroring the reference's BigQuery DAY-partition + clustering
(src/realtime_pubsub_to_spark.py:204-205) so date predicates prune
partitions and station lookups skip row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_repo_spark.functions import (
    countif,
    format_date,
    generate_date_array,
    json_extract,
    json_extract_array,
    json_extract_scalar,
    safe_cast,
    safe_divide,
    timestamp_diff,
    timestamp_trunc,
)
from dbt_repo_spark.plans.runner import model


@model(
    "stg_station_status",
    deps=("raw_station_status",),
    materialized="view",
    layer="stg",
    tests={
        c: ["not_null"]
        for c in (
            "station_id",
            "reported_at",
            "bikes_available",
            "docks_available",
            "feed_updated_at",
            "ingest_at",
        )
    },  # models/staging/schema.yml:9-30
)
def stg_station_status(ctx) -> DataFrame:
    """models/staging/stg_station_status.sql — explode data.stations,
    epoch→timestamp conversions."""
    raw = ctx["raw_station_status"]
    src = raw.select(
        "ingest_datetime",
        F.col("last_updated").alias("feed_last_updated"),
        "ttl",
        "version",
        F.explode("data.stations").alias("s"),
    ).select("ingest_datetime", "feed_last_updated", "ttl", "version", "s.*")
    return src.select(
        "station_id",
        F.timestamp_seconds("last_reported").alias("reported_at"),
        F.col("num_bikes_available").alias("bikes_available"),
        F.col("num_docks_available").alias("docks_available"),
        "is_installed",
        "is_renting",
        "is_returning",
        F.col("ingest_datetime").alias("ingest_at"),
        F.timestamp_seconds("feed_last_updated").alias("feed_updated_at"),
        "version",
        "ttl",
    )


@model(
    "stg_station_information",
    deps=("raw_station_information",),
    materialized="view",
    layer="stg",
    tests={
        c: ["not_null"]
        for c in ("station_id", "feed_updated_at", "station_name", "lat", "lon")
    },  # models/staging/schema.yml:43-60
)
def stg_station_information(ctx) -> DataFrame:
    """models/staging/stg_station_information.sql — JSON-string path
    extraction (json_extract_array + json_extract_scalar incl. nested
    $.rental_uris.*)."""
    raw = ctx["raw_station_information"]
    exploded = raw.select(
        "ingest_datetime",
        F.col("last_updated").alias("feed_last_updated"),
        "ttl",
        "version",
        F.explode(json_extract_array("data_json", "$.stations")).alias("station_json"),
    )
    return exploded.select(
        "ingest_datetime",
        F.timestamp_seconds("feed_last_updated").alias("feed_updated_at"),
        "ttl",
        "version",
        json_extract_scalar("station_json", "$.station_id").alias("station_id"),
        json_extract_scalar("station_json", "$.name").alias("station_name"),
        json_extract_scalar("station_json", "$.lat").cast("double").alias("lat"),
        json_extract_scalar("station_json", "$.lon").cast("double").alias("lon"),
        json_extract_scalar("station_json", "$.address").alias("address"),
        json_extract_scalar("station_json", "$.cross_street").alias("cross_street"),
        json_extract_scalar("station_json", "$.capacity").cast("long").alias("capacity"),
        (json_extract_scalar("station_json", "$.is_virtual_station") == "true").alias(
            "is_virtual_station"
        ),
        json_extract_scalar("station_json", "$.rental_uris.android").alias("uri_android"),
        json_extract_scalar("station_json", "$.rental_uris.ios").alias("uri_ios"),
        json_extract_scalar("station_json", "$.rental_uris.web").alias("uri_web"),
    )


@model("stg_station_tariffs", deps=("raw_station_information",), materialized="view", layer="stg")
def stg_station_tariffs(ctx) -> DataFrame:
    """models/staging/stg_station_tariffs.sql — nested JSON array explode
    + safe_cast (NULL on bad input)."""
    raw = ctx["raw_station_information"]
    exploded = raw.select(
        "ingest_datetime",
        F.explode(json_extract_array(json_extract("data_json", "$.tariffs"))).alias(
            "tariff_json"
        ),
    )
    return exploded.select(
        "ingest_datetime",
        json_extract_scalar("tariff_json", "$.tariff_id").alias("tariff_id"),
        json_extract_scalar("tariff_json", "$.name").alias("tariff_name"),
        safe_cast(json_extract_scalar("tariff_json", "$.cost_per_hour"), "double").alias(
            "cost_per_hour"
        ),
        json_extract_scalar("tariff_json", "$.currency").alias("currency"),
        safe_cast(
            json_extract_scalar("tariff_json", "$.duration_minutes"), "long"
        ).alias("duration_minutes"),
    )


@model(
    "stg_historic_trips",
    deps=("raw_historic_trips",),
    materialized="view",
    layer="stg",
    tests={
        c: ["not_null"]
        for c in (
            "started_at",
            "ended_at",
            "duration_s",
            "computed_duration_s",
            "start_station_id",
            "end_station_id",
            "trip_date",
        )
    },  # models/staging/schema.yml:81-110
)
def stg_historic_trips(ctx) -> DataFrame:
    """models/staging/stg_historic_trips.sql — projection + derived
    date/hour/computed-duration columns."""
    src = ctx["raw_historic_trips"].select(
        "started_at",
        "ended_at",
        F.col("duration").alias("duration_s"),
        "start_station_id",
        "start_station_name",
        "start_station_description",
        F.col("start_station_latitude").alias("start_lat"),
        F.col("start_station_longitude").alias("start_lon"),
        "end_station_id",
        "end_station_name",
        "end_station_description",
        F.col("end_station_latitude").alias("end_lat"),
        F.col("end_station_longitude").alias("end_lon"),
    )
    return src.select(
        "*",
        F.to_date("started_at").alias("trip_date"),
        timestamp_trunc("started_at", "hour").alias("trip_hour"),
        timestamp_diff("ended_at", "started_at", "second").alias("computed_duration_s"),
    )


@model("dim_stations", deps=("stg_station_information",), materialized="table")
def dim_stations(ctx) -> DataFrame:
    """models/dimensions/dim_stations.sql — SELECT DISTINCT current dim."""
    return (
        ctx["stg_station_information"]
        .select(
            "station_id",
            "station_name",
            "lat",
            "lon",
            "address",
            "cross_street",
            "capacity",
            "is_virtual_station",
            "uri_android",
            "uri_ios",
            "uri_web",
        )
        .distinct()
        .orderBy("station_id")
    )


@model("dim_date", deps=("stg_station_status",), materialized="table")
def dim_date(ctx) -> DataFrame:
    """models/dimensions/dim_date.sql — scalar-subquery bound + coalesce
    fallback + generate_date_array spine + calendar attributes."""
    status = ctx["stg_station_status"]
    bounds = status.agg(
        F.coalesce(
            F.min(F.to_date("feed_updated_at")),
            F.add_months(F.current_date(), -12),
        ).alias("start_date"),
        F.current_date().alias("end_date"),
    )
    days = bounds.select(
        F.explode(generate_date_array("start_date", "end_date")).alias("day")
    )
    return days.select(
        F.col("day").alias("date_key"),
        F.year("day").alias("year"),
        F.month("day").alias("month"),
        F.dayofmonth("day").alias("day_of_month"),
        F.dayofweek("day").alias("weekday"),  # 1=Sunday..7=Saturday, matches BQ
        format_date("%Y%m%d", "day").alias("date_int"),
    ).orderBy("date_key")


@model("dim_tariff", deps=("stg_station_tariffs",), materialized="table")
def dim_tariff(ctx) -> DataFrame:
    """models/dimensions/dim_tariff.sql — GROUP BY all columns dedup."""
    return (
        ctx["stg_station_tariffs"]
        .select("tariff_id", "tariff_name", "cost_per_hour", "currency", "duration_minutes")
        .distinct()
    )


def _with_snapshot_id(df: DataFrame) -> DataFrame:
    # md5(concat(cast(feed_updated_at as string), station_id)) —
    # fact_station_status.sql:9. Canonical timestamp rendering pinned to
    # 'yyyy-MM-dd HH:mm:ss' (SURVEY.md §7.3 risk 2).
    return df.withColumn(
        "snapshot_id",
        F.md5(
            F.concat(
                F.date_format("feed_updated_at", "yyyy-MM-dd HH:mm:ss"),
                F.col("station_id"),
            )
        ),
    )


@model(
    "fact_station_status",
    deps=("stg_station_status", "stg_station_information"),
    materialized="incremental",
    unique_key="snapshot_id",
    partition_by=["status_date"],
    cluster_by=["station_id"],
)
def fact_station_status(ctx) -> DataFrame:
    """models/facts/fact_station_status.sql — surrogate key + LEFT join to
    info flag + incremental NOT-IN (handled by the runner's anti-join)."""
    s = _with_snapshot_id(ctx["stg_station_status"])
    i = ctx["stg_station_information"].select("station_id", "is_virtual_station")
    return (
        s.join(F.broadcast(i), "station_id", "left")
        .select(
            "snapshot_id",
            F.col("feed_updated_at").alias("status_timestamp"),
            F.to_date("feed_updated_at").alias("status_date"),
            timestamp_trunc("feed_updated_at", "hour").alias("status_hour"),
            "station_id",
            "bikes_available",
            "docks_available",
            F.coalesce("is_virtual_station", F.lit(False)).alias("is_virtual_station"),
        )
    )


@model(
    "fact_station_status_history",
    deps=("stg_station_status",),
    materialized="incremental",
    unique_key="snapshot_id",
    partition_by=["status_date"],
    cluster_by=["station_id"],
)
def fact_station_status_history(ctx) -> DataFrame:
    """models/facts/fact_station_status_history.sql — incremental append
    of full status snapshots."""
    s = _with_snapshot_id(ctx["stg_station_status"])
    return s.select(
        "snapshot_id",
        F.col("feed_updated_at").alias("status_timestamp"),
        F.to_date("feed_updated_at").alias("status_date"),
        timestamp_trunc("feed_updated_at", "hour").alias("status_hour"),
        "station_id",
        "bikes_available",
        "docks_available",
        "is_installed",
        "is_renting",
        "is_returning",
    )


@model("fact_station_status_latest", deps=("stg_station_status",), materialized="view")
def fact_station_status_latest(ctx) -> DataFrame:
    """models/facts/fact_station_status_latest.sql — W1 latest-per-station
    (row_number over feed_updated_at desc, rn=1)."""
    s = _with_snapshot_id(ctx["stg_station_status"])
    w = Window.partitionBy("station_id").orderBy(F.col("feed_updated_at").desc())
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "snapshot_id",
            F.col("feed_updated_at").alias("status_timestamp"),
            F.to_date("feed_updated_at").alias("status_date"),
            timestamp_trunc("feed_updated_at", "hour").alias("status_hour"),
            "station_id",
            "bikes_available",
            "docks_available",
            "is_installed",
            "is_renting",
            "is_returning",
        )
    )


@model(
    "fact_trips",
    deps=("stg_historic_trips",),
    materialized="table",
    partition_by=["trip_date"],
    cluster_by=["start_station_id"],
)
def fact_trips(ctx) -> DataFrame:
    """models/facts/fact_trips.sql — md5-of-concat trip surrogate key."""
    src = ctx["stg_historic_trips"].withColumn(
        "trip_id",
        F.md5(
            F.concat(
                F.date_format("started_at", "yyyy-MM-dd HH:mm:ss"),
                F.date_format("ended_at", "yyyy-MM-dd HH:mm:ss"),
                F.col("start_station_id").cast("string"),
                F.col("end_station_id").cast("string"),
            )
        ),
    )
    return src.select(
        "trip_id",
        "started_at",
        "ended_at",
        F.col("duration_s").alias("raw_duration_s"),
        "computed_duration_s",
        "trip_date",
        "trip_hour",
        "start_station_id",
        "end_station_id",
        "start_lat",
        "start_lon",
        "end_lat",
        "end_lon",
    )


@model("fact_station_uptime", deps=("stg_station_status",), materialized="table")
def fact_station_uptime(ctx) -> DataFrame:
    """models/facts/fact_station_uptime.sql — boolean-conjunction up_flag,
    daily groupBy + safe_divide ratio."""
    flagged = ctx["stg_station_status"].select(
        "station_id",
        F.to_date("feed_updated_at").alias("status_date"),
        F.when(
            F.col("is_installed") & F.col("is_renting") & F.col("is_returning"), 1
        )
        .otherwise(0)
        .alias("up_flag"),
        F.lit(1).alias("record_count"),
    )
    return flagged.groupBy("station_id", "status_date").agg(
        F.sum("up_flag").alias("up_count"),
        F.sum("record_count").alias("total_count"),
        safe_divide(F.sum("up_flag"), F.sum("record_count")).alias("uptime_pct"),
    )


@model("mart_station_availability", deps=("fact_station_status", "dim_stations"), materialized="table")
def mart_station_availability(ctx) -> DataFrame:
    """models/marts/mart_station_availability.sql — fact ⋈ dim + nullif
    division guard + round."""
    fs = ctx["fact_station_status"]
    ds = ctx["dim_stations"]
    total = F.col("bikes_available") + F.col("docks_available")
    return fs.join(F.broadcast(ds), "station_id").select(
        F.col("status_date").alias("date_key"),
        F.col("status_hour").alias("hour_key"),
        "station_id",
        "station_name",
        "lat",
        "lon",
        "bikes_available",
        "docks_available",
        total.alias("total_capacity"),
        F.round(F.col("bikes_available") / F.nullif(total, F.lit(0)), 3).alias(
            "pct_bikes_available"
        ),
    )


@model("mart_station_uptime", deps=("fact_station_status_history",), materialized="table")
def mart_station_uptime(ctx) -> DataFrame:
    """models/marts/mart_station_uptime.sql — countif family + ratios."""
    s = ctx["fact_station_status_history"]
    return s.groupBy("station_id").agg(
        F.count("*").alias("total_snapshots"),
        countif(F.col("is_installed")).alias("installed_snapshots"),
        countif(F.col("is_renting")).alias("renting_snapshots"),
        countif(F.col("is_returning")).alias("returning_snapshots"),
        F.round(countif(F.col("is_renting")) / F.count("*"), 3).alias("pct_time_renting"),
        F.round(countif(F.col("is_returning")) / F.count("*"), 3).alias(
            "pct_time_returning"
        ),
    )


@model("mart_trip_metrics", deps=("fact_trips",), materialized="table")
def mart_trip_metrics(ctx) -> DataFrame:
    """models/marts/mart_trip_metrics.sql — avg durations + the
    reported-vs-computed mismatch counter."""
    tdf = ctx["fact_trips"]
    return tdf.groupBy(
        F.col("trip_date").alias("date_key"),
        F.col("start_station_id").alias("station_id"),
    ).agg(
        F.count("*").alias("total_trips_started"),
        F.avg("raw_duration_s").alias("avg_reported_duration_s"),
        F.avg("computed_duration_s").alias("avg_computed_duration_s"),
        F.sum(
            F.when(F.col("raw_duration_s") != F.col("computed_duration_s"), 1).otherwise(0)
        ).alias("count_mismatched_durations"),
    )


GBFS_MODELS = [
    stg_station_status,
    stg_station_information,
    stg_station_tariffs,
    stg_historic_trips,
    dim_stations,
    dim_date,
    dim_tariff,
    fact_station_status,
    fact_station_status_history,
    fact_station_status_latest,
    fact_trips,
    fact_station_uptime,
    mart_station_availability,
    mart_station_uptime,
    mart_trip_metrics,
]
