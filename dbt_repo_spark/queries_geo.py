"""Geospatial registry queries: radius join, nearest-neighbor join,
grid density, and per-user trajectory distance over synthesized
(lat, lon) points, each with a DuckDB oracle (brute-force cross join
for the blocked joins).

The reference's domain is spatial (GBFS stations + trip endpoints carry
lat/lon end-to-end: /root/reference/models/facts/fact_trips.sql:30-33),
but the driver fixture has no coordinate columns — so these queries
SYNTHESIZE deterministic coordinates from integer keys with pure
integer-arithmetic-then-one-division formulas that are bit-identical in
Spark and DuckDB (exact int64 products/mods, one IEEE division by
1000.0, one exact addition). Customers and suppliers land in a ~111 km x
~156 km region (lat 40-41, lon -74..-72 — Manhattan-ish density) so a
2-5 km radius yields a meaningful but bounded pair count.

The Spark side runs the CELL-BLOCKED scale path (operators/geo.py); the
oracle is the O(|A|x|B|) cross join + haversine — the usual
exact-oracle-vs-scale-path pairing (cf. dedup_ngram_jaccard vs
dedup_pairs_scale). The comparison therefore ALSO proves candidate
COMPLETENESS of the 3x3 cell neighborhood end-to-end, not just distance
arithmetic.

Float parity: both engines evaluate the same IEEE double expression tree
(same literal pi/180 constant, same parenthesization — see
operators/geo.py::haversine_sql); last-ulp trig differences are absorbed
by the 6-dp round that both the filter and the output use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_repo_spark.operators.geo import (
    grid_density,
    haversine_sql,
    multi_fence_assign,
    multi_fence_sql,
    nearest_neighbor_join,
    point_in_polygon,
    point_in_polygon_sql,
    radius_join,
    trip_stats,
)
from dbt_repo_spark.queries import q, t

# lat in [40, 41), lon in [-74, -72): different prime multipliers per
# table decorrelate the two point sets.
CUST_POINTS_SQL = """
    SELECT c_custkey AS pid,
           40.0 + (c_custkey * 7919 % 1000) / 1000.0 AS plat,
           -74.0 + (c_custkey * 104729 % 2000) / 1000.0 AS plon
    FROM customer
"""
SUPP_POINTS_SQL = """
    SELECT s_suppkey AS pid,
           40.0 + (s_suppkey * 104723 % 1000) / 1000.0 AS plat,
           -74.0 + (s_suppkey * 7907 % 2000) / 1000.0 AS plon
    FROM supplier
"""
_HAV = haversine_sql("c.plat", "c.plon", "s.plat", "s.plon")


def _points(
    spark: SparkSession, sf_dir: str, table: str, key: str, m1: int, m2: int
) -> DataFrame:
    k = F.col(key)
    return t(spark, sf_dir, table).select(
        k.alias("id"),
        (F.lit(40.0) + (k * m1 % 1000) / 1000.0).alias("lat"),
        (F.lit(-74.0) + (k * m2 % 2000) / 1000.0).alias("lon"),
    )


def cust_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _points(spark, sf_dir, "customer", "c_custkey", 7919, 104729)


def supp_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _points(spark, sf_dir, "supplier", "s_suppkey", 104723, 7907)


@q(
    "geo_radius_pairs",
    f"""
    WITH c AS ({CUST_POINTS_SQL}), s AS ({SUPP_POINTS_SQL})
    SELECT c.pid AS left_id, s.pid AS right_id,
           round({_HAV}, 6) AS dist_km
    FROM c CROSS JOIN s
    WHERE round({_HAV}, 6) <= 2.0
    """,
)
def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, supplier) point pairs within 2 km — the "stations
    within walking distance" shape. Spark runs the grid-cell blocked
    candidate join with the supplier side BROADCAST (dim-sized): zero
    shuffle of the 9x-replicated probe side, exact haversine verify.
    The oracle's cross join certifies cell-neighborhood completeness.
    """
    return radius_join(
        cust_points(spark, sf_dir),
        supp_points(spark, sf_dir),
        radius_km=2.0,
        max_abs_lat_deg=41.0,
        broadcast_right=True,
    )


@q(
    "geo_nearest_supplier",
    f"""
    WITH c AS ({CUST_POINTS_SQL}), s AS ({SUPP_POINTS_SQL}),
    pairs AS (
      SELECT c.pid AS left_id, s.pid AS right_id,
             round({_HAV}, 6) AS dist_km
      FROM c CROSS JOIN s
      WHERE round({_HAV}, 6) <= 5.0),
    ranked AS (
      SELECT left_id, right_id, dist_km,
             CAST(ROW_NUMBER() OVER (PARTITION BY left_id
                                     ORDER BY dist_km, right_id) AS INTEGER)
               AS nn_rank
      FROM pairs)
    SELECT left_id, right_id, dist_km, nn_rank FROM ranked WHERE nn_rank <= 1
    """,
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier within 5 km per customer (k=1) — the "nearest
    dock to this ride end" shape. Radius-bounded nearest keeps the
    candidate set cell-blocked and the per-customer rank window tiny;
    ties on the rounded distance break by supplier id (deterministic,
    engine-portable cut). Customers with no supplier in range drop out
    (inner semantics) in both engines.
    """
    return nearest_neighbor_join(
        cust_points(spark, sf_dir),
        supp_points(spark, sf_dir),
        radius_km=5.0,
        k=1,
        max_abs_lat_deg=41.0,
        broadcast_right=True,
    )


@q(
    "geo_grid_density",
    f"""
    WITH c AS ({CUST_POINTS_SQL})
    SELECT CAST(floor(plon / 0.05) AS BIGINT) AS cell_x,
           CAST(floor(plat / 0.05) AS BIGINT) AS cell_y,
           COUNT(*) AS n_points,
           round(CAST(SUM(CAST(plat AS DECIMAL(24,9))) AS DOUBLE)
                 / COUNT(*), 6) AS centroid_lat,
           round(CAST(SUM(CAST(plon AS DECIMAL(24,9))) AS DOUBLE)
                 / COUNT(*), 6) AS centroid_lon
    FROM c GROUP BY 1, 2
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-point count + centroid per 0.05-degree map cell — the
    demand-heatmap aggregate. Pure two-phase groupBy on derived integer
    cell ids; centroids via order-independent DECIMAL sums (one final
    double cast + round) so partition merge order can't change values.
    """
    return grid_density(cust_points(spark, sf_dir), cell_deg=0.05)


_TRIP_HAV = haversine_sql("prev_lat", "prev_lon", "plat", "plon")


@q(
    "geo_trip_distance",
    f"""
    WITH p AS (
      SELECT user_id, ts, event_id,
             40.0 + (event_id * 7919 % 1000) / 1000.0 AS plat,
             -74.0 + (event_id * 104729 % 2000) / 1000.0 AS plon
      FROM events),
    l AS (
      SELECT user_id, plat, plon,
             lag(plat) OVER w AS prev_lat, lag(plon) OVER w AS prev_lon
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    legs AS (
      SELECT user_id,
             CAST(round({_TRIP_HAV}, 6) AS DECIMAL(18,6)) AS leg
      FROM l WHERE prev_lat IS NOT NULL)
    SELECT user_id, COUNT(*) AS n_legs,
           CAST(SUM(leg) AS DOUBLE) AS total_km,
           CAST(MAX(leg) AS DOUBLE) AS max_leg_km
    FROM legs GROUP BY user_id
    """,
)
def geo_trip_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory distance over the event stream — consecutive
    ping legs via one lag window (event-time order, event_id tie-break),
    haversine per leg, DECIMAL-exact per-user totals. The trajectory
    composition shape: window + geo + exact aggregation in one plan.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.lit(40.0) + (F.col("event_id") * 7919 % 1000) / 1000.0).alias("lat"),
        (F.lit(-74.0) + (F.col("event_id") * 104729 % 2000) / 1000.0).alias("lon"),
    )
    return trip_stats(
        ev, key="user_id", ts="ts", order_tiebreak="event_id"
    )


# service-area fence: 4-dp vertices against 3-dp synthesized points, so
# no point lies on a vertex latitude (point_in_polygon edge-case note)
FENCE = [
    (40.2005, -73.8005),
    (40.8005, -73.6005),
    (40.9005, -72.9005),
    (40.4005, -72.4005),
    (40.1005, -73.1005),
]
_PIP = point_in_polygon_sql("plat", "plon", FENCE)


@q(
    "geo_fence_containment",
    f"""
    WITH c AS ({CUST_POINTS_SQL})
    SELECT pid AS id, {_PIP} AS inside
    FROM c
    """,
)
def geo_fence_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon geofencing: is each customer point inside the
    service-area pentagon? Ray-cast containment as a pure-arithmetic
    projection (scan-speed, zero shuffles, no libm) — because the
    crossing test is +,-,*,/ only, the DuckDB oracle agrees BIT-FOR-BIT
    with Spark, no rounding contract involved. The polygon rides the
    plan as a literal; many-fence workloads candidate-join via cell
    blocking first (operators/geo.py docstring).
    """
    pts = cust_points(spark, sf_dir)
    return pts.select(
        F.col("id"),
        point_in_polygon(F.col("lat"), F.col("lon"), FENCE).alias("inside"),
    )


def _pentagon(cy: float, cx: float, r: float) -> list[tuple[float, float]]:
    # five cos/sin vertices with a 0.3-rad phase: an UNROTATED regular
    # pentagon has cos(4pi/5) == cos(6pi/5) — a horizontal edge, which
    # multi_fence_assign rejects (ANSI div-by-zero hazard); the phase
    # breaks the symmetry so no two vertices share a latitude
    return [
        (cy + r * _math.cos(2 * _math.pi * k / 5 + 0.3),
         cx + 1.3 * r * _math.sin(2 * _math.pi * k / 5 + 0.3))
        for k in range(5)
    ]


import math as _math  # noqa: E402

# six overlapping service-area pentagons across the point region
FENCES = {
    f: _pentagon(40.15 + 0.13 * f, -73.8 + 0.3 * f, 0.12 + 0.02 * f)
    for f in range(6)
}


@q(
    "geo_multi_fence_assign",
    multi_fence_sql(FENCES, CUST_POINTS_SQL),
)
def geo_multi_fence_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every customer point to the service-area fences containing
    it (many-fence geofencing). Spark runs the SCALE path — bbox-cell
    candidate join against broadcast fence metadata, then the exact
    higher-order ray cast on the candidate residue; the oracle is the
    brute-force |points| x |edges| cross join. Same IEEE arithmetic on
    both sides (bit-exact booleans), so the comparison also certifies
    bbox-cell candidate COMPLETENESS end-to-end, exactly like the
    radius join's oracle.
    """
    return multi_fence_assign(
        cust_points(spark, sf_dir), FENCES, cell_deg=0.25
    )


@q(
    "geo_dbscan_clusters",
    f"""
    WITH RECURSIVE c AS ({CUST_POINTS_SQL}),
    cells AS (
      SELECT CAST(floor(plon / 0.05) AS BIGINT) AS cx,
             CAST(floor(plat / 0.05) AS BIGINT) AS cy,
             CAST(COUNT(*) AS BIGINT) AS n_points
      FROM c GROUP BY 1, 2),
    dense AS (
      SELECT cx, cy, n_points,
             (cx + 4000) * 10000 + (cy + 4000) AS cell_id
      FROM cells WHERE n_points >= 2),
    edges AS (
      SELECT a.cell_id AS s, b.cell_id AS d
      FROM dense a
      JOIN (SELECT unnest([-1, 0, 1]) AS dx) ux ON TRUE
      JOIN (SELECT unnest([-1, 0, 1]) AS dy) uy ON TRUE
      JOIN dense b ON b.cx = a.cx + ux.dx AND b.cy = a.cy + uy.dy
      WHERE NOT (ux.dx = 0 AND uy.dy = 0)),
    cc(node, label) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.d, cc.label FROM cc JOIN edges e ON e.s = cc.node),
    lab AS (SELECT node, MIN(label) AS label FROM cc GROUP BY node),
    member AS (
      SELECT dense.cx, dense.cy, dense.n_points,
             COALESCE(lab.label, dense.cell_id) AS cluster_id
      FROM dense LEFT JOIN lab ON lab.node = dense.cell_id)
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(n_points) AS BIGINT) AS n_points,
           MIN(cx) AS min_cx, MAX(cx) AS max_cx,
           MIN(cy) AS min_cy, MAX(cy) AS max_cy
    FROM member GROUP BY cluster_id
    """,
)
def geo_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN spatial clustering: dense 0.05°-cells (≥2 points)
    merged across 8-neighborhoods by connected components — the
    density-based clustering shape (DBSCAN at cell granularity: the
    grid is the epsilon-neighborhood index, min-points is the core
    test, CC is the reachability closure). Composes geo.with_cell's
    blocking grid with graph.connected_components' min-label
    propagation; non-dense cells are noise by definition.

    Scale: the points relation collapses to the CELL relation (one
    hash-agg) before anything quadratic could appear; the 8-neighbor
    edge join runs on the DENSE-cell relation keyed by (cx, cy) — at
    100 TB that relation is area-bounded, not point-bounded. All
    integers end-to-end → full oracle (recursive min-label CTE).
    """
    from dbt_repo_spark.operators.graph import connected_components

    pts = cust_points(spark, sf_dir)
    cells = (
        pts.groupBy(
            F.floor(F.col("lon") / 0.05).cast("long").alias("cx"),
            F.floor(F.col("lat") / 0.05).cast("long").alias("cy"),
        )
        .agg(F.count("*").alias("n_points"))
    )
    dense = (
        cells.filter(F.col("n_points") >= 2)
        .withColumn(
            "cell_id", (F.col("cx") + 4000) * 10000 + (F.col("cy") + 4000)
        )
        .localCheckpoint(eager=True)
    )
    deltas = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    nb = dense.select(
        "cell_id",
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in deltas])
        ).alias("dd"),
        "cx",
        "cy",
    ).select(
        F.col("cell_id").alias("s"),
        (F.col("cx") + F.col("dd.dx")).alias("nx"),
        (F.col("cy") + F.col("dd.dy")).alias("ny"),
    )
    edges = nb.join(
        dense.select(
            F.col("cx").alias("nx"), F.col("cy").alias("ny"),
            F.col("cell_id").alias("d"),
        ),
        ["nx", "ny"],
    ).select("s", "d")
    lab = connected_components(edges, src="s", dst="d")
    member = dense.join(
        lab, dense["cell_id"] == lab["node"], "left"
    ).select(
        "cx",
        "cy",
        "n_points",
        F.coalesce(F.col("cluster_id"), F.col("cell_id")).alias("cid"),
    )
    return member.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count("*").alias("n_cells"),
        F.sum("n_points").cast("long").alias("n_points"),
        F.min("cx").alias("min_cx"),
        F.max("cx").alias("max_cx"),
        F.min("cy").alias("min_cy"),
        F.max("cy").alias("max_cy"),
    )
