"""Geospatial operators: haversine distance, grid-cell bucketed radius
joins, and nearest-neighbor joins over (lat, lon) point columns.

The reference carries station coordinates through its whole model chain
(`/root/reference/models/facts/fact_trips.sql:30-33` start/end lat+lon,
`/root/reference/models/staging/stg_station_information.sql` station
lat/lon) — a bike-share analytics platform whose obvious next queries
("stations within walking distance", "nearest dock to this ride end",
"demand per map cell") are spatial. This module supplies that family as
first-class engine operators.

Scale design (100 TB of GPS points):
- The naive "points within R km of each other" query is a cross join —
  O(|A|x|B|) distance evaluations. The scale path here is GRID-CELL
  BLOCKING: bucket every point into a square cell of side >= the search
  radius (in degrees, sized conservatively for the worst latitude in the
  data), replicate each LEFT point into its 3x3 cell neighborhood, and
  equi-join on the cell id. Any pair within R km lands in the same or an
  adjacent cell, so the candidate join is COMPLETE (proof in
  `cell_size_deg`); candidates are then verified with the exact
  haversine. The shuffle is keyed on cell ids — work is proportional to
  points x local density, never |A|x|B|.
- The 3x3 replication is on the PROBE side only (9x one side, not both),
  and the build side can be broadcast when it is a dim-sized station
  table — the common case in the reference's domain.
- Skewed cells (a depot with 1e6 points in one cell) inherit the same
  mitigation as every other hot-key join here: AQE skew-join splitting,
  or pre-salting the heavy cell — the cell id is an ordinary join key.

Float parity note (for the DuckDB oracles in queries_geo.py): both
engines compute in IEEE doubles; trig libraries may differ in the last
ulp, so oracle-checked outputs ROUND distances to 6 dp (sub-millimeter)
and order by the rounded value with an id tie-break — the same
established rounding contract as the similarity operators.

Limitations (documented, not silently wrong): cell blocking assumes
lon in (-180+cell, 180-cell) — no antimeridian wrap (the replicated
neighbor cells do not wrap modulo 360); latitudes must satisfy
|lat| <= max_abs_lat_deg so the longitude cell width is conservative.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact double literal of pi/180 — both engines multiply by the SAME
# constant (builtin radians() differs in operation order across engines)
DEG2RAD = 0.017453292519943295
EARTH_RADIUS_KM = 6371.0088
# 1 degree of latitude is ~110.574 km; using 110.0 OVERESTIMATES the
# degrees spanned by a given km radius, which keeps cell blocking
# conservative (complete).
KM_PER_DEG_LAT_FLOOR = 110.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (lat, lon) points (degrees).

    2R * asin(sqrt(sin^2(dphi/2) + cos(phi1)*cos(phi2)*sin^2(dlam/2))) —
    the numerically stable form for small distances (the dominant regime
    in radius joins; the law-of-cosines form loses all precision under
    ~1 km). Parenthesization mirrors the SQL oracle fragment exactly so
    both engines run the same IEEE operation sequence.
    """
    phi1 = lat1 * DEG2RAD
    phi2 = lat2 * DEG2RAD
    sdphi = F.sin((phi2 - phi1) * 0.5)
    sdlam = F.sin((lon2 - lon1) * DEG2RAD * 0.5)
    a = (sdphi * sdphi) + (F.cos(phi1) * F.cos(phi2)) * (sdlam * sdlam)
    return F.asin(F.sqrt(a)) * (2.0 * EARTH_RADIUS_KM)


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB SQL fragment computing the same haversine as `haversine_km`
    (same constants, same parenthesization)."""
    p1 = f"({lat1} * {DEG2RAD!r})"
    p2 = f"({lat2} * {DEG2RAD!r})"
    sdphi = f"sin(({p2} - {p1}) * 0.5)"
    sdlam = f"sin(({lon2} - {lon1}) * {DEG2RAD!r} * 0.5)"
    a = f"(({sdphi} * {sdphi}) + (cos({p1}) * cos({p2})) * ({sdlam} * {sdlam}))"
    return f"(asin(sqrt({a})) * {2.0 * EARTH_RADIUS_KM!r})"


def cell_size_deg(radius_km: float, max_abs_lat_deg: float = 66.0) -> float:
    """Square blocking-cell side (degrees) that makes the 3x3 candidate
    neighborhood COMPLETE for a `radius_km` search.

    Completeness: two points within R km differ by at most
    R / 110.574 deg of latitude and at most
    R / (111.320 * cos(max_abs_lat)) deg of longitude (longitude shrinks
    by cos(lat); using the worst latitude in the data bounds every row).
    Both are < cell for cell = R / (110.0 * cos(max_abs_lat)), so the
    pair's cell coordinates differ by at most 1 in each axis — i.e. the
    right point is always inside the left point's 3x3 neighborhood.
    """
    if not 0 < max_abs_lat_deg < 90:
        raise ValueError("max_abs_lat_deg must be in (0, 90)")
    return radius_km / (KM_PER_DEG_LAT_FLOOR * math.cos(max_abs_lat_deg * DEG2RAD))


def with_cell(df: DataFrame, lat: str, lon: str, cell_deg: float) -> DataFrame:
    """Attach integer grid-cell coordinates (`cell_x`, `cell_y`)."""
    return df.withColumn(
        "cell_x", F.floor(F.col(lon) / cell_deg).cast("long")
    ).withColumn("cell_y", F.floor(F.col(lat) / cell_deg).cast("long"))


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_cols: tuple[str, str, str] = ("id", "lat", "lon"),
    right_cols: tuple[str, str, str] = ("id", "lat", "lon"),
    max_abs_lat_deg: float = 66.0,
    broadcast_right: bool = False,
) -> DataFrame:
    """All (left, right) pairs within `radius_km`, via grid-cell blocking.

    Output: (left_id, right_id, dist_km) with dist_km rounded to 6 dp
    (the filter is on the ROUNDED value so output and predicate agree,
    and so the result is reproducible across trig libraries).

    The left side replicates into its 3x3 cell neighborhood (explode of
    a 9-element literal offset array — no shuffle by itself); the right
    side is keyed by its own single cell. The equi-join on (cell_x,
    cell_y) is an ordinary shuffle (or broadcast) hash join; the exact
    haversine then verifies candidates. Set `broadcast_right` when the
    right side is dim-sized (stations), which removes the shuffle of the
    replicated left entirely.
    """
    lid, llat, llon = left_cols
    rid, rlat, rlon = right_cols
    cell = cell_size_deg(radius_km, max_abs_lat_deg)

    l = with_cell(
        left.select(
            F.col(lid).alias("left_id"),
            F.col(llat).alias("_llat"),
            F.col(llon).alias("_llon"),
        ),
        "_llat",
        "_llon",
        cell,
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    l9 = (
        l.withColumn("_o", F.explode(offsets))
        .withColumn("cell_x", F.col("cell_x") + F.col("_o.dx"))
        .withColumn("cell_y", F.col("cell_y") + F.col("_o.dy"))
        .drop("_o")
    )
    r = with_cell(
        right.select(
            F.col(rid).alias("right_id"),
            F.col(rlat).alias("_rlat"),
            F.col(rlon).alias("_rlon"),
        ),
        "_rlat",
        "_rlon",
        cell,
    )
    if broadcast_right:
        r = F.broadcast(r)
    d = F.round(
        haversine_km(F.col("_llat"), F.col("_llon"), F.col("_rlat"), F.col("_rlon")),
        6,
    )
    return (
        l9.join(r, ["cell_x", "cell_y"])
        .withColumn("dist_km", d)
        .filter(F.col("dist_km") <= radius_km)
        .select("left_id", "right_id", "dist_km")
    )


def nearest_neighbor_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    k: int = 1,
    left_cols: tuple[str, str, str] = ("id", "lat", "lon"),
    right_cols: tuple[str, str, str] = ("id", "lat", "lon"),
    max_abs_lat_deg: float = 66.0,
    broadcast_right: bool = False,
) -> DataFrame:
    """Top-k nearest right points within `radius_km` of each left point.

    Radius-bounded by design: an UNBOUNDED nearest-neighbor would need
    expanding ring searches (state per point, unbounded candidate cost at
    100 TB); bounding by a business-meaningful radius ("walking
    distance") keeps the candidate join the same complete cell-blocked
    equi-join as `radius_join`, followed by a per-left-point rank window
    over only the surviving candidates. Left points with no neighbor in
    range are absent from the output (inner semantics — the caller
    left-joins back if gaps matter). Ties on the 6-dp-rounded distance
    break by right_id, making the cut deterministic and engine-portable.
    """
    from pyspark.sql import Window

    pairs = radius_join(
        left,
        right,
        radius_km,
        left_cols,
        right_cols,
        max_abs_lat_deg,
        broadcast_right,
    )
    w = Window.partitionBy("left_id").orderBy(
        F.col("dist_km").asc(), F.col("right_id").asc()
    )
    return (
        pairs.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("left_id", "right_id", "dist_km", "nn_rank")
    )


def point_in_polygon(
    lat: Column, lon: Column, polygon: list[tuple[float, float]]
) -> Column:
    """Ray-casting containment test against a FIXED polygon literal
    ((lat, lon) vertices, any simple polygon, no antimeridian wrap).

    Compiles to a chain of per-edge crossing terms summed and checked
    for odd parity — pure +,-,*,/ and comparisons, all whole-stage
    codegen, no UDF and (unlike the haversine path) NO libm calls: the
    crossing arithmetic is IEEE-exact, so Spark and an oracle engine
    evaluating the same expression agree bit-for-bit with no rounding
    contract needed. The polygon is a broadcast-free literal (a
    service-area fence is bytes, not a table); for MANY fences, join
    points to fences via `with_cell` blocking on fence bounding boxes,
    then apply this test per candidate.

    Geometric edge cases: points exactly ON an edge or vertex get an
    arbitrary but deterministic side. Callers with adversarial
    coincidences should nudge fence vertices off the data's coordinate
    grid (the registry query uses 4-dp vertices against 3-dp points, so
    no point ever lies on a vertex latitude).
    """
    crossings: Column | None = None
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        # both edge deltas are precomputed in PYTHON doubles: an oracle
        # engine folding a literal-literal subtraction in exact decimal
        # (DuckDB does) would otherwise differ from the IEEE fold in the
        # last ulp, breaking the bit-parity contract
        dx, dy = x2 - x1, y2 - y1
        cond = ((F.lit(y1) > lat) != (F.lit(y2) > lat)) & (
            lon < F.lit(dx) * (lat - F.lit(y1)) / F.lit(dy) + F.lit(x1)
        )
        term = F.when(cond, F.lit(1)).otherwise(F.lit(0))
        crossings = term if crossings is None else crossings + term
    return (crossings % 2) == 1


def point_in_polygon_sql(
    lat: str, lon: str, polygon: list[tuple[float, float]]
) -> str:
    """SQL fragment evaluating the same ray cast as `point_in_polygon`
    (same literals, same operation order — bit-identical results)."""
    terms = []
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        dx, dy = x2 - x1, y2 - y1  # Python IEEE folds, same as the Column path
        cond = (
            f"(({y1!r} > {lat}) <> ({y2!r} > {lat})) AND "
            f"({lon} < {dx!r} * ({lat} - {y1!r}) / {dy!r} + {x1!r})"
        )
        terms.append(f"(CASE WHEN {cond} THEN 1 ELSE 0 END)")
    return f"(({' + '.join(terms)}) % 2 = 1)"


def multi_fence_assign(
    points: DataFrame,
    fences: dict[int, list[tuple[float, float]]],
    cell_deg: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Assign points to the fences that contain them — the MANY-fence
    scale path `point_in_polygon` documents: a workload with thousands
    of service areas cannot run one literal predicate per fence.

    Plan shape: each fence precomputes (in Python — fences are
    dim-sized metadata) its edge table and the set of grid cells its
    bounding box covers; points derive their single cell; the
    candidate join is a plain equi-join on (cell_x, cell_y) against the
    broadcast fence-cell relation — a point is only ever tested against
    fences whose bbox shares its cell, so work scales with points x
    local fence density, never |points| x |fences|. The exact ray cast
    then runs as a higher-order aggregate over the fence's edge array
    (interpreted, not codegen — fine on the candidate-filtered
    residue; the crossing arithmetic is identical IEEE ops to the SQL
    oracle, so parity is bit-exact).

    Horizontal edges are REJECTED at build time: the straddle guard
    (y1>p) != (y2>p) is false for them, but AND evaluation order is not
    guaranteed in SQL, so dy=0 could still divide by zero under an
    ANSI engine. Output: (id, fence_id) for every containing fence
    (overlapping fences yield multiple rows; unfenced points none).
    """
    spark = points.sparkSession
    fence_rows = []
    cell_rows = []
    for fid, poly in fences.items():
        n = len(poly)
        edges = []
        for i in range(n):
            y1, x1 = poly[i]
            y2, x2 = poly[(i + 1) % n]
            if y2 == y1:
                raise ValueError(f"fence {fid}: horizontal edge at vertex {i}")
            edges.append((y1, x1, y2, x2 - x1, y2 - y1))
        fence_rows.append((fid, edges))
        ys = [v[0] for v in poly]
        xs = [v[1] for v in poly]
        for cx in range(
            math.floor(min(xs) / cell_deg), math.floor(max(xs) / cell_deg) + 1
        ):
            for cy in range(
                math.floor(min(ys) / cell_deg), math.floor(max(ys) / cell_deg) + 1
            ):
                cell_rows.append((fid, cx, cy))
    fences_df = spark.createDataFrame(
        fence_rows,
        "fence_id int, edges array<struct<y1:double,x1:double,y2:double,"
        "dx:double,dy:double>>",
    )
    cells_df = spark.createDataFrame(cell_rows, "fence_id int, cell_x long, cell_y long")

    p = with_cell(
        points.select(
            F.col(id_col).alias("id"),
            F.col(lat_col).alias("_plat"),
            F.col(lon_col).alias("_plon"),
        ),
        "_plat",
        "_plon",
        cell_deg,
    )
    cand = p.join(F.broadcast(cells_df), ["cell_x", "cell_y"]).join(
        F.broadcast(fences_df), "fence_id"
    )
    lat, lon = F.col("_plat"), F.col("_plon")
    crossings = F.aggregate(
        F.col("edges"),
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e.y1 > lat) != (e.y2 > lat))
            & (lon < e.dx * (lat - e.y1) / e.dy + e.x1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        cand.withColumn("_cr", crossings)
        .filter(F.col("_cr") % 2 == 1)
        .select("id", "fence_id")
    )


def multi_fence_sql(
    fences: dict[int, list[tuple[float, float]]],
    points_cte: str,
    id_expr: str = "pid",
    lat_expr: str = "plat",
    lon_expr: str = "plon",
) -> str:
    """Brute-force SQL twin of `multi_fence_assign`: edges flattened to
    a VALUES relation, every point crossed with every edge, crossings
    summed per (point, fence), odd parity kept. Same per-edge IEEE
    arithmetic as the Spark higher-order aggregate — bit-exact."""
    vals = []
    for fid, poly in fences.items():
        n = len(poly)
        for i in range(n):
            y1, x1 = poly[i]
            y2, x2 = poly[(i + 1) % n]
            vals.append(f"({fid}, {y1!r}, {x1!r}, {y2!r}, {x2 - x1!r}, {y2 - y1!r})")
    values = ",\n      ".join(vals)
    return f"""
    WITH pts AS ({points_cte}),
    e(fence_id, y1, x1, y2, dx, dy) AS (VALUES
      {values}),
    cr AS (
      SELECT pts.{id_expr} AS id, e.fence_id,
             CASE WHEN ((e.y1 > pts.{lat_expr}) <> (e.y2 > pts.{lat_expr}))
                    AND (pts.{lon_expr} <
                         e.dx * (pts.{lat_expr} - e.y1) / e.dy + e.x1)
                  THEN 1 ELSE 0 END AS x
      FROM pts CROSS JOIN e)
    SELECT id, fence_id
    FROM cr GROUP BY id, fence_id HAVING SUM(x) % 2 = 1
    """


def trip_stats(
    df: DataFrame,
    key: str,
    ts: str,
    lat: str = "lat",
    lon: str = "lon",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-key trajectory statistics from a point stream: number of legs,
    total path length, longest leg — the "how far did this bike travel
    today" aggregate over GPS pings.

    One window pass per key (shuffle keyed on `key`, sorted by event
    time + a deterministic tie-break) lags the previous ping; each leg's
    haversine is rounded to 6 dp and summed through DECIMAL(18,6) so the
    per-key total is exact and order-independent (a raw double sum's
    value depends on merge order — queries.py decimal rules). At 100 TB
    the state is one window partition per key; skewed keys (one device
    emitting billions of pings) would need time-bucketed pre-aggregation
    of consecutive legs, which this formulation composes with directly.
    """
    from pyspark.sql import Window

    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    leg = F.round(
        haversine_km(
            F.lag(lat).over(w), F.lag(lon).over(w), F.col(lat), F.col(lon)
        ),
        6,
    ).cast("decimal(18,6)")
    return (
        df.withColumn("_leg", leg)
        .filter(F.col("_leg").isNotNull())
        .groupBy(key)
        .agg(
            F.count("*").alias("n_legs"),
            F.sum("_leg").cast("double").alias("total_km"),
            F.max("_leg").cast("double").alias("max_leg_km"),
        )
    )


def grid_density(
    df: DataFrame,
    cell_deg: float,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Point count + centroid per map cell — the heatmap/demand-surface
    aggregate. A plain two-phase groupBy on the derived integer cell id:
    map-side partial aggregation makes the shuffle carry one row per
    (partition, occupied cell), never raw points.

    Centroids sum coordinates through DECIMAL(24,9) (sub-µm granularity)
    so the aggregate is order-independent and engine-portable — a double
    sum's value depends on partition merge order (queries.py decimal
    rules); one final cast to double + 6-dp round.
    """

    def centroid(c: str) -> Column:
        s = F.sum(F.col(c).cast("decimal(24,9)")).cast("double")
        return F.round(s / F.count("*"), 6)

    return (
        with_cell(df, lat, lon, cell_deg)
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count("*").alias("n_points"),
            centroid(lat).alias("centroid_lat"),
            centroid(lon).alias("centroid_lon"),
        )
    )
