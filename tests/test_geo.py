"""Geospatial operator tests: haversine correctness vs an independent
NumPy implementation, cell-blocking COMPLETENESS vs the brute-force
cross join, nearest-neighbor semantics, and the broadcast plan shape.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbt_repo_spark.operators.geo import (
    cell_size_deg,
    grid_density,
    haversine_km,
    nearest_neighbor_join,
    radius_join,
)


def _pts(spark, n, seed_mult, lat0=40.0, lon0=-74.0, spread=0.1):
    """Deterministic scattered points: same integer-arithmetic synthesis
    as queries_geo but with a configurable spread (degrees)."""
    return spark.range(1, n + 1).select(
        F.col("id"),
        (F.lit(lat0) + (F.col("id") * seed_mult % 1000) / (1000.0 / spread)).alias(
            "lat"
        ),
        (
            F.lit(lon0) + (F.col("id") * (seed_mult + 18) % 2000) / (1000.0 / spread)
        ).alias("lon"),
    )


def _brute_pairs(a_rows, b_rows, radius_km):
    def hav(p, q):
        phi1, phi2 = math.radians(p[1]), math.radians(q[1])
        dphi = phi2 - phi1
        dlam = math.radians(q[2] - p[2])
        x = (
            math.sin(dphi / 2) ** 2
            + math.cos(phi1) * math.cos(phi2) * math.sin(dlam / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(x))

    return {
        (p[0], q[0])
        for p in a_rows
        for q in b_rows
        if round(hav(p, q), 6) <= radius_km
    }


def test_haversine_matches_reference_values(spark):
    # JFK -> LHR, cross-checked against the INDEPENDENT spherical law of
    # cosines (numerically fine at continental distances): both must
    # agree to meters, pinning the formula (not just self-consistency).
    a = (40.6413, -73.7781)
    b = (51.4700, -0.4543)
    p1, p2 = math.radians(a[0]), math.radians(b[0])
    dl = math.radians(b[1] - a[1])
    loc = 6371.0088 * math.acos(
        min(1.0, math.sin(p1) * math.sin(p2) + math.cos(p1) * math.cos(p2) * math.cos(dl))
    )
    df = spark.createDataFrame(
        [(a[0], a[1], b[0], b[1])], "a double, b double, c double, d double"
    )
    d = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()[0].km
    assert d == pytest.approx(loc, abs=1e-3)
    assert d == pytest.approx(5540.0, abs=1.0)  # sanity: ~5540 km
    # zero distance for identical points
    z = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("a"), F.col("b")).alias("km")
    ).collect()[0].km
    assert z == 0.0


def test_cell_size_conservative():
    # at 41 deg the cell must span at least radius/ (110.574*cos41) deg
    c = cell_size_deg(5.0, max_abs_lat_deg=41.0)
    assert c > 5.0 / (110.574 * math.cos(math.radians(41.0)))
    with pytest.raises(ValueError):
        cell_size_deg(5.0, max_abs_lat_deg=95.0)


def test_radius_join_complete_vs_brute_force(spark):
    """The 3x3 cell neighborhood must produce EXACTLY the brute-force
    pair set — completeness (no missed pair near a cell border) and
    soundness (haversine verify kills far candidates in diagonal cells).
    """
    a = _pts(spark, 120, seed_mult=7919)
    b = _pts(spark, 80, seed_mult=104723)
    got = {
        (r.left_id, r.right_id)
        for r in radius_join(a, b, radius_km=3.0, max_abs_lat_deg=41.0).collect()
    }
    expect = _brute_pairs(
        [(r.id, r.lat, r.lon) for r in a.collect()],
        [(r.id, r.lat, r.lon) for r in b.collect()],
        3.0,
    )
    assert got == expect and len(expect) > 50


def test_nearest_neighbor_k2_semantics(spark):
    a = _pts(spark, 40, seed_mult=7919)
    b = _pts(spark, 60, seed_mult=104723)
    nn = nearest_neighbor_join(a, b, radius_km=5.0, k=2, max_abs_lat_deg=41.0)
    rows = nn.collect()
    per_left: dict[int, list] = {}
    for r in rows:
        per_left.setdefault(r.left_id, []).append(r)
    for left_id, rs in per_left.items():
        assert len(rs) <= 2
        rs.sort(key=lambda r: r.nn_rank)
        # ranks are 1..k and distances non-decreasing
        assert [r.nn_rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(
            rs[i].dist_km <= rs[i + 1].dist_km for i in range(len(rs) - 1)
        )


def test_grid_density_counts_total(spark):
    a = _pts(spark, 200, seed_mult=7919)
    g = grid_density(a, cell_deg=0.02)
    rows = g.collect()
    assert sum(r.n_points for r in rows) == 200
    # centroid of each cell lies inside the cell
    for r in rows:
        assert r.cell_x * 0.02 <= r.centroid_lon < (r.cell_x + 1) * 0.02
        assert r.cell_y * 0.02 <= r.centroid_lat < (r.cell_y + 1) * 0.02


def test_geo_radius_join_broadcasts_dim_side(spark, sf_dir):
    from dbt_repo_spark.queries import QUERIES

    df = QUERIES["geo_radius_pairs"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_point_in_polygon_known_points(spark):
    from dbt_repo_spark.operators.geo import point_in_polygon

    square = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    pts = [
        (1, 5.0, 5.0, True),    # center
        (2, 15.0, 5.0, False),  # above
        (3, -1.0, -1.0, False), # outside corner
        (4, 9.999, 9.999, True),
        (5, 5.0, 10.001, False),
    ]
    df = spark.createDataFrame(
        [(i, la, lo) for i, la, lo, _ in pts], "id int, lat double, lon double"
    )
    got = {
        r.id: r.inside
        for r in df.select(
            "id", point_in_polygon(F.col("lat"), F.col("lon"), square).alias("inside")
        ).collect()
    }
    assert got == {i: exp for i, _, _, exp in pts}


def test_point_in_polygon_concave(spark):
    from dbt_repo_spark.operators.geo import point_in_polygon

    # concave "C" shape: the notch (right-middle) is OUTSIDE
    poly = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (8.0, 10.0),
            (8.0, 2.0), (2.0, 2.0), (2.0, 10.0), (0.0, 10.0)]
    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 1.0, 5.0), (3, 9.0, 5.0), (4, 5.0, 1.0)],
        "id int, lat double, lon double",
    )
    got = {
        r.id: r.inside
        for r in df.select(
            "id", point_in_polygon(F.col("lat"), F.col("lon"), poly).alias("inside")
        ).collect()
    }
    # 5,5 is in the notch (outside); 1,5 bottom bar inside; 9,5 top bar
    # inside; 5,1 left spine inside
    assert got == {1: False, 2: True, 3: True, 4: True}


def test_multi_fence_assign_semantics(spark):
    from dbt_repo_spark.operators.geo import multi_fence_assign, point_in_polygon

    fences = {
        1: [(0.01, 0.02), (0.43, 9.97), (9.96, 5.03)],       # triangle
        2: [(5.01, 5.02), (5.43, 14.97), (14.96, 10.03)],    # overlapping
    }
    pts = spark.createDataFrame(
        [(1, 3.0, 5.0), (2, 6.5, 8.0), (3, 50.0, 50.0)],
        "id int, lat double, lon double",
    )
    got = {
        (r.id, r.fence_id)
        for r in multi_fence_assign(pts, fences, cell_deg=2.0).collect()
    }
    # cross-check against the single-fence literal operator
    expect = set()
    for fid, poly in fences.items():
        inside = pts.select(
            "id", point_in_polygon(F.col("lat"), F.col("lon"), poly).alias("i")
        ).collect()
        expect |= {(r.id, fid) for r in inside if r.i}
    assert got == expect
    assert (3, 1) not in got and (3, 2) not in got  # far point unfenced

    # horizontal edges are rejected at build time
    with pytest.raises(ValueError, match="horizontal edge"):
        multi_fence_assign(pts, {9: [(0.0, 0.0), (0.0, 1.0), (1.0, 0.5)]}, 1.0)
