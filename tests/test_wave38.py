"""Wave-38: polygon containment hierarchy (vs brute geometry on
non-rect shapes) and standard geohash (Column bit-trick vs the
bisection reference and the classic test vector)."""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F

from pbf2json_spark import cells, spatial


def _ring(pts):
    return [{"lat": float(a), "lon": float(b)} for a, b in pts]


# --- polygon nesting ---------------------------------------------------------


def test_nesting_nonrect_shapes(spark):
    # L-shaped outer, triangle strictly inside it, rect inside the
    # triangle's bbox but OUTSIDE the triangle (bbox candidate that the
    # ray cast must reject), plus a disjoint square
    outer = _ring([(0, 0), (0, 10), (6, 10), (6, 4), (10, 4), (10, 0), (0, 0)])
    tri = _ring([(1, 1), (1, 7), (5, 1), (1, 1)])
    # rect at lat 3..4, lon 5..6: inside tri's bbox (1..5, 1..7) but the
    # triangle's hypotenuse (from (1,7) to (5,1), lat+lon*(2/3)...) puts
    # (3,5) outside: 3 > 5 - (5-1)*(5-1)/(7-1)? brute-checked below
    rect = _ring([(3, 5), (3, 6), (4, 6), (4, 5), (3, 5)])
    far = _ring([(50, 50), (50, 55), (55, 55), (55, 50), (50, 50)])
    df = spark.createDataFrame(
        [(1, outer), (2, tri), (3, rect), (4, far)],
        "polygon_id long, ring array<struct<lat:double,lon:double>>",
    )
    got = {
        (r["child"], r["parent"]): r["is_direct"]
        for r in spatial.polygon_nesting(df, res=3).collect()
    }

    def inside(pt, ring):
        py, px = pt
        cnt = 0
        for (y1, x1), (y2, x2) in zip(ring, ring[1:]):
            if (y1 > py) != (y2 > py) and px < x1 + (py - y1) * (x2 - x1) / (
                y2 - y1
            ):
                cnt += 1
        return cnt % 2 == 1

    shapes = {
        1: [(p["lat"], p["lon"]) for p in outer],
        2: [(p["lat"], p["lon"]) for p in tri],
        3: [(p["lat"], p["lon"]) for p in rect],
        4: [(p["lat"], p["lon"]) for p in far],
    }
    # brute: child in parent iff ALL child vertices inside (convex-ish
    # test shapes make vertex-wise containment ⟺ true containment here)
    exp_pairs = set()
    for cid, cr in shapes.items():
        for pid, pr in shapes.items():
            if cid != pid and all(inside(p, pr) for p in cr[:-1]):
                exp_pairs.add((cid, pid))
    assert set(got) == exp_pairs
    assert (2, 1) in got and got[(2, 1)]  # tri's direct parent = L-shape
    assert (3, 2) not in got  # bbox candidate rejected by the ray cast


def test_nesting_three_levels_direct_parent(spark):
    a = _ring([(0, 0), (0, 12), (12, 12), (12, 0), (0, 0)])
    b = _ring([(2, 2), (2, 9), (9, 9), (9, 2), (2, 2)])
    c = _ring([(4, 4), (4, 5), (5, 5), (5, 4), (4, 4)])
    df = spark.createDataFrame(
        [(10, a), (20, b), (30, c)],
        "polygon_id long, ring array<struct<lat:double,lon:double>>",
    )
    got = {
        (r["child"], r["parent"]): r["is_direct"]
        for r in spatial.polygon_nesting(df, res=3).collect()
    }
    assert got == {(20, 10): True, (30, 20): True, (30, 10): False}


def test_nesting_crossing_rejected(spark):
    # child spans the parent's hollow: bbox inside the parent's bbox AND
    # the first vertex inside (in the U's left arm), but the child's
    # edges cross the U's inner walls -> the crossing test must reject.
    u = _ring([
        (0, 0), (0, 9), (9, 9), (9, 6), (3, 6), (3, 3), (9, 3), (9, 0), (0, 0),
    ])
    bar = _ring([(4, 1), (4, 8), (8, 8), (8, 1), (4, 1)])
    df = spark.createDataFrame(
        [(1, u), (2, bar)],
        "polygon_id long, ring array<struct<lat:double,lon:double>>",
    )
    got = {(r["child"], r["parent"]) for r in spatial.polygon_nesting(df, res=3).collect()}
    assert got == set()  # bar crosses both inner walls of the U


# --- geohash -----------------------------------------------------------------


def test_geohash_classic_vector(spark):
    df = spark.createDataFrame([(57.64911, 10.40744)], "lat double, lon double")
    got = df.select(cells.geohash_col(F.col("lat"), F.col("lon"), 11).alias("g")).collect()
    assert got[0]["g"] == "u4pruydqqvj"
    assert cells.geohash_encode([57.64911], [10.40744], 11)[0] == "u4pruydqqvj"


def test_geohash_column_matches_bisection(spark):
    rnd = random.Random(38)
    pts = [
        (rnd.uniform(-89.9, 89.9), rnd.uniform(-179.9, 179.9)) for _ in range(300)
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (1, 5, 8, 12):
        got = {
            (r["lat"], r["lon"]): r["g"]
            for r in df.select(
                "lat", "lon", cells.geohash_col(F.col("lat"), F.col("lon"), p).alias("g")
            ).collect()
        }
        exp = cells.geohash_encode(
            np.array([a for a, _ in pts]), np.array([b for _, b in pts]), p
        )
        for (la, lo), e in zip(pts, exp):
            assert got[(la, lo)] == e, (p, la, lo)


def test_geohash_prefix_hierarchy(spark):
    # geohash's defining property: a longer hash refines the shorter one
    rnd = random.Random(39)
    pts = [(rnd.uniform(-89, 89), rnd.uniform(-179, 179)) for _ in range(100)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    r = df.select(
        cells.geohash_col(F.col("lat"), F.col("lon"), 4).alias("g4"),
        cells.geohash_col(F.col("lat"), F.col("lon"), 9).alias("g9"),
    ).collect()
    assert all(row["g9"].startswith(row["g4"]) for row in r)
