"""Wave-22 operators: adaptive quadtree binning, Mann-Kendall trend,
cross-type co-location lift — each vs a brute-force reference."""

from __future__ import annotations

import random
from collections import Counter

from pbf2json_spark import spatial, stats


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _cellize(lat, lon, res):
    n = 1 << res
    x = min(max(int((lon + 180.0) / 360.0 * n), 0), n - 1)
    y = min(max(int((lat + 90.0) / 180.0 * n), 0), n - 1)
    return x, y


# --- quadtree_bins ----------------------------------------------------------


def _brute_quadtree(points, max_res, t):
    counts = {max_res: Counter(_cellize(la, lo, max_res)
                               for la, lo in points)}
    for r in range(max_res - 1, -1, -1):
        c = Counter()
        for (x, y), v in counts[r + 1].items():
            c[(x >> 1, y >> 1)] += v
        counts[r] = c
    leaves = set()
    for (x, y), v in counts[0].items():
        if v <= t:
            leaves.add((0, x, y, v, False))
    for r in range(1, max_res + 1):
        for (x, y), v in counts[r].items():
            if counts[r - 1][(x >> 1, y >> 1)] > t and (v <= t or r == max_res):
                leaves.add((r, x, y, v, v > t))
    return leaves


def test_quadtree_vs_brute(spark):
    rng = random.Random(221)
    pts = [(rng.uniform(40, 41), rng.uniform(40, 41)) for _ in range(300)]
    pts += [(rng.uniform(-80, 80), rng.uniform(-170, 170)) for _ in range(100)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = {(r["res"], r["cx"], r["cy"], r["n_points"], r["forced"])
           for r in spatial.quadtree_bins(df, max_res=5, threshold=20).collect()}
    assert got == _brute_quadtree(pts, 5, 20)


def test_quadtree_partitions_points_exactly(spark):
    # leaf counts must sum to the total: leaves tile the occupied space
    rng = random.Random(222)
    pts = [(rng.uniform(-85, 85), rng.uniform(-175, 175)) for _ in range(500)]
    pts += [(10.001, 10.001)] * 200          # one very hot cell → forced leaf
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = spatial.quadtree_bins(df, max_res=4, threshold=50).collect()
    assert sum(r["n_points"] for r in rows) == len(pts)
    assert any(r["forced"] for r in rows)    # the hot cell couldn't split


def test_quadtree_uniform_vs_sparse_depth(spark):
    # everything under threshold → single root leaf at res 0
    df = spark.createDataFrame([(1.0, 1.0), (50.0, 50.0)],
                               "lat double, lon double")
    rows = spatial.quadtree_bins(df, max_res=5, threshold=10).collect()
    assert [(r["res"], r["n_points"]) for r in rows] == [(0, 2)]


# --- mann_kendall -----------------------------------------------------------


def _brute_mk(series):
    n = len(series)
    ys = [y for _, y in sorted(series)]
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (ys[j] > ys[i]) - (ys[j] < ys[i])
    ties = Counter(ys)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values())
    sign = (s > 0) - (s < 0)
    mk2 = sign * _tdiv((abs(s) - 1) ** 2 * 18 * 1_000_000, max(var18, 1))
    return n, s, var18, mk2


def test_mann_kendall_vs_brute(spark):
    rng = random.Random(223)
    rows = []
    series = {}
    for k in ("up", "down", "flat", "noisy"):
        pts = []
        for x in range(25):
            if k == "up":
                y = x * 2 + rng.randrange(0, 3)
            elif k == "down":
                y = 100 - x * 3 + rng.randrange(0, 2)
            elif k == "flat":
                y = 7
            else:
                y = rng.randrange(0, 50)
            pts.append((x, y))
            rows.append((k, x, y))
        series[k] = pts
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {r["k"]: (r["n_obs"], r["s_stat"], r["var18"], r["mk2_e6"])
           for r in stats.mann_kendall(df, ["k"], "x", "y").collect()}
    assert got == {k: _brute_mk(v) for k, v in series.items()}
    assert got["up"][3] > 3_840_000          # strongly significant upward
    assert got["down"][3] < -3_840_000
    assert got["flat"][1] == 0 and got["flat"][3] == 0


def test_mann_kendall_single_obs_kept(spark):
    df = spark.createDataFrame([("a", 0, 5)], "k string, x long, y long")
    r = stats.mann_kendall(df, ["k"], "x", "y").collect()[0]
    assert (r["n_obs"], r["s_stat"], r["var18"], r["mk2_e6"]) == (1, 0, 0, 0)


# --- colocation_lift --------------------------------------------------------


def _brute_clq(events, res):
    pts = [(_cellize(la, lo, res), t) for t, la, lo in events]
    n = len(pts)
    marg = Counter(t for _, t in pts)
    obs = Counter()
    ptot = 0
    for i, ((c1, t1)) in enumerate(pts):
        for j, ((c2, t2)) in enumerate(pts):
            near = abs(c1[0] - c2[0]) <= 1 and abs(c1[1] - c2[1]) <= 1
            if near:
                ptot += 1
                if i != j:
                    obs[(t1, t2)] += 1
    ptot -= n  # self pairs
    out = {}
    for (ta, tb), o in obs.items():
        if o <= 0:
            continue
        den = ptot * marg[ta] * (marg[tb] - (ta == tb))
        out[(ta, tb)] = (marg[ta], marg[tb], o,
                         _tdiv(o * n * (n - 1) * 1_000_000, max(den, 1)))
    return out


def test_colocation_vs_brute(spark):
    rng = random.Random(224)
    events = []
    # types A and B co-located in one hot zone; C scattered
    for _ in range(30):
        events.append(("A", rng.uniform(20, 21), rng.uniform(20, 21)))
        events.append(("B", rng.uniform(20, 21), rng.uniform(20, 21)))
    for _ in range(40):
        events.append(("C", rng.uniform(-60, 60), rng.uniform(-150, 150)))
    df = spark.createDataFrame(events, "etype string, lat double, lon double")
    got = {(r["type_a"], r["type_b"]):
           (r["n_a"], r["n_b"], r["obs_pairs"], r["clq_e6"])
           for r in spatial.colocation_lift(df, res=4).collect()}
    assert got == _brute_clq(events, 4)
    # the A-B pair must show positive lift (they share the hot zone)
    assert got[("A", "B")][3] > 1_000_000
