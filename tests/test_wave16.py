"""Wave-16 operators: synchronous label propagation, focal gradient,
trajectory cell-set Jaccard."""

from __future__ import annotations

import math
import random
from collections import Counter

from pbf2json_spark import graph, spatial, trajectory


# --- label_propagation -------------------------------------------------------


def _brute_lpa(edges, rounds):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v, ns in adj.items():
            c = Counter(labels[u] for u in ns)
            top = max(c.values())
            new[v] = min(l for l, n in c.items() if n == top)
        labels = new
    return labels


def test_lpa_two_cliques(spark):
    # two 4-cliques joined by one bridge edge: each clique collapses to
    # its min id; the bridge is outvoted
    cl1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = cl1 + cl2 + [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["label"]
           for r in graph.label_propagation(df, rounds=3).collect()}
    assert all(got[v] == 0 for v in range(4))
    assert all(got[v] == 10 for v in range(10, 14))


def test_lpa_vs_brute_random(spark):
    rng = random.Random(83)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(70)})
    df = spark.createDataFrame(edges, "src long, dst long")
    for rounds in (1, 2, 4):
        got = {r["id"]: r["label"]
               for r in graph.label_propagation(df, rounds=rounds).collect()}
        assert got == _brute_lpa(edges, rounds)


# --- focal_gradient ----------------------------------------------------------


def _brute_grad(cells, res):
    n = 1 << res
    v = {(cx, cy): val for cx, cy, val in cells}

    def at(cx, cy):
        if not 0 <= cy < n:
            return 0
        return v.get((cx % n, cy), 0)

    out = {}
    for (cx, cy), val in v.items():
        gx = at(cx + 1, cy) - at(cx - 1, cy)
        gy = at(cx, cy + 1) - at(cx, cy - 1)
        out[(cx, cy)] = (val, gx, gy, gx * gx + gy * gy)
    return out


def test_focal_gradient_hand(spark):
    # single spike: the spike itself has zero gradient, neighbors absent
    df = spark.createDataFrame([(5, 5, 10)], "cx long, cy long, n long")
    got = {(r["cx"], r["cy"]): (r["n"], r["gx"], r["gy"], r["g2"])
           for r in spatial.focal_gradient(df, 4).collect()}
    assert got == {(5, 5): (10, 0, 0, 0)}  # input cells only, flat at peak


def test_focal_gradient_slope(spark):
    # monotone ramp along x: interior cell sees gx = v(x+1)-v(x-1) = 2
    df = spark.createDataFrame([(i, 3, i) for i in range(5)],
                               "cx long, cy long, n long")
    got = {(r["cx"], r["cy"]): (r["gx"], r["gy"])
           for r in spatial.focal_gradient(df, 4).collect()}
    assert got[(2, 3)] == (2, 0)
    assert got[(0, 3)] == (1, 0)   # left edge: missing neighbor = 0
    assert got[(4, 3)] == (-3, 0)  # right edge: 0 - v(3)


def test_focal_gradient_vs_brute_random(spark):
    rng = random.Random(89)
    res = 4
    n = 1 << res
    cells = list({(rng.randrange(n), rng.randrange(n)) for _ in range(60)})
    cells = [(cx, cy, rng.randrange(1, 100)) for cx, cy in cells]
    df = spark.createDataFrame(cells, "cx long, cy long, n long")
    got = {(r["cx"], r["cy"]): (r["n"], r["gx"], r["gy"], r["g2"])
           for r in spatial.focal_gradient(df, res).collect()}
    assert got == _brute_grad(cells, res)


def test_focal_gradient_lon_wrap(spark):
    res = 3
    n = 1 << res
    df = spark.createDataFrame([(0, 2, 5), (n - 1, 2, 9)],
                               "cx long, cy long, n long")
    got = {(r["cx"], r["cy"]): r["gx"]
           for r in spatial.focal_gradient(df, res).collect()}
    # x=0 sees x-1 == n-1 across the wrap
    assert got[(0, 2)] == 0 - 9
    assert got[(n - 1, 2)] == 5 - 0


# --- cell_jaccard ------------------------------------------------------------


def _cell_xy(lat, lon, res):
    n = 1 << res
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    y = min(max(int(math.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
    return x, y


def _brute_jaccard(rows, res, min_inter=1, max_df=None):
    sets = {}
    for u, lat, lon in rows:
        sets.setdefault(u, set()).add(_cell_xy(lat, lon, res))
    if max_df is not None:
        df_ = Counter(c for s in sets.values() for c in s)
        sets = {u: {c for c in s if df_[c] <= max_df}
                for u, s in sets.items()}
    out = {}
    users = sorted(sets)
    for i, a in enumerate(users):
        for b in users[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter >= min_inter:
                na, nb = len(sets[a]), len(sets[b])
                out[(a, b)] = (na, nb, inter,
                               inter * 1_000_000 // (na + nb - inter))
    return out


def test_cell_jaccard_identical_users(spark):
    rows = [(u, 10.0 * i, 10.0 * i) for u in (1, 2) for i in range(3)]
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    got = {(r["user_a"], r["user_b"]): r["jaccard_e6"]
           for r in trajectory.cell_jaccard(df, 5).collect()}
    assert got == {(1, 2): 1_000_000}


def test_cell_jaccard_vs_brute_random(spark):
    rng = random.Random(97)
    rows = [(rng.randrange(8), rng.uniform(-60, 60), rng.uniform(-60, 60))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    got = {(r["user_a"], r["user_b"]):
           (r["n_a"], r["n_b"], r["inter"], r["jaccard_e6"])
           for r in trajectory.cell_jaccard(df, 3).collect()}
    assert got == _brute_jaccard(rows, 3)


def test_cell_jaccard_max_df_thins_hub(spark):
    # everyone visits the hub cell; only users 1,2 share a private cell
    rows = [(u, 0.0, 0.0) for u in range(5)]
    rows += [(1, 40.0, 40.0), (2, 40.0, 40.0)]
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    got = {(r["user_a"], r["user_b"]): r["jaccard_e6"]
           for r in trajectory.cell_jaccard(df, 4, max_df=3).collect()}
    assert got == {(1, 2): 1_000_000}
    brute = _brute_jaccard(rows, 4, max_df=3)
    assert set(got) == set(brute)
