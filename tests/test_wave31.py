"""Wave-31: personalized PageRank (integer fixed point) and per-entity
convex hulls — vs brute-force references."""

from __future__ import annotations

import random

from pbf2json_spark import graph, spatial

SCALE = graph.SCALE


# --- personalized_pagerank_int -------------------------------------------------


def _brute_ppr(edges, seeds, n_iter, d=85):
    nodes = {s for s, _ in edges} | {t for _, t in edges}
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    base = (100 - d) * SCALE // 100
    r = {v: (SCALE if v in seeds else 0) for v in nodes}
    for _ in range(n_iter):
        inc = {v: 0 for v in nodes}
        for u, outs in out.items():
            c = r[u] // len(outs)
            for t in outs:
                inc[t] += c
        r = {v: (base if v in seeds else 0) + d * inc[v] // 100
             for v in nodes}
    return r


def test_ppr_vs_brute(spark):
    rng = random.Random(311)
    n = 120
    edges = [(i, (i * 7 + 3) % n) for i in range(n)]
    edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(200)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (5,)], "node long")
    got = {r["node"]: r["rank_e9"]
           for r in graph.personalized_pagerank_int(e, seeds, 4).collect()}
    assert got == _brute_ppr(edges, {0, 5}, 4)


def test_ppr_mass_localizes_near_seeds(spark):
    # chain 0->1->2->3->4 and an island 10->11: the island gets zero
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["rank_e9"]
           for r in graph.personalized_pagerank_int(e, seeds, 5).collect()}
    assert got[0] > got[1] > got[2] > got[3] > 0
    assert got[10] == 0 and got[11] == 0


# --- convex_hull ---------------------------------------------------------------


def _jarvis(pts):
    """Independent gift-wrapping hull over integer points (strict left
    turns drop collinear boundary points, like the operator)."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    hull = []
    start = min(pts)
    p = start
    while True:
        hull.append(p)
        q = pts[0] if pts[0] != p else pts[1]
        for r in pts:
            if r == p:
                continue
            c = cross(p, q, r)
            if c < 0 or (c == 0 and
                         (abs(r[0] - p[0]) + abs(r[1] - p[1])) >
                         (abs(q[0] - p[0]) + abs(q[1] - p[1]))):
                q = r
        p = q
        if p == start:
            break
    return hull


def _shoelace2(hull):
    s = 0
    for (x1, y1), (x2, y2) in zip(hull, hull[1:] + hull[:1]):
        s += x1 * y2 - x2 * y1
    return abs(s)


def test_convex_hull_vs_jarvis(spark):
    rng = random.Random(312)
    q = 10_000_000
    rows, want = [], {}
    for eid in range(6):
        pts = [(rng.randrange(-80 * q, 80 * q), rng.randrange(-80 * q, 80 * q))
               for _ in range(rng.randrange(3, 40))]
        want[eid] = pts
        rows += [(eid, y / q, x / q) for x, y in pts]
    df = spark.createDataFrame(rows, "entity_id long, lat double, lon double")
    got = {r["entity_id"]: r for r in spatial.convex_hull(df).collect()}
    for eid, pts in want.items():
        jh = _jarvis(pts)
        r = got[eid]
        hv = {(int(round(lo * q)), int(round(la * q)))
              for la, lo in zip(r["hull_lat"], r["hull_lon"])}
        assert hv == set(jh), eid
        assert r["hull_size"] == len(jh)
        assert int(r["area2_e14"]) == _shoelace2(jh)
        assert r["n_points"] == len(pts)


def test_convex_hull_degenerate(spark):
    rows = [
        (1, 0.0, 0.0),                       # single point
        (2, 0.0, 0.0), (2, 0.0, 1.0), (2, 0.0, 2.0),   # collinear
        (3, 0.0, 0.0), (3, 0.0, 1.0), (3, 1.0, 0.0), (3, 0.3, 0.3),
    ]
    df = spark.createDataFrame(rows, "entity_id long, lat double, lon double")
    got = {r["entity_id"]: r for r in spatial.convex_hull(df).collect()}
    assert got[1]["hull_size"] == 1 and int(got[1]["area2_e14"]) == 0
    assert got[2]["hull_size"] == 2 and int(got[2]["area2_e14"]) == 0
    assert got[3]["hull_size"] == 3              # interior point dropped
    assert int(got[3]["area2_e14"]) == 10_000_000 * 10_000_000  # 2*(1/2 deg^2) e14
