"""Wave-25 operators: exact Gini index, multi-source BFS hop labels,
heading-octant mix — vs brute-force references."""

from __future__ import annotations

import random
from collections import Counter, deque

from pbf2json_spark import graph, stats, trajectory


# --- gini_index --------------------------------------------------------------


def _brute_gini(vals: list[int]) -> tuple[int, int, int]:
    xs = sorted(vals)
    n, s = len(xs), sum(xs)
    if s == 0:
        return n, 0, 0
    t = sum((i + 1) * x for i, x in enumerate(xs))
    return n, s, (2 * t - (n + 1) * s) * 1_000_000 // (n * s)


def test_gini_vs_brute(spark):
    rng = random.Random(251)
    rows = []
    groups = {
        "uniform": [100] * 40,
        "skewed": [1] * 30 + [10_000] * 2,
        "mixed": [rng.randrange(0, 500) for _ in range(80)],
        "zeros": [0] * 5,
        "single": [7],
    }
    for g, vals in groups.items():
        rows += [(g, v) for v in vals]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "src string, v long")
    got = {r["src"]: (r["n"], r["sum_val"], r["gini_e6"])
           for r in stats.gini_index(df, ["src"], "v").collect()}
    assert got == {g: _brute_gini(v) for g, v in groups.items()}
    assert got["uniform"][2] == 0           # equal values → no inequality
    assert got["skewed"][2] > 900_000       # near-total concentration
    assert got["single"][2] == 0


def test_gini_tie_order_invariance(spark):
    # many duplicates: histogram form must equal the row_number form
    vals = [3] * 50 + [9] * 50 + [3, 9, 27]
    df = spark.createDataFrame([("g", v) for v in vals], "src string, v long")
    row = stats.gini_index(df, ["src"], "v").collect()[0]
    assert (row["n"], row["sum_val"], row["gini_e6"]) == _brute_gini(vals)


# --- bfs_hops ----------------------------------------------------------------


def _brute_bfs(edges, seeds, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] == max_hops:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_hops_vs_brute(spark):
    rng = random.Random(252)
    n = 200
    edges = [(i, (i * 7 + 3) % n) for i in range(n)]
    edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (17,)], "node long")
    got = {r["node"]: r["hop"]
           for r in graph.bfs_hops(e, seeds, max_hops=4).collect()}
    assert got == _brute_bfs(edges, [0, 17], 4)


def test_bfs_hops_early_exit_and_unreachable(spark):
    # two disjoint chains; BFS from one end never reaches the other chain
    edges = [(0, 1), (1, 2), (10, 11)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["hop"]
           for r in graph.bfs_hops(e, seeds, max_hops=9).collect()}
    assert got == {0: 0, 1: 1, 2: 2}        # 10/11 absent; loop exits early


def test_bfs_min_hop_on_parallel_paths(spark):
    # node 3 reachable in 1 hop (0->3) and 2 hops (0->1->3): min wins
    edges = [(0, 3), (0, 1), (1, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["hop"]
           for r in graph.bfs_hops(e, seeds, max_hops=3).collect()}
    assert got == {0: 0, 3: 1, 1: 1}


# --- heading_mix -------------------------------------------------------------


def _classify(dla: float, dlo: float) -> str:
    if dla == 0 and dlo == 0:
        return "O"
    if abs(dlo) > abs(dla):
        return "E" if dlo > 0 else "W"
    if abs(dla) > abs(dlo):
        return "N" if dla > 0 else "S"
    if dla > 0:
        return "NE" if dlo > 0 else "NW"
    return "SE" if dlo > 0 else "SW"


def _brute_headings(pts):
    out = Counter()
    by_user = {}
    for u, ts, la, lo in pts:
        by_user.setdefault(u, []).append((ts, la, lo))
    for u, seq in by_user.items():
        seq.sort()
        for (_, pla, plo), (_, la, lo) in zip(seq, seq[1:]):
            out[(u, _classify(la - pla, lo - plo))] += 1
    return dict(out)


def test_heading_mix_vs_brute(spark):
    rng = random.Random(253)
    pts = []
    for u in range(6):
        la, lo = rng.uniform(-50, 50), rng.uniform(-150, 150)
        for t in range(40):
            pts.append((u, t, la, lo))
            la += rng.choice([-1.5, -0.25, 0.0, 0.25, 1.5])
            lo += rng.choice([-1.5, -0.25, 0.0, 0.25, 1.5])
    df = spark.createDataFrame(pts, "user_id long, ts long, lat double, lon double")
    got = {(r["user_id"], r["heading"]): r["n_steps"]
           for r in trajectory.heading_mix(df).collect()}
    assert got == _brute_headings(pts)


def test_heading_boundaries(spark):
    # exact diagonal → NE; pure east; stationary repeat → O; single point none
    pts = [
        (1, 0, 0.0, 0.0), (1, 1, 2.0, 2.0),     # NE (exact tie)
        (1, 2, 2.0, 5.0),                         # E
        (1, 3, 2.0, 5.0),                         # O
        (2, 0, 9.0, 9.0),                         # lone point: no step
    ]
    df = spark.createDataFrame(pts, "user_id long, ts long, lat double, lon double")
    got = {(r["user_id"], r["heading"]): r["n_steps"]
           for r in trajectory.heading_mix(df).collect()}
    assert got == {(1, "NE"): 1, (1, "E"): 1, (1, "O"): 1}
