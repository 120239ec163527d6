"""Wave-54: weighted cost-distance raster (vs brute Dijkstra reference:
cost surface, impassable cells, cap pruning, lon wrap; uniform-cost
degenerates to distance_transform) and all-integer IPF raking (vs brute
integer replica; margin convergence to uniform targets; float-IPF
agreement)."""

from __future__ import annotations

import heapq
import random

from pyspark.sql import functions as F

from pbf2json_spark import raster, sampling


def _spread(v):
    v &= (1 << 26) - 1
    for shift, mask in ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                        (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                        (1, 0x5555555555555555)):
        v = (v | (v << shift)) & mask
    return v


def _cell(x, y, res):
    return (res << 52) | (_spread(x) | (_spread(y) << 1))


def _brute_cost_dist(grid, seeds_xy, n, max_cost):
    """grid: {(x,y): cost}; Dijkstra from all seeds (dist 0)."""
    dist = {}
    pq = [(0, xy) for xy in seeds_xy]
    for _, xy in pq:
        dist[xy] = 0
    heapq.heapify(pq)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    while pq:
        d, (x, y) = heapq.heappop(pq)
        if d > dist.get((x, y), 1 << 60):
            continue
        for dx, dy in offs:
            nx, ny = (x + dx) % n, y + dy
            if not (0 <= ny < n) or (nx, ny) not in grid:
                continue
            nd = d + grid[(nx, ny)]
            if nd <= max_cost and nd < dist.get((nx, ny), 1 << 60):
                dist[(nx, ny)] = nd
                heapq.heappush(pq, (nd, (nx, ny)))
    return dist


def test_cost_distance_vs_dijkstra(spark):
    rnd = random.Random(54)
    res, n = 5, 32
    grid = {}
    for x in range(n):
        for y in range(n):
            if rnd.random() < 0.8:  # 20% impassable holes
                grid[(x, y)] = rnd.randrange(1, 5)
    seeds_xy = [(2, 3), (30, 29), (15, 0)]  # includes a y-edge + wrap-adjacent
    max_cost = 12
    cost_df = spark.createDataFrame(
        [(_cell(x, y, res), c) for (x, y), c in grid.items()], "cell long, cost long"
    )
    seed_df = spark.createDataFrame(
        [(_cell(x, y, res),) for x, y in seeds_xy], "cell long"
    )
    got = {
        r["cell"]: r["cost_dist"]
        for r in raster.cost_distance(cost_df, seed_df, res, max_cost).collect()
    }
    want_xy = _brute_cost_dist(grid, seeds_xy, n, max_cost)
    want = {_cell(x, y, res): d for (x, y), d in want_xy.items()
            if (x, y) in grid or d == 0}
    # seeds off-grid still appear at 0
    for x, y in seeds_xy:
        want[_cell(x, y, res)] = 0
    assert got == want


def test_cost_distance_uniform_equals_chebyshev_transform(spark):
    res, n = 4, 16
    cells = [(_cell(x, y, res),) for x in range(n) for y in range(n)]
    cost_df = spark.createDataFrame(cells, "cell long").withColumn(
        "cost", F.lit(1).cast("long")
    )
    seed_df = spark.createDataFrame([(_cell(8, 8, res),)], "cell long")
    cd = {
        r["cell"]: r["cost_dist"]
        for r in raster.cost_distance(cost_df, seed_df, res, 6).collect()
    }
    dt = {
        r["cell"]: r["dist"]
        for r in raster.distance_transform(
            seed_df, cost_df.select("cell"), 6, res
        ).collect()
    }
    for cell, d in dt.items():
        if d <= 6:
            assert cd[cell] == d
        else:
            assert cell not in cd


# --- IPF raking -------------------------------------------------------------------


def _brute_ipf(counts, rounds, scale):
    """counts: {(r,c): n} — integer replica of the operator."""
    cells = {k: [n, scale] for k, n in counts.items()}
    t0 = sum(n * scale for n, _ in cells.values())
    rows = sorted({k[0] for k in cells})
    cols = sorted({k[1] for k in cells})
    targets = [t0 // len(rows), t0 // len(cols)]
    for _ in range(rounds):
        for axis in (0, 1):
            marg = {}
            for (r, c), (n, w) in cells.items():
                key = (r, c)[axis]
                marg[key] = marg.get(key, 0) + n * w
            for (r, c), v in cells.items():
                m = marg[(r, c)[axis]]
                num = v[1] * targets[axis]
                v[1] = (num - (((num % m) + m) % m)) // m
    return {k: (n, w) for k, (n, w) in cells.items()}


def test_ipf_vs_brute(spark):
    rnd = random.Random(154)
    rows = []
    langs = ["en", "fi", "sv", "de"]
    srcs = ["web", "news", "wiki"]
    for i in range(2000):
        rows.append((i, rnd.choice(langs), rnd.choices(srcs, weights=[6, 3, 1])[0]))
    df = spark.createDataFrame(rows, "id long, lang string, src string")
    got = {
        (r["lang"], r["src"]): (r["n"], r["w"])
        for r in sampling.ipf_weights(df, "lang", "src", rounds=3).collect()
    }
    counts = {}
    for _, l, s in rows:
        counts[(l, s)] = counts.get((l, s), 0) + 1
    want = _brute_ipf(counts, 3, 1_000_000)
    assert got == want


def test_ipf_margins_converge_uniform(spark):
    rnd = random.Random(254)
    rows = [
        (i, f"l{rnd.randrange(3)}", f"s{rnd.randrange(4)}") for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id long, lang string, src string")
    out = sampling.ipf_weights(df, "lang", "src", rounds=4).collect()
    t0 = 3000 * 1_000_000
    for axis, n_cat in (("lang", 3), ("src", 4)):
        marg = {}
        for r in out:
            marg[r[axis]] = marg.get(r[axis], 0) + r["n"] * r["w"]
        target = t0 // n_cat
        for v in marg.values():
            assert abs(v - target) / target < 1e-3  # raked to uniform
