"""Wave-62: HyperANF neighborhood function (vs brute exact-ball +
python-HLL replica: registers and integer surface exact; monotone growth;
estimate tracks true ball sizes) and dyad census (vs brute; reciprocity
laws)."""

from __future__ import annotations

import hashlib
import random

from pbf2json_spark import graph


def _kmv_hash(key, seed=0):
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15], 16)


def _hll_regs(keys, p):
    q = 60 - p
    regs = {}
    for k in keys:
        h = _kmv_hash(k)
        idx = h >> q
        w = h & ((1 << q) - 1)
        rank = (q + 1) if w == 0 else (q + 1) - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rank)
    return regs


def _brute_anf(edges, rounds, p):
    adj = {}
    nodes = set()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        nodes |= {s, d}
    balls = {u: {u} for u in nodes}
    out = {}
    for r in range(rounds + 1):
        if r > 0:
            balls = {
                u: balls[u] | set().union(*(balls[v] for v in adj.get(u, ())))
                if adj.get(u)
                else balls[u]
                for u in nodes
            }
        for u in nodes:
            regs = _hll_regs(balls[u], p)
            q = 60 - p
            s = 1 << (q + 1)
            m = 1 << p
            zp = sum(1 << (q + 1 - rk) for rk in regs.values())
            n_regs = len(regs)
            z_scaled = zp + (m - n_regs) * s
            out[(r, u)] = (n_regs, m - n_regs, z_scaled, len(balls[u]))
    return out


def test_hyperanf_vs_brute(spark):
    rnd = random.Random(62)
    edges = set()
    for _ in range(160):
        edges.add((rnd.randrange(40), rnd.randrange(40)))
    edges = [(a, b) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["round"], r["node"]): (r["n_regs"], r["n_zero"], r["z_scaled"],
                                  r["est_raw"], r["est"])
        for r in graph.hyperanf(df, rounds=3, p=4).collect()
    }
    want = _brute_anf(edges, 3, 4)
    assert set(got) == set(want)
    for key in got:
        assert got[key][:3] == want[key][:3], key
    # ball size is monotone in rounds → z_scaled non-increasing
    for (r, u), v in got.items():
        if (r + 1, u) in got:
            assert got[(r + 1, u)][2] <= v[2]
    # p=4 estimates are rough; check aggregate tracking within 40%
    tot_true = sum(want[(3, u)][3] for (rr, u) in want if rr == 3)
    tot_est = sum(got[(3, u)][4] for (rr, u) in got if rr == 3)
    assert abs(tot_est - tot_true) / tot_true < 0.4


def test_dyad_census_vs_brute(spark):
    rnd = random.Random(162)
    edges = set()
    for _ in range(120):
        edges.add((rnd.randrange(25), rnd.randrange(25)))
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = graph.dyad_census(df).collect()[0]
    es = set(edges)
    nodes = {a for a, _ in es} | {b for _, b in es}
    pairs = {(min(a, b), max(a, b)) for a, b in es}
    mutual = sum(1 for x, y in pairs if (x, y) in es and (y, x) in es)
    asym = len(pairs) - mutual
    n = len(nodes)
    assert (row["n_nodes"], row["mutual"], row["asym"]) == (n, mutual, asym)
    assert row["nulls"] == n * (n - 1) // 2 - len(pairs)
    assert row["n_edges"] == 2 * mutual + asym == len(es)
    assert row["reciprocity_e6"] == (2 * mutual * 1_000_000) // (2 * mutual + asym)


def test_dyad_census_pure_mutual(spark):
    edges = [(0, 1), (1, 0), (2, 3), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = graph.dyad_census(df).collect()[0]
    assert row["mutual"] == 2 and row["asym"] == 0
    assert row["reciprocity_e6"] == 1_000_000
    assert row["nulls"] == 4 * 3 // 2 - 2
