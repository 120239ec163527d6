"""Wave-68: directed triad census (vs brute 64-code reference on random
digraphs; exemplar sanity per type; census-sums-to-C(n,3) law) and
attribute assortativity (vs brute Newman reference; perfect homophily = 1,
anti-homophily < 0)."""

from __future__ import annotations

import itertools
import random

from pbf2json_spark import graph


def _brute_census(edges, nodes=None):
    es = {(s, d) for s, d in edges if s != d}
    ns = sorted(nodes or ({a for a, _ in es} | {b for _, b in es}))
    tmap = graph.triad_type_map()
    from collections import Counter

    out = Counter({k: 0 for k in graph._TRIAD_EXEMPLARS})
    for a, b, c in itertools.combinations(ns, 3):
        def st(x, y):
            return ((x, y) in es) * 1 + ((y, x) in es) * 2
        code = st(a, b) * 16 + st(a, c) * 4 + st(b, c)
        out[tmap[code]] += 1
    return dict(out)


def test_triad_census_vs_brute(spark):
    rnd = random.Random(68)
    edges = set()
    for _ in range(120):
        edges.add((rnd.randrange(20), rnd.randrange(20)))
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["triad"]: r["count"] for r in graph.triad_census(df).collect()}
    want = _brute_census(edges)
    assert got == want
    n = len({a for a, _ in edges} | {b for _, b in edges})
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_triad_census_exemplars(spark):
    # each exemplar graph alone (plus an isolated 4th node connected by
    # nothing -> contributes only disconnected types)
    for name, es in graph._TRIAD_EXEMPLARS.items():
        if not es:
            continue
        df = spark.createDataFrame(
            [(a, b) for a, b in es], "src long, dst long"
        )
        got = {r["triad"]: r["count"] for r in graph.triad_census(df).collect()}
        # nodes present = those touched by edges; for 012/102 only 2 nodes
        # appear -> no triple at all
        n_nodes = len({a for a, _ in es} | {b for _, b in es})
        if n_nodes < 3:
            assert sum(got.values()) == 0, name
        else:
            assert got[name] == 1, (name, got)
            assert sum(got.values()) == 1, name


def test_attribute_assortativity(spark):
    # perfect homophily: edges only within attribute groups
    edges = [(i, i + 1) for i in range(0, 10, 2)]
    edges += [(i, i + 1) for i in range(20, 30, 2)]
    attrs = [(i, "x") for i in range(12)] + [(i, "y") for i in range(20, 32)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    adf = spark.createDataFrame(attrs, "node long, attr string")
    row = graph.attribute_assortativity(edf, adf).collect()[0]
    assert row["same_attr"] == row["n_edges"] == 10
    # not exactly 1.0 denominator-wise unless margins multi-category: here
    # r = (E*eii - ab)/(E² - ab) with two categories — compute brute
    E, eii = 10, 10
    oa = {"x": 5, "y": 5}
    ib = {"x": 5, "y": 5}
    ab = sum(oa[c] * ib[c] for c in oa)
    assert row["r_num"] == E * eii - ab and row["r_den"] == E * E - ab
    assert abs(row["r"] - (E * eii - ab) / (E * E - ab)) < 1e-15
    assert row["r"] == 1.0

    # anti-homophily: bipartite x->y only
    edges2 = [(i, 20 + i) for i in range(10)]
    edf2 = spark.createDataFrame(edges2, "src long, dst long")
    row2 = graph.attribute_assortativity(edf2, adf).collect()[0]
    assert row2["same_attr"] == 0 and row2["r"] is not None and row2["r"] <= 0


def test_attribute_assortativity_vs_brute_random(spark):
    rnd = random.Random(168)
    attrs = [(i, f"g{i % 3}") for i in range(30)]
    edges = [(rnd.randrange(30), rnd.randrange(30)) for _ in range(200)]
    edges = [(a, b) for a, b in edges if a != b]
    edf = spark.createDataFrame(edges, "src long, dst long")
    adf = spark.createDataFrame(attrs, "node long, attr string")
    row = graph.attribute_assortativity(edf, adf).collect()[0]
    lab = dict(attrs)
    E = len(edges)
    eii = sum(1 for a, b in edges if lab[a] == lab[b])
    from collections import Counter

    oa = Counter(lab[a] for a, _ in edges)
    ib = Counter(lab[b] for _, b in edges)
    ab = sum(oa[c] * ib.get(c, 0) for c in oa)
    assert (row["n_edges"], row["same_attr"]) == (E, eii)
    assert row["r_num"] == E * eii - ab and row["r_den"] == E * E - ab
