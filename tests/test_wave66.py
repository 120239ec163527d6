"""Wave-66: kNN label-consensus noise detection (vs brute reference;
planted mislabels flagged; duplicate-vector self-exclusion law) and
Broder bow-tie decomposition (vs brute reachability reference; canonical
core/in/out/tendril/disconnected construction)."""

from __future__ import annotations

import math
import random

from pbf2json_spark import ann, graph


# --- kNN label consensus ----------------------------------------------------------


def _brute_consensus(pts, k):
    """pts: [(id, vec, label)]."""
    out = {}
    for qid, qv, qlab in pts:
        scored = []
        for pid, pv, plab in pts:
            if pid == qid:
                continue
            dot = sum(a * b for a, b in zip(qv, pv))
            na = math.sqrt(sum(a * a for a in qv))
            nb = math.sqrt(sum(b * b for b in pv))
            cos = dot / (na * nb) if na > 0 and nb > 0 else 0.0
            scored.append((-cos, pid, plab))
        scored.sort()
        nn = scored[:k]
        votes = {}
        for _, _, lab in nn:
            votes[lab] = votes.get(lab, 0) + 1
        best = min(votes, key=lambda l: (-votes[l], l))
        agree = votes.get(qlab, 0)
        out[qid] = (qlab, best, agree, len(nn), best != qlab)
    return out


def test_consensus_vs_brute(spark):
    rnd = random.Random(66)
    pts = []
    centers = {0: [5, 0, 0], 1: [0, 5, 0], 2: [0, 0, 5]}
    for i in range(90):
        c = i % 3
        vec = [a + rnd.gauss(0, 0.5) for a in centers[c]]
        lab = c if i % 15 != 0 else (c + 1) % 3  # planted noise
        pts.append((i, vec, f"l{lab}"))
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>, label string")
    got = {
        r["vec_id"]: (r["label"], r["consensus_label"], r["n_agree"],
                      r["n_neighbors"], r["flagged"])
        for r in ann.knn_label_consensus(df, k=5).collect()
    }
    want = _brute_consensus(pts, 5)
    assert got == want
    # planted-noise points overwhelmingly flagged
    noisy = [i for i in range(90) if i % 15 == 0]
    assert sum(1 for i in noisy if got[i][4]) >= len(noisy) - 1


def test_consensus_duplicate_vector_self_exclusion(spark):
    # id 0 and id 1 share an identical vector with different labels:
    # each must see the OTHER (not itself) as a neighbor
    pts = [
        (0, [1.0, 0.0], "a"), (1, [1.0, 0.0], "b"),
        (2, [0.9, 0.1], "a"), (3, [0.95, 0.05], "a"),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>, label string")
    got = {
        r["vec_id"]: (r["consensus_label"], r["flagged"])
        for r in ann.knn_label_consensus(df, k=3).collect()
    }
    assert got[0] == ("a", False)  # neighbors b,a,a → tie a/1? no: votes a=2,b=1
    assert got[1] == ("a", True)   # sees a,a,a-ish → flagged


# --- bow-tie ----------------------------------------------------------------------


def _brute_bowtie(edges):
    adj, radj, nodes = {}, {}, set()
    es = {(s, d) for s, d in edges if s != d}
    for s, d in es:
        adj.setdefault(s, set()).add(d)
        radj.setdefault(d, set()).add(s)
        nodes |= {s, d}
    deg = {}
    for s, d in es:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    pivot = min(nodes, key=lambda n: (-deg.get(n, 0), n))

    def reach(a, start):
        seen = {start}
        stack = [start]
        while stack:
            u = stack.pop()
            for v in a.get(u, ()):
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        return seen

    fw, bw = reach(adj, pivot), reach(radj, pivot)
    core = fw & bw
    # weak components
    und = {}
    for s, d in es:
        und.setdefault(s, set()).add(d)
        und.setdefault(d, set()).add(s)
    seen = set()
    comps = []
    for n in nodes:
        if n in seen:
            continue
        comp = reach(und, n)
        seen |= comp
        comps.append(comp)
    core_comp = set()
    for comp in comps:
        if comp & core:
            core_comp |= comp
    out = {}
    for n in nodes:
        if n in core:
            out[n] = "core"
        elif n in bw:
            out[n] = "in"
        elif n in fw:
            out[n] = "out"
        elif n in core_comp:
            out[n] = "tendril"
        else:
            out[n] = "disconnected"
    return out


def test_bowtie_vs_brute(spark):
    rnd = random.Random(166)
    edges = set()
    # core cycle 0-1-2-3-0 with high degree; IN chain; OUT chain;
    # tendril off IN; fully separate island
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (1, 3), (2, 0)]:
        edges.add((a, b))
    edges |= {(10, 11), (11, 0)}          # IN path
    edges |= {(3, 20), (20, 21)}          # OUT path
    edges |= {(11, 30)}                   # tendril hanging off IN
    edges |= {(50, 51), (51, 52)}         # disconnected island
    for _ in range(15):
        a, b = rnd.randrange(60, 80), rnd.randrange(60, 80)
        edges.add((a, b))                 # random disconnected noise
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r["node"]: r["role"] for r in graph.bowtie(df).collect()}
    want = _brute_bowtie(edges)
    assert got == want
    assert got[0] == "core" and got[10] == "in" and got[21] == "out"
    assert got[30] == "tendril" and got[50] == "disconnected"

def test_bowtie_string_ids(spark):
    """Seed frame inherits the edge frame's id dtype (r3 ADVICE): string
    node ids (hosts/URLs) must work exactly like integers."""
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),   # core triangle
        ("in1", "a"),                          # IN
        ("c", "out1"),                         # OUT
        ("x", "y"),                            # disconnected pair
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["role"] for r in graph.bowtie(df).collect()}
    want = _brute_bowtie(set(edges))
    assert got == want
    assert got["a"] == "core" and got["in1"] == "in"
    assert got["out1"] == "out" and got["x"] == "disconnected"
