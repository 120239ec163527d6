"""Wave-37: exact DBSCAN (vs a brute reference on crafted blobs) and
distributed BPE training (vs a brute trainer; upper-bound law)."""

from __future__ import annotations

import random
from collections import Counter

from pbf2json_spark import corpus, spatial


# --- dbscan ------------------------------------------------------------------


def _brute_dbscan(pts, eps, min_pts):
    ids = sorted(pts)
    eps2 = eps * eps

    def nbrs(i):
        (la, lo) = pts[i]
        return [
            j
            for j in ids
            if (pts[j][0] - la) ** 2 + (pts[j][1] - lo) ** 2 <= eps2
        ]

    neigh = {i: nbrs(i) for i in ids}
    core = {i for i in ids if len(neigh[i]) >= min_pts}
    # union-find over core-core eps edges
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in neigh[i]:
            if j in core and j != i:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    cluster = {i: min(k for k in core if find(k) == find(i)) for i in core}
    out = {}
    for i in ids:
        if i in core:
            out[i] = (True, "core", cluster[i])
        else:
            cs = [cluster[j] for j in neigh[i] if j in core and j != i]
            if cs:
                out[i] = (False, "border", min(cs))
            else:
                out[i] = (False, "noise", None)
    return out


def test_dbscan_vs_brute(spark):
    rnd = random.Random(37)
    pts = {}
    nid = 0
    # two dense blobs, a sparse bridge point, and far noise
    for cx, cy in ((10.0, 10.0), (40.0, -30.0)):
        for _ in range(12):
            pts[nid] = (cx + rnd.uniform(-1.5, 1.5), cy + rnd.uniform(-1.5, 1.5))
            nid += 1
    pts[nid] = (10.0, 14.2)  # border-ish: near blob 1, low own density
    nid += 1
    for _ in range(6):
        pts[nid] = (rnd.uniform(-80, 80), rnd.uniform(-170, 170))
        nid += 1
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in pts.items()],
        "point_id long, lat double, lon double",
    )
    got = {
        r["point_id"]: (r["is_core"], r["role"], r["cluster"])
        for r in spatial.dbscan(df, eps_deg=3.0, min_pts=5, res=6).collect()
    }
    exp = _brute_dbscan(pts, 3.0, 5)
    assert got == exp
    roles = Counter(v[1] for v in exp.values())
    assert roles["core"] >= 20 and roles["noise"] >= 4  # non-degenerate


def test_dbscan_singleton_core_and_tiny_cluster(spark):
    # min_pts=1: every point is core; two far points = two singleton clusters
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 50.0, 50.0), (3, 0.0, 0.5)],
        "point_id long, lat double, lon double",
    )
    got = {
        r["point_id"]: (r["role"], r["cluster"])
        for r in spatial.dbscan(df, eps_deg=1.0, min_pts=1, res=6).collect()
    }
    assert got == {1: ("core", 1), 2: ("core", 2), 3: ("core", 1)}


# --- bpe training ------------------------------------------------------------


def _brute_bpe(texts, n_merges, cap=128):
    words = Counter()
    for t in texts:
        for w in t.split():
            if w:
                words[tuple(w[:cap])] += 1
    vocab = dict(words)
    merges = []
    for step in range(n_merges):
        stats = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += cnt
        if not stats:
            break
        (a, b), n = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, n))
        new = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + cnt
        vocab = new
    return merges


def test_bpe_train_vs_brute(spark):
    texts = [
        "the theme of the thesis is these themes",
        "low lower lowest newer newest new",
        "the the the them then",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["step"], r["a"], r["b"], r["pair_count"])
        for r in corpus.bpe_train(df, n_merges=10).orderBy("step").collect()
    ]
    assert got == _brute_bpe(texts, 10)
    # new-pair upper-bound law: no later merge can outnumber an earlier one
    counts = [g[3] for g in got]
    assert all(x >= y for x, y in zip(counts, counts[1:]))


def test_bpe_train_then_encode_consistent(spark):
    # the learned table feeds bpe_encode: top token contains a learned merge
    texts = ["aaab aaab aaab cdcd cdcd"] * 4
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = [
        (r["a"], r["b"])
        for r in corpus.bpe_train(df, n_merges=3).orderBy("step").collect()
    ]
    assert merges[0] == ("a", "a")
    toks = {r["token"] for r in corpus.bpe_encode(df, merges, top_k=10).collect()}
    assert any(len(t) > 1 for t in toks)
