"""Wave-64: Kaplan-Meier survival (vs brute integer replica incl. heavy
censoring; censoring-vs-naive bias law; monotone curve) and SCAN
structural clustering (vs brute reference; two-clique-plus-bridge
taxonomy: cores/border/noise and hub behavior)."""

from __future__ import annotations

import random

from pbf2json_spark import graph, stats


# --- Kaplan-Meier -----------------------------------------------------------------


def _brute_km(rows, scale=1_000_000):
    """rows: [(t, event)] → [(t, n_risk, d, surv_e6)] at event times."""
    rows = sorted(rows)
    total = len(rows)
    from collections import Counter

    per_t = {}
    for t, e in rows:
        n, d = per_t.get(t, (0, 0))
        per_t[t] = (n + 1, d + e)
    out = []
    before = 0
    s = scale
    for t in sorted(per_t):
        n, d = per_t[t]
        risk = total - before
        if d > 0:
            s = (s * (risk - d)) // risk
            out.append((t, risk, d, s))
        before += n
    return out


def test_km_vs_brute(spark):
    rnd = random.Random(64)
    groups = {}
    for g in ("pages", "domains"):
        rows = []
        for _ in range(400):
            t = rnd.randrange(1, 30)
            e = 1 if rnd.random() < 0.7 else 0  # 30% censored
            rows.append((t, e))
        groups[g] = rows
    data = [(g, t, e) for g, rows in groups.items() for t, e in rows]
    df = spark.createDataFrame(data, "grp string, dur long, ev long")
    got = {}
    for r in stats.kaplan_meier(df, "dur", "ev", ["grp"]).collect():
        got.setdefault(r["grp"], []).append(
            (r["t"], r["n_risk"], r["n_event"], r["surv_e6"])
        )
    for g, rows in groups.items():
        assert sorted(got[g]) == _brute_km(rows), g
    # survival is monotone non-increasing in t
    for g in got:
        curve = [s for _, _, _, s in sorted(got[g])]
        assert all(a >= b for a, b in zip(curve, curve[1:]))


def test_km_censoring_beats_naive(spark):
    # half the population censored at t=10 while alive; true survival at
    # t=12 should stay high — KM uses censored rows through n_risk
    rows = [("g", 12, 1)] * 10 + [("g", 10, 0)] * 90
    df = spark.createDataFrame(rows, "grp string, dur long, ev long")
    out = stats.kaplan_meier(df, "dur", "ev", ["grp"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["t"], r["n_risk"], r["n_event"]) == (12, 10, 10)
    assert r["surv_e6"] == 0  # everyone still at risk at 12 died at 12
    # with censored rows contributing risk earlier, no event at t=10:
    # naive (dropping censored) would have shown the same t=12 collapse
    # from n_risk=10 — the censored mass held risk at 100 until t=10


def test_km_no_censoring_matches_empirical(spark):
    rows = [("g", t, 1) for t in (1, 1, 2, 3, 3, 3, 5, 8, 8, 9)]
    df = spark.createDataFrame(rows, "grp string, dur long, ev long")
    got = {
        r["t"]: r["surv_e6"]
        for r in stats.kaplan_meier(df, "dur", "ev", ["grp"]).collect()
    }
    # without censoring KM equals the empirical survivor function
    n = 10
    seen = 0
    from collections import Counter

    cnt = Counter(t for _, t, _ in rows)
    s = 1_000_000
    for t in sorted(cnt):
        risk = n - seen
        s = (s * (risk - cnt[t])) // risk
        seen += cnt[t]
        assert got[t] == s


# --- SCAN -------------------------------------------------------------------------


def _brute_scan(edges, eps_e3, mu):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    similar = set()
    for a, b in es:
        inter = len((adj[a] | {a}) & (adj[b] | {b}))
        if inter * inter * 1_000_000 >= eps_e3 * eps_e3 * (len(adj[a]) + 1) * (
            len(adj[b]) + 1
        ):
            similar.add((a, b))
    sdeg = {}
    for a, b in similar:
        sdeg[a] = sdeg.get(a, 0) + 1
        sdeg[b] = sdeg.get(b, 0) + 1
    cores = {n for n in nodes if sdeg.get(n, 0) >= mu - 1}
    # CC over similar core-core edges
    parent = {c: c for c in cores}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in similar:
        if a in cores and b in cores:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    # min member id per component
    comp = {}
    for c in cores:
        comp.setdefault(find(c), set()).add(c)
    lab = {}
    for root, members in comp.items():
        m = min(members)
        for c in members:
            lab[c] = m
    out = {}
    for n in nodes:
        if n in cores:
            out[n] = ("core", lab[n])
        else:
            cands = [
                lab[o]
                for a, b in similar
                for n2, o in ((a, b), (b, a))
                if n2 == n and o in cores
            ]
            if cands:
                out[n] = ("border", min(cands))
            else:
                out[n] = ("noise", None)
    return out


def test_scan_vs_brute(spark):
    rnd = random.Random(164)
    edges = []
    # two dense cliques + a bridge node + sparse noise
    for base in (0, 20):
        nodes = list(range(base, base + 7))
        for i, a in enumerate(nodes):
            for b in nodes[i + 1 :]:
                edges.append((a, b))
    edges += [(6, 50), (50, 20)]  # bridge
    for _ in range(25):
        edges.append((rnd.randrange(60, 90), rnd.randrange(60, 90)))
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long"
    )
    got = {
        r["node"]: (r["role"], r["cluster_id"])
        for r in graph.scan_clusters(df, eps_e3=600, mu=3).collect()
    }
    want = _brute_scan(edges, 600, 3)
    assert got == want
    # both cliques resolve as core clusters with distinct labels
    assert got[0][0] == "core" and got[21][0] == "core"
    assert got[0][1] != got[21][1]
