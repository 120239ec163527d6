"""Wave-44: greedy k-center coreset (vs brute greedy, radius law, k >= n)
and exact trimmed robust stats (vs python reference, outlier immunity)."""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F

from pbf2json_spark import ann, stats


# --- k-center --------------------------------------------------------------------


def _brute_kcenter(items, k):
    ids = sorted(i for i, _ in items)
    vecs = {i: np.asarray(v, dtype=np.float64) for i, v in items}
    picks = [(1, ids[0], -1.0)]
    mind = {i: float("inf") for i in ids}
    pv = vecs[ids[0]]
    for r in range(2, min(k, len(ids)) + 1):
        for i in ids:
            d = float(((vecs[i] - pv) ** 2).sum())
            if d < mind[i]:
                mind[i] = d
        cand = [i for i in ids if i not in {p[1] for p in picks}]
        best = max(cand, key=lambda i: (mind[i], -i))
        picks.append((r, best, mind[best]))
        pv = vecs[best]
    return picks


def test_kcenter_vs_brute(spark):
    rnd = random.Random(44)
    items = [
        (i, [rnd.gauss(0, 1) for _ in range(6)]) for i in range(60)
    ]
    df = spark.createDataFrame(items, "vec_id long, embedding array<double>")
    got = sorted(
        (
            (r["pick_rank"], r["vec_id"], r["dist"])
            for r in ann.kcenter_select(df, k=8).collect()
        )
    )
    exp = _brute_kcenter(items, 8)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in exp]
    for g, e in zip(got, exp):
        assert abs(g[2] - e[2]) < 1e-12
    # covering radius non-increasing after rank 2
    dists = [d for _, _, d in got[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_kcenter_k_exceeds_n(spark):
    items = [(i, [float(i), 0.0]) for i in range(4)]
    df = spark.createDataFrame(items, "vec_id long, embedding array<double>")
    got = ann.kcenter_select(df, k=10).collect()
    assert len(got) == 4
    assert {r["vec_id"] for r in got} == {0, 1, 2, 3}


# --- trimmed stats ---------------------------------------------------------------


def _ref_trimmed(vals, lo, hi):
    a = np.asarray(sorted(vals), dtype=np.float64)
    n = len(a)

    def q(p):
        # linear interpolation, the percentile/quantile_cont definition
        idx = p * (n - 1)
        f = int(np.floor(idx))
        c = min(f + 1, n - 1)
        return a[f] + (idx - f) * (a[c] - a[f])

    ql, qh = q(lo), q(hi)
    kept = [v for v in vals if ql <= v <= qh]
    return ql, qh, len(kept), sum(kept), sum(kept) / len(kept)


def test_trimmed_stats_vs_reference(spark):
    rnd = random.Random(42)
    rows = []
    data = {"a": [], "b": []}
    for g in ("a", "b"):
        for _ in range(200):
            v = rnd.randrange(10, 5000)
            rows.append((g, v))
            data[g].append(v)
    # heavy outliers that must not move the trimmed mean band
    rows += [("a", 10_000_000)] * 3
    data["a"] += [10_000_000] * 3
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: (r["q_lo"], r["q_hi"], r["n_kept"], r["sum_kept"], r["trimmed_mean"])
        for r in stats.trimmed_stats(df, "v", ["g"]).collect()
    }
    for g, vals in data.items():
        ql, qh, n, s, m = _ref_trimmed(vals, 0.1, 0.9)
        assert got[g][0] == ql and got[g][1] == qh, g
        assert got[g][2] == n and got[g][3] == s, g
        assert got[g][4] == m, g


def test_trimmed_outlier_immunity(spark):
    base = [(i % 2, 100 + (i % 7)) for i in range(100)]
    spoiled = base + [(0, 10**12)]
    d1 = spark.createDataFrame(base, "g int, v long")
    d2 = spark.createDataFrame(spoiled, "g int, v long")
    m1 = {r["g"]: r["trimmed_mean"] for r in stats.trimmed_stats(d1, "v", ["g"]).collect()}
    m2 = {r["g"]: r["trimmed_mean"] for r in stats.trimmed_stats(d2, "v", ["g"]).collect()}
    assert abs(m1[0] - m2[0]) < 1.0  # the 10^12 outlier barely moves it
    naive = d2.filter("g = 0").agg(F.avg("v")).collect()[0][0]
    assert naive > 10**9  # while the naive mean explodes
