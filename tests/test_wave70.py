"""Wave-70: adjusted Rand index (vs sklearn-free brute; identical = 1,
permuted labels = 1, random ≈ 0)."""

from __future__ import annotations

import random
from collections import Counter

from pbf2json_spark import cluster


# --- ARI --------------------------------------------------------------------------


def _brute_ari(pairs):
    n = len(pairs)
    ct = Counter(pairs)
    am = Counter(a for a, _ in pairs)
    bm = Counter(b for _, b in pairs)

    def c2(x):
        return x * (x - 1) // 2

    I = sum(c2(c) for c in ct.values())
    A = sum(c2(c) for c in am.values())
    B = sum(c2(c) for c in bm.values())
    cn2 = c2(n)
    num = 2 * (cn2 * I - A * B)
    den = cn2 * (A + B) - 2 * A * B
    return (n, I, A, B, num, den, num / den if den else None)


def test_ari_vs_brute(spark):
    rnd = random.Random(70)
    pairs = [(f"a{rnd.randrange(4)}", f"b{rnd.randrange(5)}") for _ in range(600)]
    df = spark.createDataFrame(pairs, "la string, lb string")
    r = cluster.adjusted_rand(df, "la", "lb").collect()[0]
    want = _brute_ari(pairs)
    got = (r["n"], r["sum_comb"], r["a_comb"], r["b_comb"],
           r["ari_num"], r["ari_den"], r["ari"])
    assert got[:6] == want[:6]
    assert abs(got[6] - want[6]) < 1e-12
    assert abs(got[6]) < 0.1  # independent labelings ≈ 0


def test_ari_identical_and_permuted(spark):
    rows = [(f"c{i % 3}", f"x{(i % 3 + 1) % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "la string, lb string")
    r = cluster.adjusted_rand(df, "la", "lb").collect()[0]
    assert r["ari"] == 1.0  # a pure relabeling is a perfect match


def test_cluster_purity(spark):
    rows = [("k1", "a")] * 8 + [("k1", "b")] * 2 + [("k2", "b")] * 10
    df = spark.createDataFrame(rows, "k string, c string")
    r = cluster.cluster_purity(df, "k", "c").collect()[0]
    assert (r["n"], r["n_clusters"], r["n_classes"]) == (20, 2, 2)
    assert r["purity_e6"] == (18 * 1_000_000) // 20
    assert r["ipurity_e6"] == (18 * 1_000_000) // 20
    # degenerate: everything in one cluster → inverse purity rewards it
    df2 = spark.createDataFrame([("k", f"c{i % 4}") for i in range(40)],
                                "k string, c string")
    r2 = cluster.cluster_purity(df2, "k", "c").collect()[0]
    assert r2["ipurity_e6"] == 1_000_000 and r2["purity_e6"] == 250_000
