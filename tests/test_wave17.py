"""Wave-17 operators: histogram quantiles, concentration indices,
trajectory minhash-LSH pairs."""

from __future__ import annotations

import random
from collections import Counter

from pbf2json_spark import stats, trajectory


# --- hist_quantiles ----------------------------------------------------------


def _brute_hist_q(values, bin_width, percents):
    bins = Counter(v // bin_width for v in values)
    tot = len(values)
    out = {"n_total": tot}
    for p in percents:
        cum = 0
        for b in sorted(bins):
            cum += bins[b]
            if cum * 100 >= tot * p:
                out[f"p{p}"] = b * bin_width
                break
    return out


def test_hist_quantiles_hand(spark):
    # ten values 0..90 step 10, width 10: p50 is the 5th value's bin
    rows = [("a", v) for v in range(0, 100, 10)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = stats.hist_quantiles(df, ["g"], "v", 10, [50, 90, 100]).collect()[0]
    assert (r["n_total"], r["p50"], r["p90"], r["p100"]) == (10, 40, 80, 90)


def test_hist_quantiles_single_bin(spark):
    df = spark.createDataFrame([("a", 5), ("a", 7)], "g string, v long")
    r = stats.hist_quantiles(df, ["g"], "v", 100, [1, 99]).collect()[0]
    assert (r["p1"], r["p99"]) == (0, 0)


def test_hist_quantiles_vs_brute_random(spark):
    rng = random.Random(101)
    rows = [(rng.choice("xy"), rng.randrange(10_000)) for _ in range(800)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r.asDict()
           for r in stats.hist_quantiles(df, ["g"], "v", 250,
                                         [10, 50, 90, 99]).collect()}
    for g in "xy":
        vals = [v for gg, v in rows if gg == g]
        want = _brute_hist_q(vals, 250, [10, 50, 90, 99])
        for k, v in want.items():
            assert got[g][k] == v, (g, k)


# --- concentration -----------------------------------------------------------


def test_concentration_single_item(spark):
    df = spark.createDataFrame([("h", "t")] * 4, "g string, i string")
    r = stats.concentration(df, ["g"], "i").collect()[0]
    assert (r["n_items"], r["n_total"], r["top_share_e6"], r["hhi_e8"]) == \
        (1, 4, 1_000_000, 100_000_000)


def test_concentration_uniform(spark):
    df = spark.createDataFrame([("h", str(i)) for i in range(4)],
                               "g string, i string")
    r = stats.concentration(df, ["g"], "i").collect()[0]
    # 4 equal items: top share 1/4, hhi = 4 * (1/4)^2 = 1/4
    assert (r["n_items"], r["top_share_e6"], r["hhi_e8"]) == \
        (4, 250_000, 25_000_000)


def test_concentration_vs_brute_random(spark):
    rng = random.Random(103)
    rows = [(rng.choice("ab"), str(rng.randrange(6))) for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, i string")
    got = {r["g"]: r.asDict()
           for r in stats.concentration(df, ["g"], "i").collect()}
    for g in "ab":
        c = Counter(i for gg, i in rows if gg == g)
        tot = sum(c.values())
        assert got[g]["n_items"] == len(c)
        assert got[g]["n_total"] == tot
        assert got[g]["top_share_e6"] == max(c.values()) * 1_000_000 // tot
        assert got[g]["hhi_e8"] == \
            sum(v * v for v in c.values()) * 100_000_000 // (tot * tot)


# --- cell_minhash_pairs ------------------------------------------------------


def test_cell_minhash_recall_vs_exact(spark):
    # clusters of users sharing most cells + singletons: LSH at 2 rows
    # per band must recover every high-jaccard pair, verify kills FPs
    rng = random.Random(107)
    rows = []
    for cluster in range(4):
        base = [(rng.uniform(-60, 60), rng.uniform(-60, 60))
                for _ in range(12)]
        for m in range(3):
            u = cluster * 10 + m
            pts = base + [(rng.uniform(-60, 60), rng.uniform(-60, 60))]
            rows += [(u, lat, lon) for lat, lon in pts]
    for u in range(100, 105):  # noise users, disjoint areas
        rows += [(u, rng.uniform(70, 80), rng.uniform(100, 110))
                 for _ in range(5)]
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    exact = {(r["user_a"], r["user_b"]): r["jaccard_e6"]
             for r in trajectory.cell_jaccard(df, 6).collect()
             if r["jaccard_e6"] >= 600_000}
    got = {(r["user_a"], r["user_b"]): r["jaccard_e6"]
           for r in trajectory.cell_minhash_pairs(
               df, 6, num_perm=32, bands=16,
               threshold_e6=600_000).collect()}
    # verify step = exact jaccard -> values match exactly where found
    for k, v in got.items():
        assert exact[k] == v
    # high-sim recall at 2 rows/band: every cluster pair found
    assert set(exact) == set(got)


def test_cell_minhash_threshold_filters(spark):
    rows = [(1, 10.0, 10.0), (1, 20.0, 20.0),
            (2, 10.0, 10.0), (2, 50.0, 50.0)]
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    got = trajectory.cell_minhash_pairs(
        df, 5, num_perm=32, bands=32, threshold_e6=900_000).collect()
    assert got == []  # jaccard 1/3 < 0.9 — verify rejects the candidate
