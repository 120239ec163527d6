"""Wave-67: blocking-quality metrics (vs brute RR/PC/PQ; perfect and
useless blockers; dup dedup law) and contiguous sequence triples (vs
brute; support-vs-occurrence bot law; ts-tie determinism)."""

from __future__ import annotations

import random

from pbf2json_spark import dedup, temporal


# --- blocking quality -------------------------------------------------------------


def test_blocking_quality_vs_brute(spark):
    rnd = random.Random(67)
    gold = {(i, 1000 + i) for i in range(50)}
    cand = set()
    for i in range(50):
        if i % 5 != 0:  # blocker misses every 5th true pair
            cand.add((i, 1000 + i))
    for _ in range(200):
        cand.add((rnd.randrange(100), 1000 + rnd.randrange(100)))
    dup = next(iter(cand))  # a literal duplicate row must not double-count
    cdf = spark.createDataFrame(
        [(a, b) for a, b in cand] + [dup], "id_l long, id_r long"
    )
    gdf = spark.createDataFrame(sorted(gold), "id_l long, id_r long")
    row = dedup.blocking_quality(cdf, gdf, n_left=100, n_right=100).collect()[0]
    n_hit = len(cand & gold)
    assert row["n_cand"] == len(cand) and row["n_gold"] == 50
    assert row["n_hit"] == n_hit
    assert row["rr_e6"] == ((10000 - len(cand)) * 1_000_000) // 10000
    assert row["pc_e6"] == (n_hit * 1_000_000) // 50
    assert row["pq_e6"] == (n_hit * 1_000_000) // len(cand)


def test_blocking_quality_extremes(spark):
    gold = [(1, 11), (2, 12)]
    gdf = spark.createDataFrame(gold, "id_l long, id_r long")
    # perfect blocker: candidates == gold
    row = dedup.blocking_quality(gdf, gdf, 10, 10).collect()[0]
    assert row["pc_e6"] == 1_000_000 and row["pq_e6"] == 1_000_000
    assert row["rr_e6"] == (98 * 1_000_000) // 100
    # useless blocker: cross product
    allp = [(a, 10 + b) for a in range(10) for b in range(10)]
    adf = spark.createDataFrame(allp, "id_l long, id_r long")
    row = dedup.blocking_quality(adf, gdf, 10, 10).collect()[0]
    assert row["rr_e6"] == 0 and row["pc_e6"] == 1_000_000


# --- sequence triples -------------------------------------------------------------


def _brute_triples(rows, min_support):
    streams = {}
    for k, ts, tb, t in rows:
        streams.setdefault(k, []).append((ts, tb, t))
    trip = {}
    for k, evs in streams.items():
        evs.sort()
        seen_here = set()
        for i in range(len(evs) - 2):
            key = (evs[i][2], evs[i + 1][2], evs[i + 2][2])
            n, s = trip.get(key, (0, set()))
            trip[key] = (n + 1, s | {k})
    out = {}
    for key, (n, ks) in trip.items():
        if len(ks) >= min_support:
            out[key] = (len(ks), n)
    return out


def test_triples_vs_brute(spark):
    rnd = random.Random(167)
    rows = []
    # population: many users do view->click->purchase once
    for u in range(30):
        rows += [(u, 10, 0, "view"), (u, 20, 1, "click"), (u, 30, 2, "purchase")]
    # one bot loops view->view->view a thousand times
    for i in range(1000):
        rows.append((999, i, i, "view"))
    # ties: same ts ordered by tiebreak
    rows += [(5, 40, 0, "a"), (5, 40, 1, "b"), (5, 40, 2, "c")]
    df = spark.createDataFrame(rows, "k long, ts long, tb long, t string")
    got = {
        (r["t1"], r["t2"], r["t3"]): (r["support"], r["occurrences"])
        for r in temporal.seq_triples(df, "k", "ts", "tb", "t",
                                      min_support=1).collect()
    }
    want = _brute_triples(rows, 1)
    assert got == want
    # the bot's triple has huge occurrences but support 1
    assert got[("view", "view", "view")][0] == 1
    assert got[("view", "view", "view")][1] == 998
    assert got[("view", "click", "purchase")][0] == 30
