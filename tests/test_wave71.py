"""Wave-71: rank-biased overlap (vs brute RBO reference; identical
rankings → Σcoef; disjoint → 0; top-weighting law) and Benjamini-Hochberg
FDR (vs brute BH incl. ties; null-uniform p rejects ≈ nothing, planted
signal block rejected)."""

from __future__ import annotations

import random

from pbf2json_spark import ranking, stats


# --- RBO --------------------------------------------------------------------------


def _brute_rbo(la, lb, depth, pf):
    """la/lb: item lists in rank order (1-based)."""
    rbo_e12 = 0
    for d in range(1, depth + 1):
        ov = len(set(la[:d]) & set(lb[:d]))
        w = round((1.0 - pf) * (pf ** (d - 1)) / d * 1_000_000_000_000)
        rbo_e12 += w * ov
    osum = sum(len(set(la[:d]) & set(lb[:d])) for d in range(1, depth + 1))
    nd = sum(1 for d in range(1, depth + 1) if len(set(la[:d]) & set(lb[:d])) > 0)
    return nd, osum, rbo_e12


def test_rbo_vs_brute(spark):
    rnd = random.Random(71)
    rows_a, rows_b, expect = [], [], {}
    for q in range(15):
        items = [f"i{j}" for j in range(30)]
        la = items[:]
        rnd.shuffle(la)
        lb = la[:]
        # perturb: swap some positions, replace tail items
        for _ in range(rnd.randrange(0, 8)):
            i, j = rnd.randrange(20), rnd.randrange(20)
            lb[i], lb[j] = lb[j], lb[i]
        for t in range(rnd.randrange(0, 5)):
            lb[19 - t] = f"x{t}"
        rows_a += [(q, it, r + 1) for r, it in enumerate(la[:20])]
        rows_b += [(q, it, r + 1) for r, it in enumerate(lb[:20])]
        expect[q] = _brute_rbo(la[:20], lb[:20], 20, 0.9)
    da = spark.createDataFrame(rows_a, "qid long, item string, rank long")
    db = spark.createDataFrame(rows_b, "qid long, item string, rank long")
    got = {
        r["qid"]: (r["n_depths"], r["overlap_sum"], r["rbo_e12"])
        for r in ranking.rank_biased_overlap(da, db, depth=20).collect()
    }
    assert set(got) == set(expect)
    for q in got:
        assert got[q] == expect[q], q


def test_rbo_extremes_and_topweight(spark):
    ident = [(0, f"i{r}", r + 1) for r in range(20)]
    da = spark.createDataFrame(ident, "qid long, item string, rank long")
    got = ranking.rank_biased_overlap(da, da, depth=20).collect()[0]
    want = sum((1 - 0.9) * 0.9 ** (d - 1) for d in range(1, 21))  # ov=d ⇒ /d·d
    assert abs(got["rbo"] - want) < 1e-9
    # disjoint lists → 0
    db = spark.createDataFrame([(0, f"z{r}", r + 1) for r in range(20)],
                               "qid long, item string, rank long")
    got0 = ranking.rank_biased_overlap(da, db, depth=20).collect()[0]
    assert got0["rbo"] == 0.0 and got0["overlap_sum"] == 0
    # a swap at depth 1-2 hurts more than a swap at 19-20
    top = [x[:] for x in [list(r) for r in ident]]
    lb_top = [f"i{r}" for r in range(20)]
    lb_top[0], lb_top[1] = lb_top[1], lb_top[0]
    lb_bot = [f"i{r}" for r in range(20)]
    lb_bot[18], lb_bot[19] = lb_bot[19], lb_bot[18]
    dt = spark.createDataFrame([(0, it, r + 1) for r, it in enumerate(lb_top)],
                               "qid long, item string, rank long")
    dbot = spark.createDataFrame([(0, it, r + 1) for r, it in enumerate(lb_bot)],
                                 "qid long, item string, rank long")
    r_top = ranking.rank_biased_overlap(da, dt, depth=20).collect()[0]["rbo"]
    r_bot = ranking.rank_biased_overlap(da, dbot, depth=20).collect()[0]["rbo"]
    assert r_top < r_bot


# --- BH FDR -----------------------------------------------------------------------


def _brute_bh(ps, q_e6):
    m = len(ps)
    order = sorted(range(m), key=lambda i: ps[i])
    # tie-block max rank per p value
    from collections import Counter
    cnt = Counter(ps)
    cum = {}
    acc = 0
    for v in sorted(cnt):
        acc += cnt[v]
        cum[v] = acc
    kstar = 0
    for v in sorted(cnt):
        if v * m <= cum[v] * q_e6:
            kstar = max(kstar, cum[v])
    return {i: (cum[ps[i]], cum[ps[i]] <= kstar) for i in range(m)}


def test_bh_vs_brute(spark):
    rnd = random.Random(171)
    # 500 null-uniform p-values + 30 planted tiny ones, with ties
    ps = [rnd.randrange(0, 1_000_001) // 1000 * 1000 for _ in range(500)]
    ps += [rnd.randrange(0, 60) for _ in range(30)]
    rows = [(i, p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "tid long, p_e6 long")
    got = {
        r["tid"]: (r["bh_rank"], r["m_tests"], r["rejected"])
        for r in stats.bh_fdr(df, "p_e6", q_e6=50_000).collect()
    }
    want = _brute_bh(ps, 50_000)
    assert len(got) == len(ps)
    for i in got:
        assert got[i][1] == len(ps)
        assert (got[i][0], got[i][2]) == want[i], i
    # the planted block is rejected, the null block mostly survives
    rej_planted = sum(1 for i in range(500, 530) if got[i][2])
    rej_null = sum(1 for i in range(500) if got[i][2])
    assert rej_planted == 30
    assert rej_null < 30


def test_bh_no_signal_rejects_nothing(spark):
    rows = [(i, 200_000 + i * 1500) for i in range(400)]
    df = spark.createDataFrame(rows, "tid long, p_e6 long")
    got = stats.bh_fdr(df, "p_e6", q_e6=50_000).collect()
    assert all(not r["rejected"] for r in got)
