"""Wave-29 operators: Kolmogorov-Smirnov divergence vs global, KWIC
concordance — vs brute-force references."""

from __future__ import annotations

import random
from collections import Counter

from pbf2json_spark import corpus, stats


# --- ks_divergence -----------------------------------------------------------


def _brute_ks(rows):
    gvals = sorted(v for _g, v in rows)
    nn = len(gvals)
    gcount = Counter(gvals)
    grid = sorted(gcount)
    out = {}
    for g in {g for g, _v in rows}:
        mine = Counter(v for gg, v in rows if gg == g)
        n = sum(mine.values())
        cg = c = best = 0
        for v in grid:
            cg += mine.get(v, 0)
            c += gcount[v]
            d = abs(cg * nn - c * n) * 1_000_000 // (n * nn)
            best = max(best, d)
        out[g] = (n, best)
    return out


def test_ks_divergence_vs_brute(spark):
    rng = random.Random(291)
    rows = []
    for _ in range(400):
        rows.append(("bulk", rng.randrange(0, 100)))
    for _ in range(80):
        rows.append(("shifted", rng.randrange(50, 150)))   # shifted right
    for _ in range(60):
        rows.append(("match", rng.randrange(0, 100)))
    df = spark.createDataFrame(rows, "src string, v long")
    got = {r["src"]: (r["n"], r["ks_e6"])
           for r in stats.ks_divergence(df, ["src"], "v").collect()}
    assert got == _brute_ks(rows)
    assert got["shifted"][1] > got["match"][1]


def test_ks_shift_invisible_to_chi2_like_counting(spark):
    # same VALUES present, different order statistics: a pure +10 shift
    # of a uniform integer grid — every value common globally, KS large
    rows = [("a", v) for v in range(50)] + [("b", v + 10) for v in range(50)]
    df = spark.createDataFrame(rows, "src string, v long")
    got = {r["src"]: (r["n"], r["ks_e6"])
           for r in stats.ks_divergence(df, ["src"], "v").collect()}
    assert got == _brute_ks(rows)
    assert got["a"][1] > 0 and got["b"][1] > 0


# --- kwic --------------------------------------------------------------------


def _brute_kwic(docs, term, width):
    out = []
    for did, text in docs:
        ws = text.split()
        for i, w in enumerate(ws):
            if w == term:
                lo = max(0, i - width)
                hi = min(len(ws), i + width + 1)
                out.append((did, i + 1, " ".join(ws[lo:hi])))
    return sorted(out)


def test_kwic_vs_brute(spark):
    rng = random.Random(292)
    vocab = ["scan", "merge", "target", "hash", "sort", "batch"]
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randrange(1, 15))))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted((r["doc_id"], r["pos"], r["context"])
                 for r in corpus.kwic(df, "target", width=2).collect())
    assert got == _brute_kwic(docs, "target", 2)
    assert got, "term never sampled — bad seed"


def test_kwic_edges(spark):
    docs = [(1, "target a b c"), (2, "a b c target"), (3, "target"),
            (4, "x target target y")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted((r["doc_id"], r["pos"], r["context"])
                 for r in corpus.kwic(df, "target", width=3).collect())
    assert got == _brute_kwic(docs, "target", 3)
    assert (4, 2, "x target target y") in got and (4, 3, "x target target y") in got
