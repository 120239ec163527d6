"""Wave-69: windowed co-occurrence lift (vs brute reference; planted
collocation ranks above topical pairs; partition invariance) and
l-diversity audit (vs brute; homogeneous group fails, diverse passes)."""

from __future__ import annotations

import random
from collections import Counter

from pbf2json_spark import corpus, spatial


# --- co-occurrence lift -----------------------------------------------------------


def _brute_cooc(texts, window, min_pair):
    totals = Counter()
    pairs = Counter()
    t_pos = 0
    for t in texts:
        ws = t.split()
        t_pos += len(ws)
        for w in ws:
            totals[w] += 1
        for i in range(len(ws)):
            for j in range(i + 1, min(i + window + 1, len(ws))):
                a, b = sorted((ws[i], ws[j]))
                pairs[(a, b)] += 1
    out = {}
    for (a, b), c in pairs.items():
        if c < min_pair:
            continue
        num = c * t_pos * 1_000_000
        den = window * totals[a] * totals[b]
        out[(a, b)] = (c, totals[a], totals[b], num // den)
    return out


def test_cooc_vs_brute(spark):
    rnd = random.Random(69)
    texts = []
    filler = [f"w{i}" for i in range(30)]
    for _ in range(60):
        ws = [rnd.choice(filler) for _ in range(rnd.randrange(20, 60))]
        # plant the collocation "new york" at a few positions
        for _ in range(rnd.randrange(0, 3)):
            p = rnd.randrange(len(ws))
            ws[p:p] = ["new", "york"]
        texts.append(" ".join(ws))
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["term_a"], r["term_b"]): (r["n_pair"], r["n_a"], r["n_b"], r["lift_e6"])
        for r in corpus.cooccurrence_lift(df, "doc_id", window=3, min_pair=5).collect()
    }
    want = _brute_cooc(texts, 3, 5)
    assert got == want
    # the planted adjacent collocation lifts far above typical filler
    # pairs (individual rare-pair spikes exist — compare to the median)
    ny = got[("new", "york")][3]
    filler_lifts = sorted(
        v[3] for k, v in got.items()
        if k[0].startswith("w") and k[1].startswith("w")
    )
    assert ny > 5 * filler_lifts[len(filler_lifts) // 2]


def test_cooc_partition_invariance(spark):
    texts = [(i, "alpha beta gamma alpha beta " * 10) for i in range(8)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    a = sorted(map(tuple, corpus.cooccurrence_lift(df.repartition(1), "doc_id", 2, min_pair=1).collect()))
    b = sorted(map(tuple, corpus.cooccurrence_lift(df.repartition(7), "doc_id", 2, min_pair=1).collect()))
    assert a == b


# --- l-diversity ------------------------------------------------------------------


def test_l_diversity_vs_brute(spark):
    rnd = random.Random(169)
    rows = []
    # homogeneous cell: all same sensitive value
    rows += [("c1", "flu")] * 20
    # diverse cell
    rows += [("c2", rnd.choice(["flu", "cold", "ok", "none"])) for _ in range(40)]
    # two-value cell (fails l=3)
    rows += [("c3", "flu")] * 5 + [("c3", "ok")] * 5
    df = spark.createDataFrame(rows, "cell string, dx string")
    got = {
        r["cell"]: (r["n"], r["n_distinct"], r["top_share_e6"], r["diverse"])
        for r in spatial.l_diversity_audit(df, ["cell"], "dx", l_min=3).collect()
    }
    for cell in ("c1", "c2", "c3"):
        sub = [dx for c, dx in rows if c == cell]
        cnt = Counter(sub)
        n, nd, top = len(sub), len(cnt), max(cnt.values())
        assert got[cell] == (n, nd, (top * 1_000_000) // n, nd >= 3), cell
    assert not got["c1"][3] and got["c2"][3] and not got["c3"][3]
    assert got["c1"][2] == 1_000_000
