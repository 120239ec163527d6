"""Wave-61: TextTiling segmentation (vs brute multiset-overlap reference;
planted topic shift recovered; short docs emit nothing) and popularity-
tempered negative sampling (vs brute md5/range replica; empirical
frequency tracks f^0.75; determinism across partitionings)."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

from pbf2json_spark import corpus, sampling


# --- TextTiling -------------------------------------------------------------------


def _brute_tiles(text, block=20):
    ws = text.split()
    blocks = [ws[i : i + block] for i in range(0, len(ws), block)]
    if len(blocks) < 2:
        return {}
    ovs = []
    for g in range(len(blocks) - 1):
        a, b = Counter(blocks[g]), Counter(blocks[g + 1])
        ovs.append(sum(min(a[w], b[w]) for w in a))
    out = {}
    for g, ov in enumerate(ovs):
        prev = ovs[g - 1] if g > 0 else None
        nxt = ovs[g + 1] if g + 1 < len(ovs) else None
        ib = prev is not None and nxt is not None and ov < prev and ov <= nxt
        out[g] = (ov, prev, nxt, ib)
    return out


def test_tiles_vs_brute(spark):
    rnd = random.Random(61)
    voc_a = [f"cat{i}" for i in range(15)]
    voc_b = [f"geo{i}" for i in range(15)]
    docs = []
    for i in range(25):
        # two topical halves → boundary near the middle
        wa = [rnd.choice(voc_a) for _ in range(rnd.randrange(60, 140))]
        wb = [rnd.choice(voc_b) for _ in range(rnd.randrange(60, 140))]
        docs.append((i, " ".join(wa + wb)))
    docs.append((100, "tiny doc"))
    docs.append((101, ""))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = corpus.text_tiles(df).collect()
    got = {}
    for r in rows:
        got.setdefault(r["id"], {})[r["gap"]] = (
            r["overlap"], r["prev_overlap"], r["next_overlap"], r["is_boundary"]
        )
    for i, text in docs:
        want = _brute_tiles(text)
        assert got.get(i, {}) == want, i
    # at least half the two-topic docs show a detected boundary
    with_boundary = sum(
        1 for i, _ in docs[:25] if any(v[3] for v in got.get(i, {}).values())
    )
    assert with_boundary >= 13


# --- tempered negatives -----------------------------------------------------------


def _brute_tempered(items, queries, k, seed):
    cat = []
    for it, f in sorted(items):
        w = math.floor(math.sqrt(f * math.sqrt(f)) * 64.0)
        if w > 0:
            cat.append((it, w))
    total = sum(w for _, w in cat)
    ranges = []
    lo = 0
    for it, w in cat:
        ranges.append((it, lo, lo + w - 1))
        lo += w
    out = set()
    for q in queries:
        for slot in range(k):
            u = int(
                hashlib.md5(f"{q}:{seed}:{slot}".encode()).hexdigest()[:15], 16
            ) % total
            for it, a, b in ranges:
                if a <= u <= b:
                    out.add((q, slot, it))
                    break
    return out


def test_tempered_vs_brute(spark):
    rnd = random.Random(161)
    items = [(f"it{i}", rnd.randrange(1, 400)) for i in range(50)]
    queries = list(range(40))
    idf = spark.createDataFrame(items, "item string, f long")
    qdf = spark.createDataFrame([(q,) for q in queries], "qid long")
    got = {
        (r["query"], r["slot"], r["item"])
        for r in sampling.tempered_negatives(idf, qdf, k=5, seed=3).collect()
    }
    want = _brute_tempered(items, queries, 5, 3)
    assert got == want
    # partition invariance
    got13 = {
        (r["query"], r["slot"], r["item"])
        for r in sampling.tempered_negatives(
            idf.repartition(7), qdf.repartition(13), k=5, seed=3
        ).collect()
    }
    assert got13 == got


def test_tempered_tracks_power_law(spark):
    # one very popular item vs many rare: popular should be drawn
    # roughly (400/1)^0.75 ≈ 89x as often as a single rare item
    items = [("hot", 400)] + [(f"cold{i}", 1) for i in range(40)]
    idf = spark.createDataFrame(items, "item string, f long")
    qdf = spark.createDataFrame([(q,) for q in range(300)], "qid long")
    rows = sampling.tempered_negatives(idf, qdf, k=4, seed=0).collect()
    n_hot = sum(1 for r in rows if r["item"] == "hot")
    share = n_hot / len(rows)
    w_hot = math.floor(math.sqrt(400 * math.sqrt(400)) * 64)
    w_cold = math.floor(math.sqrt(1 * 1) * 64)
    expect = w_hot / (w_hot + 40 * w_cold)
    assert abs(share - expect) < 0.07
