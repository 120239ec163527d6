"""Wave-27 operators: reciprocal-rank fusion and BPE merge-table
encoding — vs brute-force references."""

from __future__ import annotations

import random
from collections import Counter

from pbf2json_spark import corpus


# --- rrf_fuse ----------------------------------------------------------------


def _brute_rrf(rank_lists, k_const, top_k):
    acc: dict[int, list[int]] = {}
    for rl in rank_lists:
        ordered = sorted(rl, key=lambda t: (-t[1], t[0]))
        for i, (doc, _s) in enumerate(ordered, start=1):
            acc.setdefault(doc, []).append(1_000_000 // (k_const + i))
    fused = [(d, len(ts), sum(ts)) for d, ts in acc.items()]
    fused.sort(key=lambda t: (-t[2], t[0]))
    return fused[:top_k]


def test_rrf_fuse_vs_brute(spark):
    rng = random.Random(271)
    r1 = [(d, rng.randrange(1000)) for d in rng.sample(range(100), 25)]
    r2 = [(d, rng.randrange(1000)) for d in rng.sample(range(100), 25)]
    r3 = [(d, rng.randrange(1000)) for d in rng.sample(range(100), 10)]
    dfs = [spark.createDataFrame(r, "doc_id long, score long")
           for r in (r1, r2, r3)]
    got = [(r["doc_id"], r["n_rankers"], r["rrf_e6"])
           for r in corpus.rrf_fuse(dfs, top_k=15).collect()]
    assert got == _brute_rrf([r1, r2, r3], 60, 15)


def test_rrf_overlap_beats_single_ranker(spark):
    # doc 1 is rank-1 in both rankers; doc 2 is rank-1 in one only
    r1 = [(1, 100), (2, 0), (3, 50)]
    r2 = [(1, 9), (4, 5)]
    dfs = [spark.createDataFrame(r, "doc_id long, score long")
           for r in (r1, r2)]
    rows = corpus.rrf_fuse(dfs, top_k=5).collect()
    assert rows[0]["doc_id"] == 1 and rows[0]["n_rankers"] == 2


# --- bpe_encode --------------------------------------------------------------


def _brute_bpe(docs, merges, top_k, cap=128):
    cnt: Counter[str] = Counter()
    for text in docs:
        for w in text.split():
            syms = list(w)[:cap]
            for a, b in merges:
                # merge ALL (a,b) adjacencies, left-to-right greedy
                out = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cnt.update(syms)
    return sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:top_k]


def test_bpe_encode_vs_brute(spark):
    rng = random.Random(272)
    vocab = ["the", "there", "other", "ababab", "aaaa", "abababababab",
             "scan", "hash", "shuffle", "thethethe"]
    docs = [" ".join(rng.choices(vocab, k=30)) for _ in range(40)]
    merges = [("t", "h"), ("th", "e"), ("a", "b"), ("ab", "ab"),
              ("s", "c"), ("a", "a")]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    got = [(r["token"], r["cnt"])
           for r in corpus.bpe_encode(df, merges, top_k=20).collect()]
    assert got == _brute_bpe(docs, merges, 20)


def test_bpe_alternating_chain_fixpoint(spark):
    # "abababab" with (a,b): every pair must merge despite shared
    # boundary spaces (the multi-pass fixpoint case)
    df = spark.createDataFrame([("abababab ab",)], "text string")
    got = dict((r["token"], r["cnt"])
               for r in corpus.bpe_encode(df, [("a", "b")], top_k=5).collect())
    assert got == {"ab": 5}
