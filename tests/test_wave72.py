"""Wave-72 operators: top-k vocabulary coverage curve, Good-Turing
frequency-of-frequencies / unseen-mass — both verified against brute-force
Python references on tie-heavy synthetic corpora."""

from __future__ import annotations

from collections import Counter

import pytest

from pbf2json_spark import corpus


def _toks(texts):
    c = Counter()
    for t in texts:
        c.update(t.split())
    return c


def _brute_coverage(texts, ks):
    c = _toks(texts)
    total = sum(c.values())
    freqs = sorted(c.values(), reverse=True)
    out = {}
    for k in ks:
        out[k] = sum(freqs[:k]) if k < len(freqs) else total
    return total, out


def _corpus():
    # tie-heavy: many types sharing counts, so k-cuts land inside tie
    # blocks; a few heavy heads; empty and single-token docs
    texts = []
    texts += ["the the the the the quick fox"] * 10
    texts += ["alpha beta gamma delta"] * 7
    texts += [f"rare{i}" for i in range(25)]          # 25 singletons
    texts += ["pair%d pair%d" % (i, i) for i in range(10)]  # counts of 2
    texts += ["", "   ", "solo"]
    return texts


@pytest.fixture(scope="module")
def docs(spark):
    texts = _corpus()
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_vocab_coverage_vs_brute(spark, docs):
    texts = _corpus()
    ks = [1, 2, 3, 5, 10, 37, 10_000]
    total, want = _brute_coverage(texts, ks)
    got = {
        r["k"]: r
        for r in corpus.vocab_coverage(docs, ks).collect()
    }
    assert set(got) == set(ks)
    for k in ks:
        assert got[k]["total"] == total
        assert got[k]["covered"] == want[k], k
        assert got[k]["coverage_e6"] == want[k] * 1_000_000 // total
    # monotone non-decreasing in k; saturates at vocab
    cov = [got[k]["covered"] for k in sorted(ks)]
    assert cov == sorted(cov)
    assert got[10_000]["covered"] == total


def test_vocab_coverage_tie_block_cut(spark):
    # EVERY type has count 3: any k cuts inside one tie block and the
    # result must be exactly 3k occurrences regardless of tie order
    texts = [f"t{i} t{i} t{i}" for i in range(20)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["k"]: r["covered"]
           for r in corpus.vocab_coverage(df, [1, 7, 13, 20, 21]).collect()}
    assert got == {1: 3, 7: 21, 13: 39, 20: 60, 21: 60}


def test_vocab_coverage_rejects_bad_ks(spark, docs):
    with pytest.raises(ValueError):
        corpus.vocab_coverage(docs, [])
    with pytest.raises(ValueError):
        corpus.vocab_coverage(docs, [5, 0])


def test_good_turing_vs_brute(spark, docs):
    texts = _corpus()
    c = _toks(texts)
    n = sum(c.values())
    ff = Counter(c.values())
    rows = {r["r"]: r for r in corpus.good_turing_mass(docs, max_r=5).collect()}
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    for r in range(1, 6):
        assert rows[r]["n_r"] == ff.get(r, 0), r
        assert rows[r]["n"] == n
        assert rows[r]["p0_e6"] is None
    assert rows[0]["n_r"] == ff.get(1, 0)
    assert rows[0]["p0_e6"] == ff.get(1, 0) * 1_000_000 // n


def test_good_turing_no_singletons(spark):
    # every type occurs twice: N1 = 0, unseen mass estimate 0
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c")], "doc_id long, text string"
    )
    rows = {r["r"]: r for r in corpus.good_turing_mass(df, max_r=3).collect()}
    assert rows[0]["n_r"] == 0 and rows[0]["p0_e6"] == 0
    assert rows[2]["n_r"] == 3
    assert rows[1]["n_r"] == 0 and rows[3]["n_r"] == 0
