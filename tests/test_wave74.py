"""Wave-74: winnowing fingerprints (Schleimer et al. 2003) vs a brute
Python replica — selection exactness, the ≥ w+k−1 shared-fingerprint
guarantee, short-doc handling, and density."""

from __future__ import annotations

import pytest

from pbf2json_spark import textops


def _brute(text, k, w):
    mod = textops.CDC_MOD
    pows = textops._cdc_pows(257, k, mod)
    n = len(text)
    if n < k:
        return set()
    hs = [
        sum(ord(text[i + j]) * p for j, p in enumerate(pows)) % mod
        for i in range(n - k + 1)
    ]
    we = min(w, len(hs))
    out = set()
    for s in range(len(hs) - we + 1):
        window = hs[s:s + we]
        mn = min(window)
        rj = max(j for j, h in enumerate(window) if h == mn)
        out.add((s + rj + 1, mn))  # 1-based k-gram start
    return out


def _run(spark, texts, k=8, w=4):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in textops.winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r["id"], set()).add((r["pos"], r["fp"]))
    return got


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "aaaaaaaaaaaaaaaaaaaa",          # all-tied hashes: rightmost-min rule
    "short",                          # < k: no fingerprints
    "exactly8!",                      # one hash only: one fingerprint
    "abcdefghij",                     # fewer hashes than w: whole-list window
    "",
]


def test_winnow_vs_brute(spark):
    got = _run(spark, TEXTS)
    for i, t in enumerate(TEXTS):
        assert got.get(i, set()) == _brute(t, 8, 4), (i, t)


def test_winnow_match_guarantee(spark):
    # any shared substring of length >= w + k - 1 must share a fingerprint
    k, w = 8, 4
    shared = "zqxwvutsrqponmlk"        # len 16 >= 11
    a = "prefix AAA " + shared + " suffix one"
    b = "totally different " + shared + " other tail"
    got = _run(spark, [a, b], k=k, w=w)
    fps_a = {fp for _, fp in got[0]}
    fps_b = {fp for _, fp in got[1]}
    assert fps_a & fps_b, "guaranteed shared fingerprint missing"


def test_winnow_density(spark):
    # expected density 2/(w+1); allow generous slack on random-ish text
    k, w = 8, 4
    text = " ".join(f"tok{i * 37 % 101}" for i in range(400))
    got = _run(spark, [text], k=k, w=w)
    n_hashes = len(text) - k + 1
    density = len(got[0]) / n_hashes
    assert 0.05 < density < 0.8


def test_winnow_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textops.winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        textops.winnow_fingerprints(df, w=0)
