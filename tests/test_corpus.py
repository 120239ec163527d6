"""Heavy-hitter n-grams + inverted index vs brute-force oracles."""

from __future__ import annotations

from collections import Counter

from pbf2json_spark import corpus


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "a dog sat on the mat"),
    (4, ""),
    (5, "cat"),
]


def test_top_ngrams_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for n in (1, 2, 3):
        cnt = Counter()
        for _, t in DOCS:
            ws = t.split()
            for i in range(len(ws) - n + 1):
                cnt[" ".join(ws[i : i + n])] += 1
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        got = [
            (r["gram"], r["occurrences"])
            for r in corpus.top_ngrams(df, n=n, k=4).collect()
        ]
        assert got == want, n


def test_inverted_index_postings_and_bounds(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["token"]: r for r in corpus.inverted_index(df).collect()}
    assert out["cat"]["postings"] == "1,2,5"
    assert out["cat"]["df_count"] == 3
    assert out["the"]["postings"] == "1,2,3"  # distinct docs, not occurrences
    bounded = {
        r["token"]
        for r in corpus.inverted_index(df, min_df=2, max_df=2).collect()
    }
    assert "cat" not in bounded and "the" not in bounded  # df 3 > max_df
    assert "sat" in bounded and "mat" in bounded          # df 2
    assert "ran" not in bounded                           # df 1 < min_df
    bi = {r["token"]: r["postings"] for r in corpus.inverted_index(df, n=2).collect()}
    assert bi["the cat"] == "1,2"
    assert bi["on the"] == "1,3"
