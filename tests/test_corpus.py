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


def test_search_all_terms(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"] for r in corpus.search_all_terms(df, ["cat", "the"]).collect()}
    assert got == {1, 2}  # docs containing BOTH terms
    got1 = {r["doc_id"] for r in corpus.search_all_terms(df, ["mat"]).collect()}
    assert got1 == {1, 3}
    # repeated terms in the query collapse; a term occurring twice in one
    # doc still counts once
    got2 = {r["doc_id"] for r in corpus.search_all_terms(df, ["the", "the", "on"]).collect()}
    assert got2 == {1, 3}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.search_all_terms(df, [])


def test_incremental_new_docs(spark):
    from pbf2json_spark import dedup

    corpus_fps = spark.createDataFrame([("a",), ("b",)], "fp string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "c"), (3, "b"), (4, "c")], "doc_id long, fp string"
    )
    got = sorted(r["doc_id"] for r in dedup.incremental_new_docs(corpus_fps, new).collect())
    assert got == [2, 4]  # only fingerprints absent from the corpus survive


def test_bm25_rank_matches_bruteforce(spark):
    import pytest as _pytest

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    terms, k1, b = ["cat", "mat"], 1.2, 0.75
    docs = {i: t.split() for i, t in DOCS}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    want = []
    for i, ws in docs.items():
        score = 0.0
        hit = False
        for t in sorted(set(terms)):
            tf = float(ws.count(t))
            dfreq = float(sum(1 for w in docs.values() if t in w))
            idf = (n - dfreq + 0.5) / (dfreq + 0.5)
            denom = tf + k1 * (1.0 - b + b * (len(ws) / avgdl))
            score = score + idf * (tf * (k1 + 1.0) / denom)
            hit = hit or tf > 0
        if hit:
            want.append((i, score))
    want.sort(key=lambda kv: (-kv[1], kv[0]))
    got = [(r["doc_id"], r["score"]) for r in corpus.bm25_rank(df, terms).collect()]
    # exact float equality: the engine builds the identical fixed
    # expression tree the brute force evaluates (no float aggregation)
    assert got == want
    # top-k truncation keeps the best-scoring prefix
    got2 = [(r["doc_id"], r["score"]) for r in corpus.bm25_rank(df, terms, k=2).collect()]
    assert got2 == want[:2]
    with _pytest.raises(ValueError):
        corpus.bm25_rank(df, [])
    with _pytest.raises(ValueError):
        corpus.bm25_rank(df, ["two words"])


def test_tfidf_keywords_matches_bruteforce(spark):
    texts = {
        0: "apple banana apple cherry stop stop",
        1: "banana cherry date stop stop stop",
        2: "apple date elderberry stop",
        3: "fig fig fig stop unique",
        4: "stop stop stop stop",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    k, min_df, max_frac = 2, 2, 0.7
    got = {
        (r["doc_id"], r["rnk"]): (r["term"], r["tf"], r["score"])
        for r in corpus.tfidf_keywords(
            df, k=k, min_df=min_df, max_df_frac=max_frac
        ).collect()
    }
    # brute force with the identical rational idf
    toks = {i: t.split() for i, t in texts.items()}
    n = len(texts)
    dfreq = Counter()
    for ts in toks.values():
        for w in set(ts):
            dfreq[w] += 1
    want = {}
    for i, ts in toks.items():
        cand = []
        for w in set(ts):
            d = dfreq[w]
            if d < min_df or d > max_frac * n:
                continue
            tf = ts.count(w)
            cand.append((tf * ((n - d + 0.5) / (d + 0.5)), w, tf))
        cand.sort(key=lambda c: (-c[0], c[1]))
        for rnk, (s, w, tf) in enumerate(cand[:k], 1):
            want[(i, rnk)] = (w, tf, s)
    assert got == want
    # 'stop' (df=5 > 0.7*5) and 'unique'/'elderberry' (df=1 < 2) never appear
    terms = {v[0] for v in got.values()}
    assert "stop" not in terms and "unique" not in terms


def test_tfidf_keywords_validation_and_empty(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(0, "a b"), (1, "   ")],
                               "doc_id long, text string")
    with _pytest.raises(ValueError):
        corpus.tfidf_keywords(df, k=0)
    out = corpus.tfidf_keywords(df, k=3, min_df=1, max_df_frac=1.0).collect()
    # empty doc contributes no rows; doc 0's two singleton terms rank by term
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["term"])
    assert 1 not in by_doc and by_doc[0] == ["a", "b"]
