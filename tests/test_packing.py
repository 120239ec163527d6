"""Sequence packing: two-phase distributed cumsum vs a single-partition
window oracle, partition-count independence, boundary semantics."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pbf2json_spark import packing


def _docs(spark, n=500, seed=3):
    rng = random.Random(seed)
    rows = [(i, rng.randrange(0, 900)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long"), rows


def _brute(rows, budget):
    out = {}
    off = 0
    for i, t in sorted(rows):
        first = off // budget
        last = (off + max(t, 1) - 1) // budget
        out[i] = (off, first, last, last - first + 1)
        off += t
    return out


def test_pack_matches_bruteforce_and_partitioning(spark):
    df, rows = _docs(spark)
    want = _brute(rows, 2048)
    for parts in (1, 3, 17):
        got = {
            r["doc_id"]: (r["offset"], r["pack_first"], r["pack_last"], r["n_packs"])
            for r in packing.pack_sequences(df, 2048, n_parts=parts).collect()
        }
        assert got == want, parts


def test_pack_boundaries(spark):
    # budget 10: doc spans exactly [0,10) → one pack; next starts pack 1;
    # a 25-token doc spans 3 packs; a 0-token doc sits in its offset's pack
    df = spark.createDataFrame(
        [(1, 10), (2, 5), (3, 25), (4, 0), (5, 1)], "doc_id long, n_tokens long"
    )
    got = {r["doc_id"]: r for r in packing.pack_sequences(df, 10).collect()}
    assert (got[1]["pack_first"], got[1]["pack_last"]) == (0, 0)
    assert (got[2]["offset"], got[2]["pack_first"], got[2]["pack_last"]) == (10, 1, 1)
    assert (got[3]["offset"], got[3]["pack_first"], got[3]["pack_last"]) == (15, 1, 3)
    assert got[3]["n_packs"] == 3
    assert (got[4]["offset"], got[4]["pack_first"], got[4]["pack_last"]) == (40, 4, 4)
    assert (got[5]["offset"], got[5]["pack_first"]) == (40, 4)
    # conservation: every doc's offset equals the sum of the tokens of all
    # docs before it — derived from the RESULT, not restated literals
    toks = {1: 10, 2: 5, 3: 25, 4: 0, 5: 1}
    for i in toks:
        assert got[i]["offset"] == sum(toks[j] for j in toks if j < i), i


def test_pack_rejects_bad_budget(spark):
    df, _ = _docs(spark, n=5)
    with pytest.raises(ValueError):
        packing.pack_sequences(df, 0)


def test_pack_plan_has_no_global_window(spark):
    """The scale property: no single-partition window. The physical plan's
    Window nodes must all be partitioned (by the _b bucket), never a
    global Window over an Exchange SinglePartition."""
    df, _ = _docs(spark, n=100)
    plan = packing.pack_sequences(df, 128)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pack_sparse_id_space_beyond_2_53(spark):
    # snowflake-style ids spanning > 2^53: bucket selection may round in
    # doubles (monotone is enough) but offsets/packs must stay exact
    rows = [(i * (10**15) + 7, (i * 13) % 300) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    want = _brute(rows, 100)
    got = {
        r["doc_id"]: (r["offset"], r["pack_first"], r["pack_last"], r["n_packs"])
        for r in packing.pack_sequences(df, 100, n_parts=7).collect()
    }
    assert got == want


def test_pack_after_upstream_shuffle_and_type_guard(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    # docs arriving from a shuffle (groupBy) — bucket ids are a pure
    # function of the key, so offsets stay correct regardless of how the
    # upstream exchange ordered its output
    raw = spark.createDataFrame(
        [(i % 50, 1) for i in range(600)], "doc_id long, one long"
    )
    shuffled = raw.groupBy("doc_id").agg(F.sum("one").alias("n_tokens"))
    rows = [(r["doc_id"], r["n_tokens"]) for r in shuffled.collect()]
    want = _brute(rows, 64)
    got = {
        r["doc_id"]: (r["offset"], r["pack_first"], r["pack_last"], r["n_packs"])
        for r in packing.pack_sequences(shuffled, 64, n_parts=5).collect()
    }
    assert got == want
    with _pytest.raises(ValueError):
        packing.pack_sequences(
            spark.createDataFrame([("a", 1)], "doc_id string, n_tokens long"), 10
        )


def test_pack_full_range_keys(spark):
    # xxhash64-style order keys near +/- 2^63: (x - lo) overflows bigint,
    # so bucket selection must not do raw integer subtraction
    rows = [
        (-(2**63) + 3, 10), (-(2**62), 7), (-5, 1), (0, 4), (17, 0),
        (2**61, 9), (2**63 - 11, 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    want = _brute(rows, 8)
    got = {
        r["doc_id"]: (r["offset"], r["pack_first"], r["pack_last"], r["n_packs"])
        for r in packing.pack_sequences(df, 8, n_parts=4).collect()
    }
    assert got == want
