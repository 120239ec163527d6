"""top_k_per_group vs brute force, salted pre-thin exactness, validation."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pbf2json_spark import ranking


def _rows(n=400, seed=11):
    rng = random.Random(seed)
    return [(i, f"g{rng.randrange(7)}", rng.randrange(100)) for i in range(n)]


def _brute(rows, k):
    by_g: dict = {}
    for i, g, s in rows:
        by_g.setdefault(g, []).append((-s, i))
    want = {}
    for g, items in by_g.items():
        for rk, (negs, i) in enumerate(sorted(items)[:k], start=1):
            want[i] = (g, -negs, rk)
    return want


@pytest.mark.parametrize("salt", [0, 4])
def test_topk_per_group_matches_bruteforce(spark, salt):
    rows = _rows()
    df = spark.createDataFrame(rows, "id long, g string, score long").repartition(8)
    got = {
        r["id"]: (r["g"], r["score"], r["rank_in_group"])
        for r in ranking.top_k_per_group(
            df, ["g"], [F.col("score").desc(), F.col("id").asc()], 5,
            pre_thin_salt=salt,
        ).collect()
    }
    assert got == _brute(rows, 5), salt


def test_topk_validation(spark):
    df = spark.createDataFrame([(1, "a", 1)], "id long, g string, score long")
    with pytest.raises(ValueError):
        ranking.top_k_per_group(df, ["g"], [F.col("score")], 0)


def test_topk_salted_single_partition_input(spark):
    # the salt must spread rows even when the input arrives in ONE
    # partition (sequence-number salt, not spark_partition_id)
    rows = _rows(n=300, seed=5)
    df = spark.createDataFrame(rows, "id long, g string, score long").coalesce(1)
    got = {
        r["id"]: (r["g"], r["score"], r["rank_in_group"])
        for r in ranking.top_k_per_group(
            df, ["g"], [F.col("score").desc(), F.col("id").asc()], 4,
            pre_thin_salt=3,
        ).collect()
    }
    assert got == _brute(rows, 4)


def test_topk_rejects_clashing_columns(spark):
    df = spark.createDataFrame(
        [(1, "a", 1, 9)], "id long, g string, score long, rank_in_group long"
    )
    with pytest.raises(ValueError):
        ranking.top_k_per_group(df, ["g"], [F.col("score")], 1)
