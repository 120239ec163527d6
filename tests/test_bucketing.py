"""Bucketed co-located join: the physical plan must contain NO Exchange on
either join side (the shuffle was paid once at write time), and results
must equal the plain-join baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pbf2json_spark import bucketing


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path}/wh'")
    yield "bktest"
    spark.sql("DROP DATABASE bktest CASCADE")


def test_colocated_join_has_no_exchange_and_matches(spark, bucket_db):
    a = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 3).alias("va")
    )
    b = spark.range(2_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 7).alias("vb")
    )
    bucketing.write_bucketed(a, f"{bucket_db}.ta", "k", buckets=8)
    bucketing.write_bucketed(b, f"{bucket_db}.tb", "k", buckets=8)

    # the scenario bucketing exists for: BOTH sides too big to broadcast
    # (at test scale the planner would otherwise just broadcast the 2k-row
    # side and never consult the bucket spec)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketing.colocated_join(spark, f"{bucket_db}.ta", f"{bucket_db}.tb", "k")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan  # shuffle was paid at write time
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Bucketed: true" in plan

        expected = a.join(b, "k")
        assert j.count() == expected.count()
        got = j.agg(F.sum(F.col("va") * F.col("vb"))).collect()[0][0]
        want = expected.agg(F.sum(F.col("va") * F.col("vb"))).collect()[0][0]
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
