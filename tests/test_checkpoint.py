from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pbf2json_spark.checkpoint import CheckpointManager, run_stages


@pytest.fixture()
def mgr(spark, tmp_path):
    return CheckpointManager(spark, str(tmp_path), "pipe")


def test_write_read_roundtrip_and_metrics(spark, mgr):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = mgr.write_stage("s1", df, key_col="id")
    assert sorted(r["v"] for r in out.collect()) == [2 * i for i in range(100)]

    m = mgr.read_metrics("s1").collect()
    assert sum(r["rows"] for r in m) == 100
    assert all(r["stage"] == "s1" for r in m)
    assert all(r["bytes_est"] > 0 for r in m)
    # per-partition lineage: every partition id is distinct and key ranges exist
    pids = [r["partition_id"] for r in m]
    assert len(pids) == len(set(pids))
    assert all(r["key_min"] is not None and r["key_max"] is not None for r in m)


def test_resume_skips_recompute(spark, mgr):
    calls = []

    def stage1(_):
        calls.append("s1")
        return spark.range(10)

    def stage2(prev):
        calls.append("s2")
        return prev.withColumn("v", F.col("id") + 1)

    out1 = run_stages(mgr, [("s1", stage1), ("s2", stage2)])
    assert out1.count() == 10
    assert calls == ["s1", "s2"]

    # resumed run recomputes nothing
    out2 = run_stages(mgr, [("s1", stage1), ("s2", stage2)])
    assert out2.count() == 10
    assert calls == ["s1", "s2"]

    # overwrite mode recomputes everything and commits a new snapshot
    first = mgr.committed("s2")["run_id"]
    out3 = run_stages(mgr, [("s1", stage1), ("s2", stage2)], mode="overwrite")
    assert out3.count() == 10
    assert calls == ["s1", "s2", "s1", "s2"]
    assert mgr.committed("s2")["run_id"] != first


def test_commit_log_atomic_and_orphan_gc(spark, mgr, tmp_path):
    mgr.write_stage("s1", spark.range(5), mode="overwrite")
    committed = mgr.committed("s1")["run_id"]

    # simulate a crashed attempt: data written, never committed
    orphan_dir = tmp_path / "pipe" / "s1" / "data" / "deadbeef0000"
    os.makedirs(orphan_dir)
    (orphan_dir / "junk").write_text("x")

    removed = mgr.gc_orphans("s1")
    assert removed == ["data/deadbeef0000"]
    # committed snapshot untouched and still readable
    assert mgr.committed("s1")["run_id"] == committed
    assert mgr.read_stage("s1").count() == 5

    log = json.loads((tmp_path / "pipe" / "s1" / "_snapshots.json").read_text())
    assert [e["run_id"] for e in log] == [committed]


def test_input_stage_lineage(spark, mgr):
    run_stages(
        mgr,
        [("a", lambda _: spark.range(3)), ("b", lambda p: p.withColumn("v", F.lit(1)))],
        mode="overwrite",
    )
    assert mgr.committed("b")["input_stages"] == ["a"]
    m = mgr.read_metrics("b").collect()
    assert all(json.loads(r["input_stages"]) == ["a"] for r in m)
