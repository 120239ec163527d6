"""Wave-42: spatial k-anonymity coarsening (vs brute census reference,
k-monotonicity, world-cell coverage) and SQ8 scalar quantization (codes vs
numpy reference, ADC recall vs exact dot, constant-dim guard)."""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F

from pbf2json_spark import ann, cells, spatial


# --- spatial k-anonymity ---------------------------------------------------------


def _mk_points(rnd: random.Random, n_dense: int = 60, n_sparse: int = 15):
    rows = []
    i = 0
    # a dense cluster (fine cells already hold >= k) ...
    for _ in range(n_dense):
        rows.append((i, 50.0 + rnd.uniform(0, 0.05), 10.0 + rnd.uniform(0, 0.05)))
        i += 1
    # ... and isolated points that must coarsen
    for _ in range(n_sparse):
        rows.append((i, rnd.uniform(-80, 80), rnd.uniform(-170, 170)))
        i += 1
    return rows


def _brute_anon(rows, k, levels):
    out = {}
    for r in sorted(levels, reverse=True):
        census: dict[int, int] = {}
        cid = {}
        for pid, la, lo in rows:
            c = int(cells.encode(np.array([la]), np.array([lo]), r)[0])
            cid[pid] = c
            census[c] = census.get(c, 0) + 1
        for pid, la, lo in rows:
            if pid not in out and census[cid[pid]] >= k:
                out[pid] = (r, cid[pid], census[cid[pid]])
    return out


def test_k_anonymity_vs_brute(spark):
    rnd = random.Random(42)
    rows = _mk_points(rnd)
    levels = [0, 3, 6, 9, 12]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = {
        r["id"]: (r["anon_res"], r["cell"], r["n"])
        for r in spatial.k_anonymity_cells(df, k=10, res_levels=levels).collect()
    }
    assert got == _brute_anon(rows, 10, levels)
    # world cell at res 0 guarantees coverage (75 points >= k)
    assert len(got) == len(rows)


def test_k_anonymity_monotone_in_k(spark):
    rnd = random.Random(7)
    rows = _mk_points(rnd)
    levels = [0, 4, 8, 12]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    r5 = {
        r["id"]: r["anon_res"]
        for r in spatial.k_anonymity_cells(df, k=5, res_levels=levels).collect()
    }
    r30 = {
        r["id"]: r["anon_res"]
        for r in spatial.k_anonymity_cells(df, k=30, res_levels=levels).collect()
    }
    # stricter k can only coarsen
    assert all(r30[i] <= r5[i] for i in r5)


def test_k_anonymity_suppression(spark):
    # no level satisfies k -> the point is absent (suppression signal)
    rows = [(1, 10.0, 10.0), (2, -40.0, 120.0)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = spatial.k_anonymity_cells(df, k=3, res_levels=[0, 5]).collect()
    assert got == []


# --- SQ8 -------------------------------------------------------------------------


def _ref_codes(vecs: np.ndarray, mins: np.ndarray, maxs: np.ndarray) -> np.ndarray:
    span = maxs - mins
    with np.errstate(invalid="ignore", divide="ignore"):
        c = np.floor((vecs - mins) / span * 255.0)
    c = np.where(span == 0, 0.0, c)
    return np.clip(c, 0, 255).astype(np.int64)


def test_sq_codes_vs_numpy(spark):
    rnd = np.random.default_rng(42)
    vecs = rnd.normal(size=(120, 8)).astype(np.float64)
    vecs[:, 3] = 1.25  # constant dim -> code 0, no NaN
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mins, maxs = ann.sq_train(df)
    assert mins[3] == maxs[3] == 1.25
    np.testing.assert_array_equal(np.asarray(mins), vecs.min(axis=0))
    got = {
        r["vec_id"]: r["codes"]
        for r in ann.sq_encode(df, mins, maxs).collect()
    }
    exp = _ref_codes(vecs, np.asarray(mins), np.asarray(maxs))
    for i in range(len(rows)):
        assert got[i] == exp[i].tolist(), i


def test_sq_topk_recall_vs_exact_dot(spark):
    rnd = np.random.default_rng(7)
    vecs = rnd.normal(size=(400, 16)).astype(np.float64)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mins, maxs = ann.sq_train(df)
    queries = df.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    got = ann.sq_topk(df, queries, k=10, mins=mins, maxs=maxs).collect()
    by_q: dict[int, list[int]] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    recalls = []
    for qi in range(5):
        exact = np.argsort(-(vecs @ vecs[qi]))[:10]
        recalls.append(len(set(by_q[qi]) & set(exact.tolist())) / 10.0)
    # 8-bit per-dim quantization is near-lossless for dot ranking
    assert sum(recalls) / len(recalls) >= 0.9, recalls
    # code_sum is the integer pin: recompute from the reference codes
    exp_codes = _ref_codes(vecs, np.asarray(mins), np.asarray(maxs))
    for r in got:
        assert r["code_sum"] == int(exp_codes[r["vec_id"]].sum())
