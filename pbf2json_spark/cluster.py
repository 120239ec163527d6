"""Embedding clustering — distributed k-means over an `array<float>`
column, the corpus-organization step of an LLM data pipeline (domain
mixing, dedup sharding, curriculum buckets) and the training half of the
IVF index in ann.py (whose train step is a bounded driver-side sample;
this module is the full-data path).

Distributed Lloyd's, shuffle-engine shape:
  * ASSIGN: centroids are a k×d driver matrix broadcast inside an
    Arrow-batched pandas UDF closure — one numpy matmul per batch, no
    join, no shuffle.
  * UPDATE: per-cluster mean via ONE map-side-combinable groupBy of
    (cluster, dim, sum, count) after a posexplode — k·d rows reach the
    driver (metadata-scale regardless of table size).

Determinism discipline: float sums across a shuffle are order-dependent,
so naive distributed k-means trains different centroids on different
partitionings. Here the UPDATE step sums int64 MICRO-UNITS
(round(x·1e6)): integer addition is order-independent, so training is
bit-reproducible across partition layouts and cluster sizes — the same
trick as graph.pagerank_int's nano-ranks. Quantization error is ≤5e-7
per coordinate per point, far below k-means' own convergence tolerance.
Overflow budget: int64 holds |Σ| up to 9.2e18 micro-units ≈ 9.2e12 of
coordinate mass per (cluster, dim) — unit-norm embeddings stay safe past
10^12 rows.

Assignment is by maximum cosine (matching ann.py's IVF convention and the
certified cosine_topk oracle pattern); ties break to the lowest cluster
id (numpy argmax picks the first maximum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _assign_udf(cents: np.ndarray):
    cents_t = _norm_rows(np.asarray(cents, dtype=np.float64)).T.copy()

    @F.pandas_udf("int")
    def assign(vec: pd.Series) -> pd.Series:
        mat = _norm_rows(np.asarray(vec.tolist(), dtype=np.float64))
        return pd.Series(np.argmax(mat @ cents_t, axis=1).astype(np.int32))

    return assign


def kmeans_fit(
    df: DataFrame,
    k: int,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Full-data distributed Lloyd's. Init = the k lowest-id vectors
    (TakeOrdered — deterministic across partitionings, unlike a bare
    limit). Returns the k×d float64 centroid matrix (unit-normalized).
    Empty clusters keep their previous centroid (no re-seeding
    randomness)."""
    p = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    seeds = p.orderBy("_id").limit(k).collect()
    if len(seeds) < k:
        raise ValueError(f"kmeans_fit: need >= {k} rows, got {len(seeds)}")
    cents = _norm_rows(np.asarray([r["_v"] for r in seeds], dtype=np.float64))
    for _ in range(n_iter):
        assigned = p.withColumn("_c", _assign_udf(cents)("_v"))
        stats = (
            assigned.select(
                "_c",
                F.posexplode(
                    F.transform(
                        "_v",
                        lambda x: F.round(x * MICRO).cast("long"),
                    )
                ).alias("_d", "_xq"),
            )
            .groupBy("_c", "_d")
            .agg(F.sum("_xq").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        new = cents.copy()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for r in stats:
            sums[r["_c"], r["_d"]] = r["_s"] / MICRO
            counts[r["_c"]] = r["_n"]
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cents = _norm_rows(new)
    return cents


def kmeans_assign(
    df: DataFrame,
    centroids: "np.ndarray | list",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid. Pure scan stage:
    broadcast matrix in the UDF closure, one matmul per Arrow batch.
    Output: input columns + cluster:int."""
    return df.withColumn(
        "cluster", _assign_udf(np.asarray(centroids))(
            F.col(vec_col).cast("array<double>")
        )
    )


def cluster_stats(
    assigned: DataFrame,
    centroids: "np.ndarray | list",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Per-cluster size and mean cosine to the centroid (cohesion — the
    cosine analogue of inertia). One map-side-combinable groupBy; the
    per-row cosine is computed in the same Arrow batch pass as assignment
    would be. Output: (cluster, n:long, mean_cos:double)."""
    cents_t = _norm_rows(np.asarray(centroids, dtype=np.float64)).T.copy()

    @F.pandas_udf("double")
    def cos_to(vec: pd.Series, cl: pd.Series) -> pd.Series:
        mat = _norm_rows(np.asarray(vec.tolist(), dtype=np.float64))
        sims = mat @ cents_t
        return pd.Series(sims[np.arange(len(sims)), cl.to_numpy()])

    return (
        assigned.withColumn(
            "_cos",
            cos_to(F.col(vec_col).cast("array<double>"), F.col(cluster_col)),
        )
        .groupBy(cluster_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("_cos").alias("mean_cos"),
        )
    )
