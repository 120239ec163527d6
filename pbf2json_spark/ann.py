"""Similarity search over embedding columns (array<float>).

  * `cosine_topk` — exact baseline: broadcast the query set, JVM-side dot
    product via zip_with/aggregate (no Python), window top-k. The points
    side streams once; the only shuffle is the per-query top-k.
  * `lsh_cosine_topk` — the scale path: deterministic random-hyperplane
    signatures, multi-table bucket join, exact cosine re-rank of
    candidates. Sub-linear candidate sets at 10^12 rows; recall governed
    by (n_tables, bits) — verified in tests against the exact baseline.
  * `embedding_near_dup_pairs` — near-duplicate pairs (cosine ≥ threshold)
    via the same LSH bucketing, self-join flavor.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query. Queries are broadcast — correct
    shape when |queries| ≪ |points| (the usual ANN asymmetry)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        )
    )
    p = points.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_pv")
    )
    scored = p.crossJoin(q).withColumn("cos", cosine(F.col("_pv"), F.col("_qv")))
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(query_id).orderBy(F.desc("cos"), F.col(id_col))
        ),
    ).filter(F.col("rank") <= k)
    return ranked.select(query_id, id_col, "cos", "rank")


def _hyperplanes(dim: int, bits: int, table: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed + 1009 * table)
    return rng.standard_normal((bits, dim)).tolist()


def _signature(vec: Column, planes: list[list[float]]) -> Column:
    """bits-length sign pattern packed into a long — pure Column math."""
    sig = None
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in plane]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sig


def lsh_cosine_topk(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    bits: int = 10,
    n_tables: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Approximate top-k: union of n_tables bucket joins, exact cosine
    re-rank. Deterministic hyperplanes from `seed`."""
    p = points.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_pv")
    )
    q = queries.select(
        F.col(query_id), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    cands = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, bits, t, seed)
        pb = p.withColumn("_b", _signature(F.col("_pv"), planes))
        qb = F.broadcast(q.withColumn("_b", _signature(F.col("_qv"), planes)))
        c = pb.join(qb, "_b").select(query_id, id_col, "_pv", "_qv")
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates([query_id, id_col])
    ranked = cands.withColumn("cos", cosine(F.col("_pv"), F.col("_qv"))).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(query_id).orderBy(F.desc("cos"), F.col(id_col))
        ),
    ).filter(F.col("rank") <= k)
    return ranked.select(query_id, id_col, "cos", "rank")


def embedding_near_dup_pairs(
    points: DataFrame,
    threshold: float,
    dim: int,
    bits: int = 12,
    n_tables: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs (a<b) with cosine ≥ threshold, LSH-bucketed self-join + exact
    verify (no false positives)."""
    p = points.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    cands = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, bits, t, seed)
        pb = p.withColumn("_b", _signature(F.col("_v"), planes))
        left = pb.select(F.col("_id").alias("a"), F.col("_v").alias("_va"), "_b")
        right = pb.select(F.col("_id").alias("b"), F.col("_v").alias("_vb"), "_b")
        c = left.join(right, "_b").filter(F.col("a") < F.col("b")).select(
            "a", "b", "_va", "_vb"
        )
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates(["a", "b"])
    return (
        cands.withColumn("cos", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )
