"""Exact top-k selection per group — "the 3 best documents per host /
language / domain", the selection primitive curation pipelines run after
scoring (quality filtering keeps the best k per site to bound any one
site's contribution to the training mix).

Shape at 10^12 rows: ONE hash exchange on the group key, then a
per-partition sort + running rank with early discard — Spark's Window
rank over partitionBy(group) never materializes a global sort, and the
filter `rank <= k` drops losers before anything downstream. Partition
cost is bounded by the largest GROUP (a site's page count), not the
corpus. The groupBy(collect_list + slice) alternative is strictly worse:
it buffers every group's full row set inside one aggregation buffer
before truncating — the same OOM shape inverted_index's max_df exists to
avoid. For degenerate hot groups (one host = 10^9 pages), pre-thin with a
salted first pass: rank within (group, salt) and keep k per split, so no
single reducer ever holds a whole hot group and the final exchange
carries at most k * salt rows per group — still exact after the final
rank, since the true top-k of a group is contained in the union of its
salted top-k sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    pre_thin_salt: int = 0,
) -> DataFrame:
    """Keep the k first rows of each group under `order_by` (pass
    deterministic tie-breakers — e.g. the row id — or ranks are
    partition-order dependent).

    pre_thin_salt > 0 enables the hot-group guard: a first ranking pass
    over (group, salt) splits every group across `salt` reducers — the
    full input still shuffles once, but no single reducer ever holds a
    whole hot group — and keeps k rows per (group, salt), so the FINAL
    exchange carries at most k * salt rows per group. Exactness is
    preserved (superset property: a group's true top-k rows are each
    top-k within their salt split). The salt is the row sequence number
    (monotonically_increasing_id % salt), which spreads rows even when
    the input arrives in a single partition; the salt values themselves
    are partitioning-dependent, but ANY assignment is correct — the
    final exact rank is what callers observe.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    reserved = {"rank_in_group", "_rk", "_r0", "_salt"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns clash with outputs: {sorted(clash)}")
    src = df
    if pre_thin_salt > 0:
        salted = Window.partitionBy(*group_cols, "_salt").orderBy(*order_by)
        src = (
            df.withColumn(
                "_salt", F.monotonically_increasing_id() % pre_thin_salt
            )
            .withColumn("_r0", F.row_number().over(salted))
            .filter(F.col("_r0") <= k)
            .drop("_r0", "_salt")
        )
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        src.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .withColumnRenamed("_rk", "rank_in_group")
    )


def rank_biased_overlap(
    a: DataFrame,
    b: DataFrame,
    depth: int = 20,
    p_e3: int = 900,
    key_col: str = "qid",
    item_col: str = "item",
    rank_col: str = "rank",
) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between two rankings per
    key, truncated at ``depth``: RBO@d = (1−p)·Σ_{k=1..d} p^{k−1}·|A_k ∩
    B_k|/k — the top-weighted "did the ranking change" metric (two crawl
    rounds' top hosts, yesterday's vs today's top queries) where
    Kendall/Spearman treat depth 1 and depth 1000 swaps alike.

    Exact surface: the per-depth overlap counts |A_k ∩ B_k| are BIGINTs
    (matched items joined on (key, item), counted once per depth via a
    ≥-max(rank) comparison — an in-row `sequence` explode over depths,
    never a theta join); the weighted sum is a FIXED float tree over
    literal p^k/(k) coefficients in ascending-k order — engine-exact
    (the est_raw discipline). Keys missing from either side score
    overlap 0 at every depth (full outer on the key).

    Output: (key, n_depths, overlap_sum, rbo) — overlap_sum = Σ|A_k∩B_k|
    (the integer certificate), rbo the fixed-tree double in [0, 1].
    """
    pa = a.select(F.col(key_col).alias("k"), F.col(item_col).alias("it"),
                  F.col(rank_col).cast("long").alias("ra"))
    pb = b.select(F.col(key_col).alias("k"), F.col(item_col).alias("it"),
                  F.col(rank_col).cast("long").alias("rb"))
    m = pa.join(pb, ["k", "it"]).filter(
        (F.col("ra") <= depth) & (F.col("rb") <= depth)
    )
    # item counts toward depth d when max(ra, rb) <= d
    d_explode = m.select(
        "k", F.greatest("ra", "rb").alias("_m")
    ).select("k", F.explode(F.sequence(F.col("_m"), F.lit(depth))).alias("d"))
    ov = d_explode.groupBy("k", "d").agg(F.count(F.lit(1)).alias("_ov"))
    keys = pa.select("k").unionByName(pb.select("k")).distinct()
    # per-depth overlaps pivot into ONE row per key (conditional integer
    # sums), and the weighted total is a LITERAL fold in ascending-d
    # order — a float SUM over depth rows would accumulate in partition
    # order and break bit-exactness; the explicit fixed-order expression
    # is engine-identical (the est_raw discipline)
    pf = p_e3 / 1000.0
    # weights quantized to integer PICOUNITS: rbo_e12 = Σ w_d · ov_d is a
    # pure BIGINT (a 20-term float chain differed across engines in the
    # last ulp — measured; integer weights remove the question entirely,
    # at 1e-12 quantization ≪ any ranking-comparison tolerance)
    coef = {
        d: round((1.0 - pf) * (pf ** (d - 1)) / d * 1_000_000_000_000)
        for d in range(1, depth + 1)
    }
    aggs = [
        F.count(F.lit(1)).alias("n_depths"),
        F.sum("_ov").alias("overlap_sum"),
    ] + [
        F.coalesce(
            F.sum(F.when(F.col("d") == d, F.col("_ov"))), F.lit(0)
        ).alias(f"_ov{d}")
        for d in range(1, depth + 1)
    ]
    per_key = ov.groupBy("k").agg(*aggs)
    rbo_expr = None
    for d in range(1, depth + 1):
        term = F.lit(coef[d]) * F.col(f"_ov{d}")
        rbo_expr = term if rbo_expr is None else rbo_expr + term
    per_key = per_key.withColumn("_rbo", rbo_expr.cast("long"))
    out = keys.join(per_key, "k", "left").select(
        F.col(key_col) if key_col == "k" else F.col("k").alias(key_col),
        F.coalesce("n_depths", F.lit(0)).cast("long").alias("n_depths"),
        F.coalesce("overlap_sum", F.lit(0)).cast("long").alias("overlap_sum"),
        F.coalesce("_rbo", F.lit(0).cast("long")).alias("rbo_e12"),
    )
    return out.withColumn("rbo", F.col("rbo_e12").cast("double") / 1e12)
