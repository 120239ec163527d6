"""Sequence packing for LLM pretraining: concatenate documents in a
deterministic order and cut the stream into fixed-token-budget packs
(documents may straddle pack boundaries — the standard GPT-style
concat-and-cut; every token lands in exactly one pack, zero padding
between documents).

The only primitive this needs is a GLOBAL exclusive running sum of token
counts in document order — and a single `Window.orderBy(...)` computes
that on ONE partition, which is the classic driver-shaped trap at 10^12
documents. The scalable plan is the textbook two-phase scan:

  1. split the order-key domain into `parts` contiguous integer ranges
     derived from min/max — a PURE FUNCTION of the row, so every job
     that evaluates it sees identical bucket ids (a sampled
     repartitionByRange partitioner is NOT: its boundaries can differ
     between the two jobs below when upstream shuffle order varies,
     silently mis-basing offsets);
  2. per-bucket exclusive cumsum (window partitioned by bucket —
     parallel, one hash exchange);
  3. per-bucket TOTALS (≤ `parts` rows, metadata-scale by construction)
     from a second column-pruned pass over (order, tokens) only, prefix-
     summed on the driver and broadcast-joined back as each bucket's
     base offset.

Total cost: one slim stats pass + one hash exchange + one narrow window
+ one broadcast join. All pack arithmetic is 64-bit INTEGER — a double
`floor(off / budget)` goes wrong past 2^53 total tokens, which a
10^12-document corpus exceeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegralType
from pyspark.sql.window import Window


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    n_parts: int | None = None,
) -> DataFrame:
    """Assign every document its token span in the packed stream.

    Returns the input columns plus:
      offset      exclusive running sum of `token_col` in `order_col` order
                  (the document's first token's position in the stream)
      pack_first  offset div budget — pack holding the first token
      pack_last   pack holding the last token (== pack_first when the doc
                  fits inside one pack; empty docs take pack_first)
      n_packs     pack_last - pack_first + 1

    `order_col` must be a unique integral key (the deterministic global
    order). Deterministic for any input partitioning: buckets are a pure
    function of the key, the cumsum is exact integer arithmetic.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if not isinstance(docs.schema[order_col].dataType, IntegralType):
        raise ValueError(f"{order_col} must be an integral column")
    parts = n_parts or docs.sparkSession.sparkContext.defaultParallelism

    # one column-pruned stats pass: min/max give deterministic bucket
    # boundaries; per-bucket totals (≤ parts rows) give the base offsets
    lo_hi = docs.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).collect()[0]
    if lo_hi["lo"] is None:  # empty input
        lo, step = 0, 1
    else:
        lo = int(lo_hi["lo"])
        span = int(lo_hi["hi"]) - lo + 1
        step = max(1, -(-span // parts))  # ceil — buckets stay contiguous
    # Bucket selection needs only (a) determinism — same key, same bucket
    # in every job — and (b) monotonicity in the order key (buckets are
    # contiguous key ranges); balance is best-effort. Double arithmetic
    # gives both WITHOUT int64 overflow (a full-range key space like
    # xxhash64 makes `x - lo` overflow in bigint): int64→double is
    # monotone, subtraction/division by a positive constant are monotone,
    # floor is monotone. The OFFSETS below are what must never touch a
    # double (they exceed 2^53 at 10^12 docs) — and they stay integer.
    bucket = F.floor(
        (F.col(order_col).cast("double") - F.lit(float(lo)))
        / F.lit(float(step))
    ).cast("long")
    b = docs.withColumn("_b", bucket)

    totals = (
        b.groupBy("_b").agg(F.sum(token_col).alias("_tot")).collect()
    )  # ≤ parts rows — metadata-scale driver hop, deterministic keys
    base, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["_b"]):
        base[r["_b"]] = acc
        acc += r["_tot"] or 0
    base_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            list(base.items()) or [(0, 0)], "_b long, _base long"
        )
    )

    w = (
        Window.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn(
        "_local_off", F.coalesce(F.sum(token_col).over(w), F.lit(0))
    )
    t = F.col(token_col)
    out = (
        local.join(base_df, "_b")
        .withColumn("offset", (F.col("_base") + F.col("_local_off")).cast("long"))
        .withColumn("_last_tok", F.col("offset") + F.greatest(t, F.lit(1)) - 1)
    )
    return (
        out.withColumn("pack_first", F.expr(f"offset div {budget}"))
        .withColumn("pack_last", F.expr(f"_last_tok div {budget}"))
        .withColumn("n_packs", F.col("pack_last") - F.col("pack_first") + 1)
        .drop("_b", "_local_off", "_base", "_last_tok")
    )
