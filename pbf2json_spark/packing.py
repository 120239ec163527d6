"""Sequence packing for LLM pretraining: concatenate documents in a
deterministic order and cut the stream into fixed-token-budget packs
(documents may straddle pack boundaries — the standard GPT-style
concat-and-cut; every token lands in exactly one pack, zero padding
between documents).

The only primitive this needs is a GLOBAL exclusive running sum of token
counts in document order — and a single `Window.orderBy(...)` computes
that on ONE partition, which is the classic driver-shaped trap at 10^12
documents. The scalable plan is the textbook two-phase scan:

  1. range-partition by the order key (so partition i holds a contiguous
     id range and partitions are in order);
  2. per-partition exclusive cumsum (window partitioned by the physical
     partition id — parallel, no cross-partition data movement);
  3. per-partition TOTALS (one row per partition, metadata-scale) are
     prefix-summed and broadcast-joined back as each partition's base
     offset.

Total cost: one range exchange + one narrow window + one broadcast join —
no stage touches more than its own partition's rows twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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
      pack_first  floor(offset / budget) — pack holding the first token
      pack_last   pack holding the last token (== pack_first when the doc
                  fits inside one pack; empty docs take pack_first)
      n_packs     pack_last - pack_first + 1

    Deterministic for any partitioning: the order is total (`order_col`
    must be unique), the two-phase cumsum is exact integer arithmetic.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    parts = n_parts or docs.sparkSession.sparkContext.defaultParallelism
    ranged = docs.repartitionByRange(parts, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_local_off", F.coalesce(F.sum(token_col).over(w), F.lit(0))
    )
    # one row per partition: (pid, total) — metadata-scale by construction
    totals = (
        ranged.groupBy("_pid")
        .agg(F.sum(token_col).alias("_tot"))
        .collect()
    )
    base = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        base[r["_pid"]] = acc
        acc += r["_tot"] or 0
    base_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(pid, off) for pid, off in base.items()], "_pid int, _base long"
        )
    )
    t = F.col(token_col)
    off = F.col("_base") + F.col("_local_off")
    return (
        local.join(base_df, "_pid")
        .withColumn("offset", off.cast("long"))
        .withColumn("pack_first", F.floor(off / budget).cast("long"))
        .withColumn(
            "pack_last",
            F.floor((off + F.greatest(t, F.lit(1)) - 1) / budget).cast("long"),
        )
        .withColumn("n_packs", (F.col("pack_last") - F.col("pack_first") + 1))
        .drop("_pid", "_local_off", "_base")
    )
