"""Count-min sketch: a fixed-size, mergeable frequency summary for
streaming/batch heavy-hitter estimation at corpus scale.

Why a sketch when `groupBy(key).count()` is exact: at 10^12 rows the exact
count table is itself data-sized (one row per distinct key — for tokens,
billions), while a CMS is O(depth x width) REGARDLESS of cardinality, can
be unioned across dumps/partitions by plain cell-wise addition, and
answers point queries with a one-sided error bound (estimate >= truth;
overcount <= 2N/width with probability 1 - 2^-depth). It is the standard
building block for "is this n-gram frequent enough to matter" pre-filters
in dedup/quality pipelines where the exact vocabulary table would dwarf
the data.

Portability: the row hashes are md5-derived (first 8 hex digits ->
32-bit int, seeded by the row index), so any engine reproduces the SAME
sketch cell-for-cell — Spark builds it, DuckDB verifies it bit-exactly
(same idiom as dedup.minhash_signature_portable). All arithmetic is
integer: the oracle comparison is exact, never float-lucky.

Shapes at 10^12 rows:
  * cms_build — one explode by depth (a small constant, default 4) then
    ONE map-side-combinable groupBy on (row, bucket): the exchange carries
    at most depth x width partial cells PER MAP TASK, not the token
    volume. Output <= depth x width rows — metadata-scale.
  * cms_merge — union + the same groupBy: sketches from independent dumps
    combine without touching either dump again.
  * cms_estimate — the queried keys join the sketch on (row, bucket)
    (broadcast: the sketch is tiny by construction) and take min over the
    depth rows. Keys the sketch never saw estimate 0 via the left join's
    coalesce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(key: Column, row: int, width: int) -> Column:
    """Row-seeded portable bucket: first 32 bits of md5("<row>:" + key)
    mod width. DuckDB mirror: ('0x' || substr(md5(row || ':' || key),
    1, 8))::BIGINT % width."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{row}:"), key).cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return h % width


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch table (row, bucket, cnt) from a key column
    (optionally weighted). Cells that no key hashes into are absent
    (implicitly 0) — estimates coalesce them."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    k = F.col(key_col)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"), cms_bucket(k, i, width).alias("bucket")
                )
                for i in range(depth)
            ]
        )
    ).alias("rb")
    return (
        df.select(rb, w.alias("_w"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with the SAME (depth, width)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for every row of `keys`: min over the
    depth counters each key hashes to (the CMS upper bound). Output:
    (key_col, est)."""
    k = F.col(key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_bucket(k, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left").withColumn(
        "_c", F.coalesce(F.col("cnt"), F.lit(0).cast("long"))
    )
    return joined.groupBy(key_col).agg(F.min("_c").alias("est"))
