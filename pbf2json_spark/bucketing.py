"""Bucketed tables for exchange-free (co-located) joins.

north_rule: "partitioning / shuffle / skew handled explicitly". For a join
both of whose sides are too big to broadcast and which recurs across jobs
(pages ⋈ per-host metadata, ways ⋈ nodes at planet scale), the shuffle can
be paid ONCE at write time: both tables bucketed by the join key into the
same bucket count hash-place matching keys into matching files, and Spark
plans the join with NO Exchange on either side (verified by
tests/test_bucketing.py against the physical plan).

This is the classic warehouse answer to the re-shuffle tax; on Iceberg the
equivalent is a `bucket(N, key)` partition transform (iceberg.py's
capability-gated writer accepts the same layout)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int, sort: bool = True
) -> None:
    """Persist `df` as a bucketed (and optionally sort-within-bucket) table.

    Sorting within buckets additionally lets Spark pick a merge join with
    no Sort node — the files are already in key order."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Spark elides BOTH exchanges (and both sorts when the
    tables are sortBy'd) — the join runs file-against-file."""
    return spark.table(left_table).join(spark.table(right_table), key)
