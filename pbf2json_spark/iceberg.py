"""Iceberg table source/sink for the pages pipeline (north-star input shape:
an Iceberg table of Common-Crawl-style web pages).

The engine's operators are all DataFrame→DataFrame, so the table format is
purely an I/O concern: this module is the single place that knows whether
the session can speak Iceberg, and every reader/writer in the repo can go
through it unchanged.

Capability-gated, not stubbed: when the Iceberg Spark runtime JAR is on the
classpath (`spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-…`
on a real cluster), reads/writes go through the `iceberg` format and a
catalog — snapshot isolation, hidden partitioning, time travel. In this
sandbox the JAR is absent, so the same calls fall back to plain parquet
directories with identical DataFrame semantics (no snapshot metadata); the
checkpoint module (checkpoint.py) supplies the resumable-snapshot semantics
the north rule needs in that case.

Scale notes (what Iceberg buys at 10^12 rows, and what the fallback keeps):
  * partition pruning: Iceberg hides the partition transform (days(warc_ts),
    bucket(N, url)) in table metadata; the parquet fallback gets the same
    pruning from explicit directory partitioning (partitionBy on write).
  * snapshot reads: Iceberg pins a snapshot id per query — consistent
    multi-pass reads (SURVEY §2 S2) without re-listing; the fallback relies
    on immutable run directories (checkpoint.py's data/<run_id> layout).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def classpath_has_iceberg_jar() -> bool:
    """Cheap pre-session probe: look for the runtime JAR under pyspark/jars."""
    import pyspark

    return bool(
        glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg*"))
    )


def catalog_conf(warehouse: str, catalog: str = "local") -> dict[str, str]:
    """SparkSession config for a Hadoop-warehouse Iceberg catalog. Pass to
    session.get_spark(extra_conf=...) (or spark-submit --conf) on a cluster
    where the runtime JAR is present."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


def read_pages(spark: SparkSession, location: str) -> DataFrame:
    """Read the pages table: Iceberg table identifier (catalog.db.table)
    when the runtime is present, else a parquet directory path."""
    if iceberg_available(spark) and not os.path.isdir(location):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_pages(
    df: DataFrame,
    location: str,
    mode: str = "append",
    partition_cols: tuple[str, ...] = (),
) -> None:
    """Write through Iceberg when available (table identifier), else
    directory-partitioned parquet with the same partition columns — the
    explicit version of what Iceberg's hidden partitioning does."""
    if iceberg_available(df.sparkSession) and not os.path.isdir(location):
        w = df.writeTo(location)
        (w.append() if mode == "append" else w.createOrReplace())
        return
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(location)
