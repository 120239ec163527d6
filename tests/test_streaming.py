from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pbf2json_spark import cells, pages, streaming


@pytest.fixture()
def pages_dir(spark, tmp_path):
    """A bounded parquet 'stream': the same deterministic pages the batch
    path uses, written as two micro-batch files."""
    p = str(tmp_path / "pages")
    pg = pages.generate_pages(spark, 2000)
    pg.filter(F.xxhash64("url") % 2 == 0).write.parquet(p)
    pg.filter(F.xxhash64("url") % 2 != 0).write.mode("append").parquet(p)
    return p


def _source(spark, pages_dir):
    schema = spark.read.parquet(pages_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(pages_dir)
    )


def test_streaming_tile_counts_match_batch(spark, pages_dir):
    tiles = streaming.streaming_tile_counts(
        _source(spark, pages_dir), res=6, window="1 day"
    )
    q = streaming.run_stream_to_memory(tiles, "tiles_test", output_mode="complete")
    assert q.lastProgress is not None
    got = {
        (r["win_start"], r["tile"]): r["n"]
        for r in spark.sql("select * from tiles_test").collect()
    }

    # batch mirror: same kernels, day windows align to epoch midnight UTC
    batch = spark.read.parquet(pages_dir)
    g = pages.geocode(batch).filter(F.col("lat").isNotNull())
    tiled = g.withColumn(
        "tile", cells.cell_col(F.col("lat"), F.col("lon"), 6)
    ).withColumn("win_start", F.date_trunc("day", F.col("warc_ts")))
    exp = {
        (r["win_start"], r["tile"]): r["n"]
        for r in tiled.groupBy("win_start", "tile")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp
    assert sum(got.values()) == g.count()


def test_streaming_is_incremental(spark, pages_dir):
    tiles = streaming.streaming_tile_counts(
        _source(spark, pages_dir), res=4, window="1 day"
    )
    q = streaming.run_stream_to_memory(tiles, "tiles_inc")
    # availableNow + maxFilesPerTrigger=1 ⇒ >1 micro-batch processed
    assert q.recentProgress and len(q.recentProgress) > 1


def test_streaming_dedup_first_seen_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps cross-batch state: a text repeated in a
    LATER micro-batch is dropped, each distinct text emits exactly once."""
    import datetime as dt

    p = str(tmp_path / "dd")
    ts = dt.datetime(2024, 1, 1)
    rows1 = [("u1", ts, "alpha"), ("u2", ts, "beta"), ("u2b", ts, "beta")]
    rows2 = [("u3", ts, "beta"), ("u4", ts, "gamma"), ("u5", ts, "alpha")]
    schema = "url string, warc_ts timestamp, text string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(p)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(p)

    src = (
        spark.readStream.schema(spark.read.parquet(p).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(p)
    )
    q = streaming.run_stream_to_memory(
        streaming.streaming_dedup(src), "dedup_test"
    )
    assert q.recentProgress and len(q.recentProgress) > 1  # ≥2 micro-batches
    got = {r["url"] for r in spark.sql("select * from dedup_test").collect()}
    # one url per distinct text; within a batch min (warc_ts, url) wins, and
    # batch-2 repeats of alpha/beta never re-emit
    assert got == {"u1", "u2", "u4"}


def test_iceberg_gate_and_parquet_fallback(spark, tmp_path):
    """No Iceberg runtime in this sandbox → the capability gate must say so
    and the read/write round-trip must fall back to partitioned parquet with
    identical DataFrame semantics."""
    from pbf2json_spark import iceberg, pages

    assert iceberg.iceberg_available(spark) is False
    assert iceberg.classpath_has_iceberg_jar() is False
    conf = iceberg.catalog_conf("/tmp/wh")
    assert conf["spark.sql.catalog.local.type"] == "hadoop"

    pg = pages.generate_pages(spark, 500).withColumn(
        "day", __import__("pyspark").sql.functions.to_date("warc_ts")
    )
    loc = str(tmp_path / "pages_tbl")
    iceberg.write_pages(pg, loc, mode="overwrite", partition_cols=("day",))
    back = iceberg.read_pages(spark, loc)
    assert back.count() == 500
    assert set(back.columns) == set(pg.columns)
    # directory partitioning actually happened (the pruning-relevant part)
    import glob as g
    assert g.glob(f"{loc}/day=*")


def test_streaming_cms_matches_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    from pbf2json_spark import sketch, streaming

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(f"tok{i % 23}",) for i in range(500)], "k string"
    ).repartition(4).write.parquet(p)
    batch = spark.read.parquet(p)
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sketch.cms_build(batch, "k", 3, 64).collect()
    }
    src = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(p)
    q = streaming.run_stream_to_memory(
        streaming.streaming_cms(src, "k", 3, 64), "cms_stream",
        output_mode="complete",
    )
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_stream").collect()
    }
    q.stop()
    assert got == want  # live sketch == batch replay, cell for cell
