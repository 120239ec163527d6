"""Z-order layout: per-file bounding boxes from real parquet footers must
be dramatically tighter than the shuffled baseline's, and the relaid data
is byte-identical as a set."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pbf2json_spark import layout


def _file_bbox_area_sum(path: str, lat_col="lat", lon_col="lon") -> float:
    total = 0.0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        la, lo = None, None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sa = g.column(names[lat_col]).statistics
            so = g.column(names[lon_col]).statistics
            la = (
                (sa.min, sa.max) if la is None
                else (min(la[0], sa.min), max(la[1], sa.max))
            )
            lo = (
                (so.min, so.max) if lo is None
                else (min(lo[0], so.min), max(lo[1], so.max))
            )
        total += (la[1] - la[0]) * (lo[1] - lo[0])
    return total


def test_zorder_layout_tightens_file_stats(spark, tmp_path):
    n = 40_000
    pts = spark.range(n).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(160_000)) / 1000.0 - 80.0).alias("lat"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(340_000)) / 1000.0 - 170.0).alias("lon"),
    )
    base, zdir = str(tmp_path / "plain"), str(tmp_path / "zorder")
    # baseline: a hash-shuffled layout (what a generic ETL leaves behind)
    pts.repartition(32).write.parquet(base)
    layout.zorder_layout(pts, n_files=32).write.parquet(zdir)

    plain_area = _file_bbox_area_sum(base)
    z_area = _file_bbox_area_sum(zdir)
    # every shuffled file spans ~the whole globe; z-ordered files tile it
    # 32 z-range files tile the globe; 32 shuffled files EACH span it
    assert z_area < plain_area / 8, (z_area, plain_area)

    # the relaid table is the same multiset of rows
    a = spark.read.parquet(base).orderBy("id").collect()
    b = spark.read.parquet(zdir).orderBy("id").collect()
    assert a == b

    # and a range scan over the z-ordered files prunes row groups: the
    # filtered result is still exact
    box = spark.read.parquet(zdir).filter(
        (F.col("lat").between(10, 20)) & (F.col("lon").between(30, 50))
    )
    want = [r for r in a if 10 <= r["lat"] <= 20 and 30 <= r["lon"] <= 50]
    assert sorted(r["id"] for r in box.collect()) == sorted(r["id"] for r in want)
