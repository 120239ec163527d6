"""Wave-75: Hilbert-curve bbox range planning — covering exactness vs
brute hilbert_d enumeration, the fewer-intervals-than-Morton locality
claim, coarsening laws, and filter row-set equality incl. a stored-key
parquet round-trip with PushedFilters."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pbf2json_spark import layout


def _brute_codes(lat0, lat1, lon0, lon1, res):
    n = 1 << res
    qx0 = max(0, min(n - 1, math.floor((lon0 + 180.0) / 360.0 * n)))
    qx1 = max(0, min(n - 1, math.floor((lon1 + 180.0) / 360.0 * n)))
    qy0 = max(0, min(n - 1, math.floor((lat0 + 90.0) / 180.0 * n)))
    qy1 = max(0, min(n - 1, math.floor((lat1 + 90.0) / 180.0 * n)))
    xs = np.arange(qx0, qx1 + 1)
    ys = np.arange(qy0, qy1 + 1)
    gx, gy = np.meshgrid(xs, ys)
    return set(layout.hilbert_d(gx.ravel(), gy.ravel(), res).tolist())


def _expand(ranges):
    out = set()
    for lo, hi in ranges:
        out.update(range(lo, hi + 1))
    return out


BOXES = [
    (10.0, 20.0, 30.0, 55.0),
    (-5.3, 4.9, -120.0, -119.0),
    (60.0, 60.0, 7.0, 7.0),
    (-90.0, 90.0, -180.0, 180.0),
    (88.0, 89.9, 170.0, 179.9),
]


@pytest.mark.parametrize("box", BOXES)
def test_hilbert_ranges_cover_exactly(box):
    res = 5
    got = layout.hilbert_ranges(*box, res=res, max_ranges=10**9)
    assert got == sorted(got)
    for (a, b), (c, d) in zip(got, got[1:]):
        assert b + 1 < c
    assert _expand(got) == _brute_codes(*box, res)


def test_hilbert_beats_morton_on_interval_count():
    # the locality claim: over a set of boxes, the Hilbert decomposition
    # never needs more intervals than the Morton one and wins overall
    res = 7
    h_total = z_total = 0
    for box in BOXES:
        h = len(layout.hilbert_ranges(*box, res=res, max_ranges=10**9))
        z = len(layout.zorder_ranges(*box, res=res, max_ranges=10**9))
        h_total += h
        z_total += z
    assert h_total < z_total, (h_total, z_total)


def test_hilbert_coarsening_and_empty():
    box = (10.0, 20.0, 30.0, 55.0)
    full = _expand(layout.hilbert_ranges(*box, res=6, max_ranges=10**9))
    for budget in (1, 3, 9):
        r = layout.hilbert_ranges(*box, res=6, max_ranges=budget)
        assert 1 <= len(r) <= budget
        assert full <= _expand(r)
    assert layout.hilbert_ranges(5.0, 4.0, 0.0, 1.0, res=5) == []
    with pytest.raises(ValueError):
        layout.hilbert_ranges(0, 1, 0, 1, res=99)


def _points(spark, n=4000):
    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("id") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
    )


def test_hilbert_filter_rowset_equality(spark, tmp_path):
    pts = _points(spark)
    box = (-30.0, 10.0, 20.0, 90.0)
    want = sorted(
        r["id"] for r in pts.filter(
            (F.col("lat") >= box[0]) & (F.col("lat") <= box[1])
            & (F.col("lon") >= box[2]) & (F.col("lon") <= box[3])
        ).collect()
    )
    assert want
    got = sorted(
        r["id"] for r in layout.hilbert_range_filter(
            pts, *box, res=6, max_ranges=8
        ).collect()
    )
    assert got == want
    # stored key from parquet: pushed BETWEENs on the key column
    n = 1 << 6
    gx = F.greatest(F.lit(0), F.least(F.lit(n - 1), F.floor((F.col("lon") + 180.0) / 360.0 * float(n)))).cast("long")
    gy = F.greatest(F.lit(0), F.least(F.lit(n - 1), F.floor((F.col("lat") + 90.0) / 180.0 * float(n)))).cast("long")
    path = str(tmp_path / "hpts")
    layout.hilbert_df(
        pts.withColumns({"gx": gx, "gy": gy}), "gx", "gy", 6, out="hkey"
    ).write.parquet(path)
    stored = spark.read.parquet(path)
    flt = layout.hilbert_range_filter(stored, *box, res=6, key_col="hkey")
    got2 = sorted(r["id"] for r in flt.collect())
    assert got2 == want
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "hkey" in plan.split("PushedFilters")[1][:2000]
