"""Wave-73: Z-order bbox range planning (quadtree decomposition of a
lat/lon bbox into Morton-code intervals) — covering exactness vs brute
cell enumeration, coarsening laws, and row-set equality of the pushed
range filter against the plain bbox predicate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pbf2json_spark import cells, layout


def _brute_codes(lat0, lat1, lon0, lon1, res):
    """Every cell code at `res` whose grid cell intersects the bbox —
    via the same floor/clamp mapping cell ids use."""
    import math
    n = 1 << res
    qx0 = max(0, min(n - 1, math.floor((lon0 + 180.0) / 360.0 * n)))
    qx1 = max(0, min(n - 1, math.floor((lon1 + 180.0) / 360.0 * n)))
    qy0 = max(0, min(n - 1, math.floor((lat0 + 90.0) / 180.0 * n)))
    qy1 = max(0, min(n - 1, math.floor((lat1 + 90.0) / 180.0 * n)))
    xs = np.arange(qx0, qx1 + 1, dtype=np.uint64)
    ys = np.arange(qy0, qy1 + 1, dtype=np.uint64)
    gx, gy = np.meshgrid(xs, ys)
    m = cells._spread(gx.ravel()) | (cells._spread(gy.ravel()) << np.uint64(1))
    pre = np.uint64(res << cells._RES_SHIFT)
    return set((pre | m).astype(np.int64).tolist())


def _expand(ranges):
    out = set()
    for lo, hi in ranges:
        out.update(range(lo, hi + 1))
    return out


BOXES = [
    (10.0, 20.0, 30.0, 55.0),
    (-5.3, 4.9, -120.0, -119.0),
    (60.0, 60.0, 7.0, 7.0),          # degenerate point box
    (-90.0, 90.0, -180.0, 180.0),    # whole world
    (88.0, 89.9, 170.0, 179.9),      # near corner
]


@pytest.mark.parametrize("box", BOXES)
def test_ranges_cover_exactly(box):
    res = 5
    got = layout.zorder_ranges(*box, res=res, max_ranges=10**9)
    assert got == sorted(got)
    for (a, b), (c, d) in zip(got, got[1:]):
        assert b + 1 < c, "ranges must be disjoint and non-adjacent (merged)"
    assert _expand(got) == _brute_codes(*box, res)


def test_coarsening_budget_superset():
    box = (10.0, 20.0, 30.0, 55.0)
    res = 6
    full = _expand(layout.zorder_ranges(*box, res=res, max_ranges=10**9))
    for budget in (1, 2, 4, 8):
        r = layout.zorder_ranges(*box, res=res, max_ranges=budget)
        assert 1 <= len(r) <= budget
        assert full <= _expand(r), "coarsening must only ADD codes"


def test_empty_and_bad_inputs():
    assert layout.zorder_ranges(5.0, 4.0, 0.0, 1.0, res=5) == []
    with pytest.raises(ValueError):
        layout.zorder_ranges(0, 1, 0, 1, res=99)
    with pytest.raises(ValueError):
        layout.zorder_ranges(0, 1, 0, 1, res=5, max_ranges=0)


def _points(spark, n=4000):
    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("id") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
    )


def test_range_filter_rowset_equality(spark):
    pts = _points(spark)
    box = (-30.0, 10.0, 20.0, 90.0)
    want = sorted(
        r["id"] for r in pts.filter(
            (F.col("lat") >= box[0]) & (F.col("lat") <= box[1])
            & (F.col("lon") >= box[2]) & (F.col("lon") <= box[3])
        ).collect()
    )
    assert want, "test box must be non-empty"
    for budget in (4, 64):
        got = sorted(
            r["id"] for r in layout.zorder_range_filter(
                pts, *box, res=8, max_ranges=budget
            ).collect()
        )
        assert got == want, budget


def test_range_filter_stored_key_and_empty(spark, tmp_path):
    # a STORED key must come from an actual source column (parquet here):
    # a same-plan withColumn would be substituted into the predicate by
    # pushdown exactly like the computed-key path
    path = str(tmp_path / "zpts")
    _points(spark).withColumn(
        "zkey", layout.zorder_col(F.col("lat"), F.col("lon"), 8)
    ).write.parquet(path)
    pts = spark.read.parquet(path)
    box = (-30.0, 10.0, 20.0, 90.0)
    flt = layout.zorder_range_filter(pts, *box, res=8, key_col="zkey")
    a = sorted(r["id"] for r in flt.collect())
    b = sorted(r["id"] for r in layout.zorder_range_filter(
        pts, *box, res=8).collect())
    assert a == b and a
    # the OR-of-BETWEENs on the stored key reaches the parquet scan —
    # this is the read-side payoff the planner exists for
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "zkey" in plan.split("PushedFilters")[1][:2000]
    assert layout.zorder_range_filter(pts, 5.0, 4.0, 0.0, 1.0).count() == 0
