"""Wave-23: emerging-hotspot analysis (per-slice Gi* + Mann-Kendall)
vs a brute-force composition of the two already-verified kernels."""

from __future__ import annotations

import random
from collections import Counter

from pbf2json_spark import spatial


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _cellize(lat, lon, res):
    n = 1 << res
    x = min(max(int((lon + 180.0) / 360.0 * n), 0), n - 1)
    y = min(max(int((lat + 90.0) / 180.0 * n), 0), n - 1)
    return x, y


def _brute_gi_bucket(counts):
    n = len(counts)
    s = sum(counts.values())
    q = sum(v * v for v in counts.values())
    out = {}
    for (cx, cy), x in counts.items():
        nbrs = [counts[(cx + dx, cy + dy)]
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if not (dx == 0 and dy == 0)
                and (cx + dx, cy + dy) in counts]
        w = len(nbrs) + 1
        t = x + sum(nbrs)
        num = n * t - w * s
        sign = (num > 0) - (num < 0)
        den = (n * q - s * s) * (n * w - w * w)
        out[(cx, cy)] = sign * _tdiv(num * num * (n - 1) * 1_000_000,
                                     max(den, 1))
    return out


def _brute_mk(series):
    n = len(series)
    ys = [y for _, y in sorted(series)]
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (ys[j] > ys[i]) - (ys[j] < ys[i])
    ties = Counter(ys)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values())
    sign = (s > 0) - (s < 0)
    mk2 = sign * _tdiv((abs(s) - 1) ** 2 * 18 * 1_000_000, max(var18, 1))
    return n, s, var18, mk2


def _brute_emerging(events, res, bucket):
    per_bucket = {}
    for la, lo, t in events:
        b = t // bucket
        per_bucket.setdefault(b, Counter())[_cellize(la, lo, res)] += 1
    series = {}
    for b, counts in per_bucket.items():
        for cell, gi in _brute_gi_bucket(counts).items():
            series.setdefault(cell, []).append((b, gi))
    return {cell: _brute_mk(sr) for cell, sr in series.items()}


def test_emerging_vs_brute(spark):
    rng = random.Random(231)
    bucket = 1000
    events = []
    # a zone that heats up bucket over bucket
    for b in range(6):
        for _ in range(5 + b * 8):
            events.append((rng.uniform(30, 31), rng.uniform(30, 31),
                           b * bucket + rng.randrange(bucket)))
        # steady background spread over the map
        for _ in range(30):
            events.append((rng.uniform(-70, 70), rng.uniform(-160, 160),
                           b * bucket + rng.randrange(bucket)))
    df = spark.createDataFrame(events, "lat double, lon double, ts_us long")
    got = {(r["cx"], r["cy"]): (r["n_buckets"], r["s_stat"],
                                r["var18"], r["mk2_e6"])
           for r in spatial.emerging_hotspots(df, res=4,
                                              bucket_us=bucket).collect()}
    assert got == _brute_emerging(events, 4, bucket)


def test_emerging_detects_heating_cell(spark):
    # Gi* is a z-score, so the whole SURFACE must not scale up together
    # (a self-similar ramp gives a CONSTANT z series — verified: that
    # scenario yields S = 0). Here 8 background cells hold steady at 5
    # while one cell ramps 1→21: its z rises strictly, S = 6 choose 2.
    events = []
    bucket = 100
    bg = [(-60.0 + 15.0 * i, -150.0 + 30.0 * i) for i in range(8)]
    for b in range(6):
        for _ in range(1 + b * 4):
            events.append((10.05, 10.05, b * bucket + 1))
        for la, lo in bg:
            for _ in range(5):
                events.append((la, lo, b * bucket + 2))
    df = spark.createDataFrame(events, "lat double, lon double, ts_us long")
    rows = {(r["cx"], r["cy"]): r
            for r in spatial.emerging_hotspots(df, res=4,
                                               bucket_us=bucket).collect()}
    r = rows[_cellize(10.05, 10.05, 4)]
    assert r["n_buckets"] == 6
    # z-scores saturate once the ramping cell dominates the variance
    # (|z| plateaus; only the rise through the mean moves), so the
    # series is rising-then-tied: S = 9 exactly, not the 15 of a
    # strictly-monotone series — a property of Gi*, not a defect
    assert r["s_stat"] == 9
    assert r["mk2_e6"] > 0
    # a steady background cell COOLS in relative terms as the hot cell
    # ramps (its z falls): the two trends must be on opposite sides
    r_bg = rows[_cellize(*bg[0], 4)]
    assert r_bg["mk2_e6"] < 0 < r["mk2_e6"]
