"""Wave-33: isotonic regression (Pool Adjacent Violators) — vs a brute
reference and the monotone-optimality property."""

from __future__ import annotations

import random

from pbf2json_spark import stats


def _brute_pav(pts):
    """pts: list of (x, y). Returns {x: (y_mean, fitted)}."""
    agg: dict[int, tuple[int, int]] = {}
    for x, y in pts:
        s, c = agg.get(x, (0, 0))
        agg[x] = (s + y, c + 1)
    xs = sorted(agg)
    stack = []
    for i, x in enumerate(xs):
        s, c = agg[x]
        stack.append([i, s, c])
        while len(stack) >= 2 and (
            stack[-1][1] * stack[-2][2] < stack[-2][1] * stack[-1][2]
        ):
            _i, s2, c2 = stack.pop()
            stack[-1][1] += s2
            stack[-1][2] += c2
    fitted = {}
    for j, (start, s, c) in enumerate(stack):
        end = stack[j + 1][0] if j + 1 < len(stack) else len(xs)
        for i in range(start, end):
            fitted[xs[i]] = s / c
    return {x: (agg[x][0] / agg[x][1], fitted[x]) for x in xs}


def test_isotonic_vs_brute(spark):
    rng = random.Random(331)
    groups = {}
    for g in ("calib", "noisy", "flat"):
        pts = []
        for x in range(30):
            base = {"calib": 3 * x, "noisy": 2 * x, "flat": 50}[g]
            for _ in range(rng.randrange(1, 4)):
                pts.append((x, base + rng.randrange(-25, 26)))
        groups[g] = pts
    rows = [(g, x, y) for g, pts in groups.items() for x, y in pts]
    df = spark.createDataFrame(rows, "src string, x long, y long")
    got = {}
    for r in stats.isotonic_fit(df, ["src"], "x", "y").collect():
        got.setdefault(r["src"], {})[r["x"]] = (r["y_mean"], r["fitted"])
    for g, pts in groups.items():
        assert got[g] == _brute_pav(pts), g
        # fit is monotone non-decreasing in x
        fs = [got[g][x][1] for x in sorted(got[g])]
        assert all(a <= b for a, b in zip(fs, fs[1:])), g


def test_isotonic_violator_pooling(spark):
    # decreasing pair pools to its mean; already-monotone data unchanged
    rows = [("a", 1, 10), ("a", 2, 4), ("a", 3, 20),
            ("b", 1, 1), ("b", 2, 2)]
    df = spark.createDataFrame(rows, "src string, x long, y long")
    got = {(r["src"], r["x"]): r["fitted"]
           for r in stats.isotonic_fit(df, ["src"], "x", "y").collect()}
    assert got[("a", 1)] == got[("a", 2)] == 7.0
    assert got[("a", 3)] == 20.0
    assert got[("b", 1)] == 1.0 and got[("b", 2)] == 2.0
