"""Wave-63: Holt double-exponential smoothing (vs brute integer replica;
linear series → forecast extrapolates the line; constant series trend 0)
and cross-correlation lead-lag (vs brute; planted x-leads-y recovered at
the right lag)."""

from __future__ import annotations

import math
import random

from pbf2json_spark import temporal


# --- Holt -------------------------------------------------------------------------


def _brute_holt(vals, a=300, g=100, horizon=7):
    l = vals[0] * 1000
    b = 0
    for v in vals[1:]:
        l_new = math.floor((a * v * 1000 + (1000 - a) * (l + b)) / 1000)
        b_new = math.floor((g * (l_new - l) + (1000 - g) * b) / 1000)
        l, b = l_new, b_new
    return len(vals), l, b, l + horizon * b


def test_holt_vs_brute(spark):
    rnd = random.Random(63)
    rows = []
    series = {}
    for k in range(6):
        vals = [rnd.randrange(0, 5000) for _ in range(rnd.randrange(3, 120))]
        series[f"s{k}"] = vals
        days = sorted(rnd.sample(range(500), len(vals)))  # gaps everywhere
        rows += [(f"s{k}", d, v) for d, v in zip(days, vals)]
    df = spark.createDataFrame(rows, "k string, d long, v long")
    got = {
        r["k"]: (r["n"], r["level_e3"], r["trend_e3"], r["forecast_e3"])
        for r in temporal.holt_smooth(df, "k", "d", "v").collect()
    }
    for k, vals in series.items():
        assert got[k] == _brute_holt(vals), k


def test_holt_linear_and_constant(spark):
    rows = [("lin", d, 100 + 10 * d) for d in range(200)]
    rows += [("const", d, 42) for d in range(50)]
    df = spark.createDataFrame(rows, "k string, d long, v long")
    got = {
        r["k"]: (r["level_e3"], r["trend_e3"], r["forecast_e3"])
        for r in temporal.holt_smooth(df, "k", "d", "v").collect()
    }
    lvl, tr, fc = got["lin"]
    # converged trend ≈ 10/day (e3 units), forecast continues the line
    assert abs(tr - 10_000) < 300
    assert abs(fc - (lvl + 7 * 10_000)) < 2200
    assert got["const"] == (42_000, 0, 42_000)


# --- CCF --------------------------------------------------------------------------


def _brute_ccf(rows, max_lag):
    series = {}
    for k, d, x, y in rows:
        series.setdefault(k, {})[d] = (x, y)
    out = {}
    for k, sv in series.items():
        for lag in range(-max_lag, max_lag + 1):
            pairs = [
                (xy[0], sv[d + lag][1])
                for d, xy in sv.items()
                if (d + lag) in sv
            ]
            m = len(pairs)
            sx = sum(a for a, _ in pairs)
            sy = sum(b for _, b in pairs)
            sxy = sum(a * b for a, b in pairs)
            sxx = sum(a * a for a, _ in pairs)
            syy = sum(b * b for _, b in pairs)
            cov = m * sxy - sx * sy
            vx = m * sxx - sx * sx
            vy = m * syy - sy * sy
            r = (
                cov / math.sqrt(float(vx) * float(vy))
                if m >= 2 and vx > 0 and vy > 0
                else None
            )
            out[(k, lag)] = (m, cov, vx, vy, r)
    return out


def test_ccf_vs_brute_and_lead_detection(spark):
    rnd = random.Random(163)
    rows = []
    base = {d: rnd.randrange(100, 200) for d in range(120)}
    for d in range(120):
        if rnd.random() < 0.1:
            continue
        x = base[d]
        y = base.get(d - 2, 150) + rnd.randrange(-3, 4)  # y follows x by 2 days
        rows.append(("pair", d, x, y))
    df = spark.createDataFrame(rows, "k string, d long, x long, y long")
    got = {
        (r["k"], r["lag"]): (r["m"], r["s_cov"], r["s_varx"], r["s_vary"], r["r"])
        for r in temporal.ccf_lags(df, "k", "d", "x", "y", max_lag=3).collect()
    }
    want = _brute_ccf(rows, 3)
    assert set(got) == set(want)
    for key in got:
        assert got[key][:4] == want[key][:4], key
        if want[key][4] is None:
            assert got[key][4] is None
        else:
            assert abs(got[key][4] - want[key][4]) < 1e-12
    # the planted 2-day lead peaks at lag +2
    peak = max(range(-3, 4), key=lambda lag: got[("pair", lag)][4] or -2)
    assert peak == 2 and got[("pair", 2)][4] > 0.9
