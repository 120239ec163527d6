"""Wave-58: standard deviational ellipse (vs numpy eigen reference;
isotropy law; rotation alignment) and lag-k ACF (vs brute reference with
day gaps; weekly-periodic series r(7) >> r(1); constant series NULL)."""

from __future__ import annotations

import math
import random

from pbf2json_spark import stats, temporal


# --- deviational ellipse ----------------------------------------------------------


def _brute_sde(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    cxx = n * sxx - sx * sx
    cyy = n * syy - sy * sy
    cxy = n * sxy - sx * sy
    tr = float(cxx) + float(cyy)
    dd = float(cxx) - float(cyy)
    disc = math.sqrt(dd * dd + 4.0 * float(cxy) * float(cxy))
    return (n, sx, sy, cxx, cyy, cxy, (tr + disc) / 2.0, (tr - disc) / 2.0)


def test_sde_vs_brute(spark):
    rnd = random.Random(58)
    groups = {}
    # anisotropic cloud stretched along y = 2x, isotropic cloud, line
    for g, (ax, ay, rot) in enumerate([(300, 30, 0.5), (100, 100, 0.0),
                                       (500, 1, 1.1)]):
        pts = []
        for _ in range(400):
            u = rnd.gauss(0, ax)
            w = rnd.gauss(0, ay)
            x = int(u * math.cos(rot) - w * math.sin(rot)) + 10_000
            y = int(u * math.sin(rot) + w * math.cos(rot)) - 5_000
            pts.append((x, y))
        groups[f"g{g}"] = pts
    rows = [(g, x, y) for g, pts in groups.items() for x, y in pts]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    got = {
        r["grp"]: (r["n"], r["sx"], r["sy"], r["cxx"], r["cyy"], r["cxy"],
                   r["eig_major"], r["eig_minor"])
        for r in stats.deviational_ellipse(df, ["grp"], "x", "y").collect()
    }
    for g, pts in groups.items():
        want = _brute_sde(pts)
        assert got[g][:6] == want[:6], g
        assert abs(got[g][6] - want[6]) <= abs(want[6]) * 1e-12
        assert abs(got[g][7] - want[7]) <= abs(want[6]) * 1e-12
    # anisotropy ordering: stretched clouds have large major/minor ratio
    assert got["g0"][6] / max(got["g0"][7], 1.0) > 10
    assert got["g1"][6] / max(got["g1"][7], 1.0) < 2
    # derived angle (atan2 downstream of exact ints) matches the rotation
    cxx, cyy, cxy = got["g0"][3], got["g0"][4], got["g0"][5]
    theta = 0.5 * math.atan2(2.0 * cxy, cxx - cyy)
    assert abs(theta - 0.5) < 0.1


# --- ACF --------------------------------------------------------------------------


def _brute_acf(rows, lags):
    series = {}
    for k, d, v in rows:
        series.setdefault(k, {})[d] = v
    out = {}
    for k, sv in series.items():
        for lag in lags:
            pairs = [(v, sv[d - lag]) for d, v in sv.items() if (d - lag) in sv]
            m = len(pairs)
            sa = sum(a for a, _ in pairs)
            sb = sum(b for _, b in pairs)
            sab = sum(a * b for a, b in pairs)
            saa = sum(a * a for a, _ in pairs)
            sbb = sum(b * b for _, b in pairs)
            cov = m * sab - sa * sb
            va = m * saa - sa * sa
            vb = m * sbb - sb * sb
            r = (
                cov / math.sqrt(float(va) * float(vb))
                if m >= 2 and va > 0 and vb > 0
                else None
            )
            out[(k, lag)] = (m, cov, va, vb, r)
    return out


def test_acf_vs_brute_with_gaps(spark):
    rnd = random.Random(158)
    rows = []
    for k in ("w", "noise"):
        for d in range(80):
            if rnd.random() < 0.1:
                continue
            v = (
                100 + 50 * (d % 7 in (0, 1)) + rnd.randrange(-3, 4)
                if k == "w"
                else rnd.randrange(200)
            )
            rows.append((k, d, v))
    rows += [("const", d, 5) for d in range(30)]
    df = spark.createDataFrame(rows, "k string, d long, v long")
    got = {
        (r["k"], r["lag"]): (r["m"], r["s_cov"], r["s_vara"], r["s_varb"], r["r"])
        for r in temporal.acf_lags(df, "k", "d", "v", lags=[1, 7]).collect()
    }
    want = _brute_acf(rows, [1, 7])
    assert set(got) == set(want)
    for key in got:
        assert got[key][:4] == want[key][:4], key
        if want[key][4] is None:
            assert got[key][4] is None
        else:
            assert abs(got[key][4] - want[key][4]) < 1e-12
    # weekly series: strong lag-7, weaker lag-1; constant: NULL
    assert got[("w", 7)][4] > 0.8 and got[("w", 7)][4] > got[("w", 1)][4] + 0.2
    assert got[("const", 1)][4] is None
