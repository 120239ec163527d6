"""Wave-32: Theil-Sen robust slope and the URL risk screen — vs
brute-force references."""

from __future__ import annotations

import random
import statistics

from pbf2json_spark import stats, weburl


# --- theil_sen ---------------------------------------------------------------


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _brute_ts(pts):
    # the operator's pair rule: every (a, b) with xa < xb
    slopes = []
    for xa, ya in pts:
        for xb, yb in pts:
            if xa < xb:
                slopes.append(_tdiv((yb - ya) * 1_000_000, xb - xa))
    med = statistics.median(slopes) if slopes else None
    return len(pts), len(slopes), med


def test_theil_sen_vs_brute(spark):
    rng = random.Random(321)
    groups = {
        "clean_up": [(x, 3 * x + 7) for x in range(20)],
        "outliers": [(x, 2 * x) for x in range(15)] + [(3, 9_000), (7, -5_000)],
        "noisy": [(x, 5 * x + rng.randrange(-40, 41)) for x in range(25)],
        "down": [(x, 100 - 4 * x) for x in range(12)],
    }
    rows = [(g, x, y) for g, pts in groups.items() for x, y in pts]
    df = spark.createDataFrame(rows, "src string, x long, y long")
    got = {r["src"]: (r["n_obs"], r["n_pairs"], r["ts_slope_e6"])
           for r in stats.theil_sen(df, ["src"], "x", "y").collect()}
    assert got == {g: _brute_ts(pts) for g, pts in groups.items()}
    assert got["clean_up"][2] == 3_000_000.0
    assert got["down"][2] == -4_000_000.0
    # two wild outliers cannot drag the median off the true slope by much
    assert abs(got["outliers"][2] - 2_000_000.0) < 300_000


def test_theil_sen_single_point_and_ties(spark):
    rows = [("one", 5, 9),
            ("tied", 1, 10), ("tied", 1, 99), ("tied", 2, 20)]
    df = spark.createDataFrame(rows, "src string, x long, y long")
    got = {r["src"]: (r["n_obs"], r["n_pairs"], r["ts_slope_e6"])
           for r in stats.theil_sen(df, ["src"], "x", "y").collect()}
    assert got["one"] == (1, 0, None)
    # tied x pair (1,10)-(1,99) excluded: two usable pairs remain
    assert got["tied"][1] == 2


# --- url_risk_score ----------------------------------------------------------


def test_url_risk_rules(spark):
    cases = [
        ("https://example.com/page", 0, []),
        ("https://xn--pple-43d.com/login", 300, ["punycode"]),
        ("http://192.168.10.44/admin", 400, ["ip_host"]),
        ("https://a.b.c.d.example.com/x", 200, ["many_subdomains"]),
        ("https://secure12345678.example.com/x", 150, ["long_digit_run"]),
        ("https://good.com@evil.com/x", 350, ["at_sign"]),
        ("https://example.com/invoice.pdf.exe", 250, ["double_ext"]),
        ("https://example.com/" + "q" * 250, 100, ["long_url"]),
        ("http://10.0.0.1/a.zip.scr?x=1", 650, ["ip_host", "double_ext"]),
    ]
    df = spark.createDataFrame([(u,) for u, _s, _f in cases], "url string")
    got = {r["url"]: r for r in weburl.url_risk_score(df).collect()}
    for url, score, names in cases:
        r = got[url]
        assert r["risk_score_e2"] == score, url
        for rule, _w in weburl._RISK_RULES:
            assert r[rule] == (rule in names), (url, rule)
