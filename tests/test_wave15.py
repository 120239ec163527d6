"""Wave-15 operators: IDW grid interpolation, Unicode script-mix
profile, hour-of-week activity profile."""

from __future__ import annotations

import math
import random

from pbf2json_spark import spatial, temporal, textops

SCALE = 1_000_000


# --- idw_interpolate ---------------------------------------------------------


def _cell_xy(lat, lon, res):
    n = 1 << res
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    y = min(max(int(math.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
    return x, y


def _brute_idw(rows, res, radius):
    n = 1 << res
    acc = {}
    for lat, lon, v in rows:
        sx, sy = _cell_xy(lat, lon, res)
        for dx in range(-radius, radius + 1):
            for dy in range(-radius, radius + 1):
                cx, cy = (sx + dx) % n, sy + dy
                if not 0 <= cy < n:
                    continue
                w = SCALE // (1 + dx * dx + dy * dy)
                c, ws, wv = acc.get((cx, cy), (0, 0, 0))
                acc[(cx, cy)] = (c + 1, ws + w, wv + w * v)
    return {k: (c, ws, wv // ws) for k, (c, ws, wv) in acc.items()}


def test_idw_single_sample_kernel(spark):
    df = spark.createDataFrame([(10.0, 10.0, 100)],
                               "lat double, lon double, value long")
    got = {(r["cx"], r["cy"]): (r["n_samples"], r["w_sum"], r["est"])
           for r in spatial.idw_interpolate(df, 5, radius=1).collect()}
    sx, sy = _cell_xy(10, 10, 5)
    assert len(got) == 9
    # a single sample's estimate is exactly its value at EVERY cell
    assert all(v[2] == 100 for v in got.values())
    assert got[(sx, sy)][1] == SCALE  # center weight d2=0 -> SCALE


def test_idw_pole_drops_not_clamps(spark):
    # a sample in the top row: dy=+1 would leave the grid and must vanish
    df = spark.createDataFrame([(89.9, 0.0, 50)],
                               "lat double, lon double, value long")
    got = {(r["cx"], r["cy"]) for r in
           spatial.idw_interpolate(df, 4, radius=1).collect()}
    n = 1 << 4
    assert all(cy < n for _, cy in got)
    assert len(got) == 6  # 3 wrapped x * 2 valid y rows


def test_idw_lon_wrap(spark):
    df = spark.createDataFrame([(0.0, 179.9, 7)],
                               "lat double, lon double, value long")
    got = {(r["cx"], r["cy"]) for r in
           spatial.idw_interpolate(df, 3, radius=1).collect()}
    assert any(cx == 0 for cx, _ in got)  # wrapped across the antimeridian


def test_idw_vs_brute_random(spark):
    rng = random.Random(67)
    rows = [(rng.uniform(-80, 80), rng.uniform(-170, 170),
             rng.randrange(1000)) for _ in range(150)]
    df = spark.createDataFrame(rows, "lat double, lon double, value long")
    got = {(r["cx"], r["cy"]): (r["n_samples"], r["w_sum"], r["est"])
           for r in spatial.idw_interpolate(df, 4, radius=2).collect()}
    assert got == _brute_idw(rows, 4, 2)


# --- script_mix --------------------------------------------------------------


def test_script_mix_hand(spark):
    d = spark.createDataFrame(
        [(1, "hello мир 123"), (2, "pure ascii text"), (3, ""),
         (4, "中文网页 test")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_latin"], r["n_digit"], r["n_cyr"], r["n_cjk"],
                         r["n_marks"], r["mix_e6"])
           for r in textops.script_mix(d).collect()}
    assert got[1] == (5, 3, 3, 0, 11, 1_000_000 - 5_000_000 // 11)
    assert got[2] == (13, 0, 0, 0, 13, 0)       # single script -> exactly 0
    assert got[3] == (0, 0, 0, 0, 0, 0)          # empty text guard
    assert got[4] == (4, 0, 0, 4, 8, 500_000)    # even latin/CJK split


def test_script_mix_drops_text_keeps_other_cols(spark):
    d = spark.createDataFrame([(1, "en", "abc")],
                              "doc_id long, lang string, text string")
    r = textops.script_mix(d)
    assert "text" not in r.columns and {"doc_id", "lang"} < set(r.columns)


# --- activity_profile --------------------------------------------------------


def _brute_profile(rows):
    n = {}
    for k, ts in rows:
        dow = (ts // 86_400_000_000 + 4) % 7
        hour = (ts // 3_600_000_000) % 24
        n[(k, dow, hour)] = n.get((k, dow, hour), 0) + 1
    tot = {}
    for (k, _, _), v in n.items():
        tot[k] = tot.get(k, 0) + v
    return {key: (v, v * 1_000_000 // tot[key[0]]) for key, v in n.items()}


def test_activity_profile_epoch_dow(spark):
    # 1970-01-01 is a Thursday: dow must be 4 with 0=Sunday
    e = spark.createDataFrame([("a", 0), ("a", 3_600_000_000),
                               ("a", 86_400_000_000)],
                              "event_type string, ts_us long")
    got = {(r["event_type"], r["dow"], r["hour"]): (r["n"], r["share_e6"])
           for r in temporal.activity_profile(e).collect()}
    assert got == {("a", 4, 0): (1, 333_333), ("a", 4, 1): (1, 333_333),
                   ("a", 5, 0): (1, 333_333)}


def test_activity_profile_vs_brute_random(spark):
    rng = random.Random(71)
    rows = [(rng.choice("xyz"), rng.randrange(30 * 86_400_000_000))
            for _ in range(500)]
    e = spark.createDataFrame(rows, "event_type string, ts_us long")
    got = {(r["event_type"], r["dow"], r["hour"]): (r["n"], r["share_e6"])
           for r in temporal.activity_profile(e).collect()}
    assert got == _brute_profile(rows)
