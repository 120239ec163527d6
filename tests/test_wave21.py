"""Wave-21 operators: Getis-Ord Gi* hotspots, Knox space-time
interaction, Levenshtein edit-distance near-dup — each vs a brute-force
reference on the same rows."""

from __future__ import annotations

import random

from pbf2json_spark import dedup, spatial


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _cellize(lat, lon, res):
    n = 1 << res
    x = min(max(int((lon + 180.0) / 360.0 * n), 0), n - 1)
    y = min(max(int((lat + 90.0) / 180.0 * n), 0), n - 1)
    return x, y


# --- gi_star ---------------------------------------------------------------


def _brute_gi(points, res):
    from collections import Counter

    counts = Counter(_cellize(la, lo, res) for la, lo in points)
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
        gi2 = _tdiv(num * num * (n - 1) * 1_000_000, max(den, 1))
        out[(cx, cy)] = (x, w, t, sign, gi2)
    return out


def test_gi_star_vs_brute(spark):
    rng = random.Random(211)
    # two hot blobs + background noise so sign covers both polarities
    pts = [(rng.uniform(10, 12), rng.uniform(10, 12)) for _ in range(60)]
    pts += [(rng.uniform(-40, -38), rng.uniform(100, 102)) for _ in range(30)]
    pts += [(rng.uniform(-80, 80), rng.uniform(-170, 170)) for _ in range(40)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = {(r["cx"], r["cy"]): (r["x"], r["w_i"], r["t_i"],
                                r["gi_sign"], r["gi2_e6"])
           for r in spatial.gi_star(df, res=4).collect()}
    assert got == _brute_gi(pts, 4)


def test_gi_star_hot_cell_is_positive(spark):
    # one dense cell among sparse ones: it must score gi_sign=+1 and the
    # largest gi2_e6
    pts = [(0.1, 0.1)] * 50 + [(45.0, 45.0), (-45.0, -45.0), (60.0, 120.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = spatial.gi_star(df, res=4).collect()
    hot = max(rows, key=lambda r: r["gi2_e6"])
    assert hot["x"] == 50 and hot["gi_sign"] == 1


# --- knox_pairs ------------------------------------------------------------


def _brute_knox(events, res, tau):
    evs = [(_cellize(la, lo, res), t) for la, lo, t in events]
    n = len(evs)
    ns = nt = x = 0
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            (c1, t1), (c2, t2) = evs[i], evs[j]
            sclose = abs(c1[0] - c2[0]) <= 1 and abs(c1[1] - c2[1]) <= 1
            # the operator wraps longitude; keep test points off the seam
            tclose = abs(t1 - t2) <= tau
            ns += sclose
            nt += tclose
            x += sclose and tclose
    lift = _tdiv(x * n * (n - 1) * 1_000_000, max(ns * nt, 1))
    return n, n * (n - 1), ns, nt, x, lift


def test_knox_vs_brute(spark):
    rng = random.Random(212)
    tau = 1000
    events = []
    # clustered burst: same area, close times
    for _ in range(25):
        events.append((rng.uniform(20, 21), rng.uniform(20, 21),
                       rng.randrange(0, 3000)))
    # scattered background
    for _ in range(40):
        events.append((rng.uniform(-60, 60), rng.uniform(-150, 150),
                       rng.randrange(0, 1_000_000)))
    df = spark.createDataFrame(events, "lat double, lon double, ts_us long")
    r = spatial.knox_pairs(df, res=4, tau_us=tau).collect()[0]
    assert (r["n_events"], r["n_pairs"], r["ns_pairs"], r["nt_pairs"],
            r["x_pairs"], r["knox_lift_e6"]) == _brute_knox(events, 4, tau)


def test_knox_burst_lifts(spark):
    # all space-close pairs are also time-close → lift far above 1e6
    events = [(10.0 + i * 0.01, 10.0, i) for i in range(10)]          # burst
    events += [(-70.0, -150.0 + i * 20.0, 10_000_000 + i * 10_000_000)
               for i in range(8)]                                      # spread
    df = spark.createDataFrame(events, "lat double, lon double, ts_us long")
    r = spatial.knox_pairs(df, res=4, tau_us=100).collect()[0]
    assert r["x_pairs"] == 90 and r["knox_lift_e6"] > 1_000_000


# --- edit_near_dup ---------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _norm(text: str, tl: int = 24) -> str:
    return "".join(ch for ch in text[:tl].lower()
                   if ch in "abcdefghijklmnopqrstuvwxyz0123456789 ")


def _brute_edit_pairs(docs, d=3):
    out = set()
    for i, (ida, la, ta) in enumerate(docs):
        for idb, lb, tb in docs[i + 1:]:
            if la != lb:
                continue
            na, nb = _norm(ta), _norm(tb)
            if abs(len(na) - len(nb)) > d:
                continue
            dist = _lev(na, nb)
            if dist <= d:
                a, b = min(ida, idb), max(ida, idb)
                la_, lb_ = (len(na), len(nb)) if a == ida else (len(nb), len(na))
                out.add((a, b, la_, lb_, dist))
    return out


def test_edit_near_dup_vs_brute(spark):
    rng = random.Random(213)
    base = ["the quick brown fox jumps", "lorem ipsum dolor sit amet",
            "breaking news today 2024", "product page item 00"]
    docs = []
    for i in range(60):
        t = rng.choice(base)
        # random single-char edits
        for _ in range(rng.randrange(0, 4)):
            p = rng.randrange(len(t))
            t = t[:p] + rng.choice("abcxyz 0123") + t[p + 1:]
        docs.append((i, rng.choice(["en", "fi"]), t))
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {(r["a"], r["b"], r["len_a"], r["len_b"], r["dist"])
           for r in dedup.edit_near_dup(df).collect()}
    assert got == _brute_edit_pairs(docs)


def test_edit_near_dup_cross_bucket_recall(spark):
    # two titles whose normalized lengths straddle a bucket boundary
    # (len 7 vs len 9 with bucket=8: buckets 0 and 1) AND a > b by id —
    # the exact case the off=1 scatter must not lose
    docs = [(9, "en", "abcdefg"), (2, "en", "abcdefgxy")]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    rows = dedup.edit_near_dup(df, max_dist=3, bucket=8).collect()
    assert [(r["a"], r["b"], r["dist"]) for r in rows] == [(2, 9, 2)]


def test_edit_near_dup_lang_blocks(spark):
    docs = [(1, "en", "same title here"), (2, "fi", "same title here")]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    assert dedup.edit_near_dup(df).count() == 0
