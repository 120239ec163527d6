"""Wave-65: POI conflation (vs brute mutual-best reference; one-to-many
chain broken by mutuality; planted typo twins matched) and address-range
interpolation (vs brute rational reference; parity grid; reversed and
degenerate ranges)."""

from __future__ import annotations

import random

from pbf2json_spark import spatial


# --- POI conflation ---------------------------------------------------------------


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def _brute_conflate(left, right, res, max_dist, max_lev):
    cell = 1 << (26 - res)
    cands = []
    for lid, ln, llat, llon in left:
        for rid, rn, rlat, rlon in right:
            if abs(llat // cell - rlat // cell) > 1:
                continue
            if abs(llon // cell - rlon // cell) > 1:
                continue
            d = abs(llat - rlat) + abs(llon - rlon)
            lv = _lev(ln, rn)
            if d <= max_dist and lv <= max_lev:
                cands.append((lid, rid, ln, rn, d, lv))
    best_l, best_r = {}, {}
    for c in cands:
        key = (c[4], c[5], c[0], c[1])
        if c[0] not in best_l or key < best_l[c[0]][1]:
            best_l[c[0]] = (c[1], key)
        if c[1] not in best_r or key < best_r[c[1]][1]:
            best_r[c[1]] = (c[0], key)
    out = set()
    for c in cands:
        if best_l.get(c[0], (None,))[0] == c[1] and \
           best_r.get(c[1], (None,))[0] == c[0]:
            out.add(c)
    return out


def test_conflate_vs_brute(spark):
    rnd = random.Random(65)
    names = ["kahvila aalto", "ravintola koli", "kirjasto oodi",
             "sauna loyly", "tori kauppa"]
    left, right = [], []
    for i in range(60):
        nm = rnd.choice(names)
        lat = rnd.randrange(-2_000_000, 2_000_000)
        lon = rnd.randrange(-2_000_000, 2_000_000)
        left.append((i, nm, lat, lon))
        if i % 3 != 0:  # directory twin with typo + jitter
            nm2 = nm[:-1] if i % 2 == 0 else nm
            right.append((1000 + i, nm2, lat + rnd.randrange(-300, 300),
                          lon + rnd.randrange(-300, 300)))
    for j in range(20):  # unrelated POIs
        right.append((2000 + j, rnd.choice(names),
                      rnd.randrange(-2_000_000, 2_000_000),
                      rnd.randrange(-2_000_000, 2_000_000)))
    ldf = spark.createDataFrame(left, "id_l long, name string, lat_e6 long, lon_e6 long")
    rdf = spark.createDataFrame(right, "id_r long, name string, lat_e6 long, lon_e6 long")
    got = {
        (r["id_l"], r["id_r"], r["name_l"], r["name_r"], r["dist_e6"], r["lev"])
        for r in spatial.poi_conflate(ldf, rdf, res=10, max_dist_e6=2000).collect()
    }
    want = _brute_conflate(left, right, 10, 2000, 2)
    assert got == want
    assert len(got) >= 25  # most twins matched


def test_conflate_mutuality_breaks_chain(spark):
    # two lefts near one right: only the closer left matches
    left = [(1, "cafe x", 0, 0), (2, "cafe x", 0, 900)]
    right = [(10, "cafe x", 0, 100)]
    ldf = spark.createDataFrame(left, "id_l long, name string, lat_e6 long, lon_e6 long")
    rdf = spark.createDataFrame(right, "id_r long, name string, lat_e6 long, lon_e6 long")
    got = [(r["id_l"], r["id_r"]) for r in
           spatial.poi_conflate(ldf, rdf, res=10, max_dist_e6=2000).collect()]
    assert got == [(1, 10)]


# --- address interpolation --------------------------------------------------------


def _brute_interp(ways, step):
    out = set()
    for wid, na, nb, la, lo, lb, lob in ways:
        low, high = min(na, nb), max(na, nb)
        if high - low <= step:
            continue
        if na <= nb:
            cl = (la, lo)
            ch = (lb, lob)
        else:
            cl = (lb, lob)
            ch = (la, lo)
        span = high - low
        n = low + step
        while n < high:
            off = n - low
            lat = cl[0] + ((ch[0] - cl[0]) * off) // span
            lon = cl[1] + ((ch[1] - cl[1]) * off) // span
            out.add((wid, n, lat, lon))
            n += step
    return out


def test_interp_vs_brute(spark):
    rnd = random.Random(165)
    ways = []
    for wid in range(40):
        na = rnd.randrange(1, 50) * 2  # even anchors
        nb = na + rnd.choice([-1, 1]) * rnd.randrange(0, 30) * 2
        ways.append((
            wid, na, nb,
            rnd.randrange(-10**6, 10**6), rnd.randrange(-10**6, 10**6),
            rnd.randrange(-10**6, 10**6), rnd.randrange(-10**6, 10**6),
        ))
    df = spark.createDataFrame(
        ways,
        "way_id long, num_a long, num_b long, lat_a_e6 long, lon_a_e6 long, "
        "lat_b_e6 long, lon_b_e6 long",
    )
    got = {
        (r["way_id"], r["housenumber"], r["lat_e6"], r["lon_e6"])
        for r in spatial.address_interpolate(df, step=2).collect()
    }
    assert got == _brute_interp(ways, 2)


def test_interp_parity_and_endpoints(spark):
    ways = [(0, 2, 10, 0, 0, 8000, 8000)]
    df = spark.createDataFrame(
        ways,
        "way_id long, num_a long, num_b long, lat_a_e6 long, lon_a_e6 long, "
        "lat_b_e6 long, lon_b_e6 long",
    )
    got = sorted(
        (r["housenumber"], r["lat_e6"])
        for r in spatial.address_interpolate(df, step=2).collect()
    )
    # numbers 4, 6, 8 — endpoints 2 and 10 not re-emitted; exact thirds
    assert got == [(4, 2000), (6, 4000), (8, 6000)]
