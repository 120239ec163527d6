"""Wave-36: polygon validity QA (vs brute segment-pair checks over hand
shapes) and the portable Bloom filter (no-false-negative law, fp rate,
monoid merge)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pbf2json_spark import geo, sketch


# --- ring validity -----------------------------------------------------------


def _ring(pts):
    return [{"lat": float(a), "lon": float(b)} for a, b in pts]


def test_ring_validity_shapes(spark):
    shapes = {
        # ccw square (x=lon, y=lat): (0,0)->(0,4)->(3,4)->(3,0)->close
        1: _ring([(0, 0), (0, 4), (3, 4), (3, 0), (0, 0)]),
        # same square reversed = cw
        2: _ring([(0, 0), (3, 0), (3, 4), (0, 4), (0, 0)]),
        # bowtie: one proper crossing, symmetric shoelace cancels
        3: _ring([(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)]),
        # open polyline
        4: _ring([(0, 0), (3, 0), (0, 4)]),
        # zero-area spike out and back
        5: _ring([(0, 0), (2, 2), (0, 0)]),
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in shapes.items()],
        "polygon_id long, ring array<struct<lat:double,lon:double>>",
    )
    got = {r["polygon_id"]: r.asDict() for r in geo.ring_validity(df).collect()}
    assert got[1]["closed"] and got[1]["orientation"] == "ccw"
    assert got[1]["n_crossings"] == 0 and got[1]["is_valid"]
    assert got[2]["orientation"] == "cw" and got[2]["is_valid"]
    assert got[1]["signed2"] == -got[2]["signed2"] == 24.0
    assert got[3]["closed"] and got[3]["n_crossings"] == 1
    assert got[3]["orientation"] == "degenerate" and not got[3]["is_valid"]
    assert not got[4]["closed"] and not got[4]["is_valid"]
    assert got[5]["closed"] and got[5]["signed2"] == 0.0 and not got[5]["is_valid"]


def test_ring_validity_vs_brute_crossings(spark):
    # pseudo-random star polygons: compare crossing counts to a brute
    # python O(k^2) proper-intersection scan
    import random

    rnd = random.Random(36)

    def brute(pts):
        segs = list(zip(pts, pts[1:]))
        m = len(segs)

        def cross(o, a, b):
            return (a[1] - o[1]) * (b[0] - o[0]) - (b[1] - o[1]) * (a[0] - o[0])

        k = 0
        for i in range(m):
            for j in range(i + 2, m):
                if i == 0 and j == m - 1:
                    continue
                a, b = segs[i]
                c, d = segs[j]
                if (
                    cross(a, b, c) * cross(a, b, d) < 0
                    and cross(c, d, a) * cross(c, d, b) < 0
                ):
                    k += 1
        return k

    rows, exp = [], {}
    for pid in range(12):
        pts = [(rnd.randrange(0, 9), rnd.randrange(0, 9)) for _ in range(6)]
        pts.append(pts[0])
        rows.append((pid, _ring(pts)))
        exp[pid] = brute([(p[0], p[1]) for p in pts])
    df = spark.createDataFrame(
        rows, "polygon_id long, ring array<struct<lat:double,lon:double>>"
    )
    got = {r["polygon_id"]: r["n_crossings"] for r in geo.ring_validity(df).collect()}
    assert got == exp


# --- bloom filter ------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_rate(spark):
    keys = [f"url{i}" for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    flt = sketch.bloom_build(df, "key", m_bits=8192, k=4)
    probe_in = sketch.bloom_probe(df, flt, "key", m_bits=8192, k=4)
    assert all(r["maybe_present"] for r in probe_in.collect())
    other = spark.createDataFrame([(f"other{i}",) for i in range(500)], "key string")
    fp = sketch.bloom_probe(other, flt, "key", m_bits=8192, k=4)
    n_fp = sum(1 for r in fp.collect() if r["maybe_present"])
    # (1 - e^(-4*300/8192))^4 ~ 0.04% -> 500 probes expect ~0; allow slack
    assert n_fp <= 5


def test_bloom_merge_is_union(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(100)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(100)], "key string")
    both = a.unionByName(b)
    f_union = sketch.bloom_build(both, "key", m_bits=4096, k=3)
    f_merged = (
        sketch.bloom_build(a, "key", m_bits=4096, k=3)
        .unionByName(sketch.bloom_build(b, "key", m_bits=4096, k=3))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    u = {(r["word_idx"], r["word"]) for r in f_union.collect()}
    m = {(r["word_idx"], r["word"]) for r in f_merged.collect()}
    assert u == m and u


def test_bloom_grouped(spark):
    rows = [("en", f"k{i}") for i in range(50)] + [("de", f"k{i}") for i in range(25)]
    df = spark.createDataFrame(rows, "lang string, key string")
    flt = sketch.bloom_build(df, "key", group_cols=["lang"], m_bits=2048, k=3)
    probe = spark.createDataFrame(
        [("de", "k30"), ("de", "k10"), ("en", "k30")], "lang string, key string"
    )
    got = {
        (r["lang"], r["key"]): r["maybe_present"]
        for r in sketch.bloom_probe(
            probe, flt, "key", group_cols=["lang"], m_bits=2048, k=3
        ).collect()
    }
    assert got[("de", "k10")] and got[("en", "k30")]
    assert not got[("de", "k30")]  # only in the en stratum
