"""Wave-60: Goh-Barabási burstiness (vs brute reference incl. ts ties;
periodic → B≈−1, bursty → B>0 laws) and mojibake screen (vs brute count;
live DuckDB mirror; clean text zero)."""

from __future__ import annotations

import math
import random

import duckdb

from pbf2json_spark import temporal, textops


# --- burstiness -------------------------------------------------------------------


def _brute_burst(rows):
    """rows: [(k, ts, tb)] → {k: (n, sg, sg2, b)}."""
    series = {}
    for k, ts, tb in rows:
        series.setdefault(k, []).append((ts, tb))
    out = {}
    for k, evs in series.items():
        evs.sort()
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        n = len(gaps)
        sg = sum(gaps)
        sg2 = sum(g * g for g in gaps)
        if n >= 2 and sg > 0:
            cv = math.sqrt(float(n * sg2 - sg * sg)) / float(sg)
            b = (cv - 1.0) / (cv + 1.0)
        else:
            b = None
        out[k] = (n, sg, sg2, b)
    return out


def test_burstiness_vs_brute(spark):
    rnd = random.Random(60)
    rows = []
    for i in range(200):  # periodic bot: fixed 60s gap
        rows.append(("bot", 60_000_000 * i, i))
    t = 0
    for i in range(200):  # poisson-ish organic
        t += rnd.randrange(1, 120_000_000)
        rows.append(("organic", t, i))
    t = 0
    for i in range(200):  # heavy bursts: mostly 1s, rare huge gaps
        t += 1_000_000 if i % 20 else 3_600_000_000
        rows.append(("bursty", t, i))
    rows += [("tie", 5, 1), ("tie", 5, 0), ("tie", 9, 2)]  # ts ties
    df = spark.createDataFrame(rows, "k string, ts long, tb long")
    got = {
        r["k"]: (r["n_gaps"], r["sum_gap"], int(r["sum_gap2"]), r["b"])
        for r in temporal.burstiness(df, "k", "ts", "tb").collect()
    }
    want = _brute_burst(rows)
    assert set(got) == set(want)
    for k in got:
        assert got[k][:3] == want[k][:3], k
        if want[k][3] is None:
            assert got[k][3] is None
        else:
            assert abs(got[k][3] - want[k][3]) < 1e-12
    assert got["bot"][3] < -0.95
    assert abs(got["organic"][3]) < 0.35
    assert got["bursty"][3] > 0.5


# --- mojibake ---------------------------------------------------------------------


def test_mojibake_vs_brute_and_duckdb(spark):
    texts = [
        "clean ascii text.",
        "mangled Ã© and Ã¨ twice",
        "smart â€™quotesâ€\x9d leak",
        "nbsp Â here, bom ï»¿ and repl � char",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["mojibake_hits"], r["mojibake_flag"])
        for r in textops.mojibake_screen(df).collect()
    }

    def brute(t):
        return sum(t.count(m) for m in textops.MOJIBAKE_MARKERS)

    for i, t in enumerate(texts):
        assert got[i] == (brute(t), brute(t) > 0), (i, t)
    assert got[0] == (0, False) and got[1][0] == 2

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT doc_id, {textops.mojibake_sql('text')} FROM t"
        ).fetchall()
    }
    assert {k: v[0] for k, v in got.items()} == want
