"""Wave-19 operators: per-group OLS trend, degree assortativity,
gravity-model OD flows, Heaps vocabulary growth."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

from pbf2json_spark import corpus, graph, trajectory
from pbf2json_spark.stats import linear_trend


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — Spark div / DuckDB //."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


# --- linear_trend --------------------------------------------------------------


def _brute_trend(pts):
    by_g = defaultdict(list)
    for g, x, y in pts:
        by_g[g].append((x, y))
    out = {}
    for g, xy in by_g.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        sxx = sum(x * x for x, _ in xy)
        syy = sum(y * y for _, y in xy)
        cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        slope = _tdiv(cov * 1_000_000, vx) if vx else 0
        intercept = _tdiv(sy * 1_000_000 - slope * sx, n)
        sr2 = (
            (-1 if cov < 0 else 1) * _tdiv(cov * cov * 1_000_000, vx * vy)
            if vx and vy else 0
        )
        out[g] = (n, slope, intercept, sr2)
    return out


def test_linear_trend_perfect_line(spark):
    pts = [("a", x, 3 * x + 7) for x in range(10)]
    df = spark.createDataFrame(pts, "g string, x long, y long")
    r = linear_trend(df, ["g"], "x", "y").collect()[0]
    assert (r["slope_e6"], r["intercept_e6"], r["sr2_e6"]) == (
        3_000_000, 7_000_000, 1_000_000)


def test_linear_trend_constant_and_negative(spark):
    pts = ([("c", x, 5) for x in range(6)]          # constant y -> vy=0
           + [("d", 2, y) for y in range(6)]        # constant x -> vx=0
           + [("n", x, 100 - 4 * x) for x in range(8)])
    df = spark.createDataFrame(pts, "g string, x long, y long")
    got = {r["g"]: (r["n"], r["slope_e6"], r["intercept_e6"], r["sr2_e6"])
           for r in linear_trend(df, ["g"], "x", "y").collect()}
    want = _brute_trend(pts)
    assert got == want
    assert got["c"][1] == 0 and got["c"][3] == 0
    assert got["d"][1] == 0 and got["d"][3] == 0
    assert got["n"][1] == -4_000_000 and got["n"][3] == -1_000_000


def test_linear_trend_vs_brute_random(spark):
    rng = random.Random(191)
    pts = [(f"g{rng.randrange(5)}", rng.randrange(50), rng.randrange(1000))
           for _ in range(400)]
    df = spark.createDataFrame(pts, "g string, x long, y long")
    got = {r["g"]: (r["n"], r["slope_e6"], r["intercept_e6"], r["sr2_e6"])
           for r in linear_trend(df, ["g"], "x", "y").collect()}
    assert got == _brute_trend(pts)


# --- assortativity -------------------------------------------------------------


def _brute_assort(edges):
    simple = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = Counter()
    for a, b in simple:
        deg[a] += 1
        deg[b] += 1
    m = len(simple)
    sum_deg = sum(deg[a] + deg[b] for a, b in simple)
    sjj = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in simple)
    sjk = sum(2 * deg[a] * deg[b] for a, b in simple)
    cov = 2 * m * sjk - sum_deg * sum_deg
    var = 2 * m * sjj - sum_deg * sum_deg
    r = _tdiv(cov * 1_000_000, var) if var else 0
    return m, sum_deg, sjj, sjk, r


def test_assortativity_star_is_maximally_disassortative(spark):
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = graph.assortativity(df).collect()[0]
    m, sd, sjj, sjk, want_r = _brute_assort(edges)
    assert (r["m_edges"], r["sum_deg"], r["sum_deg_sq"], r["sum_jk2"],
            r["r_e6"]) == (m, sd, sjj, sjk, want_r)
    assert r["r_e6"] == -1_000_000      # hub-leaf only: r = -1 exactly


def test_assortativity_regular_graph_guard(spark):
    # 6-cycle: every degree 2 -> var = 0 -> guarded r_e6 = 0
    edges = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert graph.assortativity(df).collect()[0]["r_e6"] == 0


def test_assortativity_vs_brute_random(spark):
    rng = random.Random(193)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    df = spark.createDataFrame(edges, "src long, dst long")
    r = graph.assortativity(df).collect()[0]
    m, sd, sjj, sjk, want_r = _brute_assort(edges)
    assert (r["m_edges"], r["sum_deg"], r["sum_deg_sq"], r["sum_jk2"],
            r["r_e6"]) == (m, sd, sjj, sjk, want_r)


# --- gravity_flows -------------------------------------------------------------


def _brute_gravity(flows):
    out_m, in_m = Counter(), Counter()
    t = 0
    for fx, fy, tx, ty, n in flows:
        out_m[(fx, fy)] += n
        in_m[(tx, ty)] += n
        t += n
    res = {}
    for fx, fy, tx, ty, n in flows:
        d = max(abs(fx - tx), abs(fy - ty))
        o, i = out_m[(fx, fy)], in_m[(tx, ty)]
        res[(fx, fy, tx, ty)] = (
            n, d, o, i,
            _tdiv(o * i * 1_000_000, t * (1 + d * d)),
            _tdiv(n * t * (1 + d * d) * 1_000_000, o * i),
        )
    return res


def test_gravity_flows_vs_brute(spark):
    rng = random.Random(197)
    raw = Counter()
    for _ in range(300):
        raw[(rng.randrange(5), rng.randrange(5),
             rng.randrange(5), rng.randrange(5))] += 1
    flows = [(fx, fy, tx, ty, n) for (fx, fy, tx, ty), n in raw.items()]
    df = spark.createDataFrame(
        flows, "from_x long, from_y long, to_x long, to_y long, n_trips long")
    got = {(r["from_x"], r["from_y"], r["to_x"], r["to_y"]):
           (r["n"], r["d_cheb"], r["outflow"], r["inflow"],
            r["expected_e6"], r["lift_e6"])
           for r in trajectory.gravity_flows(df).collect()}
    assert got == _brute_gravity(flows)


def test_gravity_flows_uniform_all_lift_equal(spark):
    # complete uniform 2x2 OD matrix at distance 0/1: lift depends only on d
    flows = [(fx, 0, tx, 0, 4) for fx in range(2) for tx in range(2)]
    df = spark.createDataFrame(
        flows, "from_x long, from_y long, to_x long, to_y long, n_trips long")
    rows = trajectory.gravity_flows(df).collect()
    by_d = defaultdict(set)
    for r in rows:
        by_d[r["d_cheb"]].add(r["lift_e6"])
    assert all(len(v) == 1 for v in by_d.values())
    # damped pairs (d=1) carry MORE than gravity predicts at uniform flow
    assert min(by_d[1]) > min(by_d[0])


# --- vocab_growth --------------------------------------------------------------


def _brute_vocab(docs, bucket):
    seen = set()
    per = {}
    for did, text in sorted(docs):
        b = did // bucket
        ws = text.split()
        nd, nt, nv = per.get(b, (0, 0, 0))
        new = 0
        for w in ws:
            if w not in seen:
                seen.add(w)
                new += 1
        per[b] = (nd + 1, nt + len(ws), nv + new)
    out, ct, cv = {}, 0, 0
    for b in sorted(per):
        nd, nt, nv = per[b]
        ct += nt
        cv += nv
        out[b] = (nd, nt, nv, ct, cv)
    return out


def test_vocab_growth_vs_brute(spark):
    rng = random.Random(199)
    vocab = [f"w{i}" for i in range(40)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(1, 12))))
            for i in range(60)]
    docs[7] = (7, "   ")        # empty doc: zero tokens, still counted
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["bucket"]: (r["n_docs"], r["n_tokens"], r["new_types"],
                         r["cum_tokens"], r["cum_types"])
           for r in corpus.vocab_growth(df, 10).collect()}
    assert got == _brute_vocab(docs, 10)


def test_vocab_growth_saturates(spark):
    # same 5 words repeated forever: new_types only in the first bucket
    docs = [(i, "a b c d e") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["bucket"]: r for r in corpus.vocab_growth(df, 8).collect()}
    assert rows[0]["new_types"] == 5
    assert all(rows[b]["new_types"] == 0 for b in rows if b > 0)
    assert rows[max(rows)]["cum_types"] == 5
    assert rows[max(rows)]["cum_tokens"] == 200
