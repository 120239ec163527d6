"""Wave-24 operators: chi-square categorical divergence and Benford
first-digit anomaly — vs brute-force references."""

from __future__ import annotations

import random
import re
from collections import Counter

from pbf2json_spark import stats, textops


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


# --- chi2_divergence ---------------------------------------------------------


def _brute_chi2(rows):
    gc = Counter(c for _, c in rows)
    gg = len(rows)
    out = {}
    for grp in {g for g, _ in rows}:
        mine = [c for g, c in rows if g == grp]
        n = len(mine)
        oc = Counter(mine)
        chi = sum(
            _tdiv((oc.get(cat, 0) * gg - n * g) ** 2 * 1_000_000,
                  n * g * gg)
            for cat, g in gc.items()
        )
        out[grp] = (n, len(gc), chi)
    return out


def test_chi2_divergence_vs_brute(spark):
    rng = random.Random(241)
    rows = []
    for _ in range(300):
        rows.append(("bulk", rng.choice("abcde")))
    for _ in range(60):
        rows.append(("skew", rng.choice("aa" * 9 + "b")))  # a-heavy
    for _ in range(40):
        rows.append(("match", rng.choice("abcde")))
    df = spark.createDataFrame(rows, "src string, cat string")
    got = {r["src"]: (r["n"], r["n_cats"], r["chi2_e6"])
           for r in stats.chi2_divergence(df, ["src"], "cat").collect()}
    assert got == _brute_chi2(rows)
    # the skewed group must out-diverge the matching one
    assert got["skew"][2] > got["match"][2]


def test_chi2_missing_category_counts(spark):
    # a group that never shows category 'b' still pays for its absence
    rows = [("g1", "a")] * 50 + [("g1", "b")] * 50 + [("g2", "a")] * 50
    df = spark.createDataFrame(rows, "src string, cat string")
    got = {r["src"]: r for r in
           stats.chi2_divergence(df, ["src"], "cat").collect()}
    assert got["g2"]["n_cats"] == 2          # global grid, not own cats
    assert got["g2"]["chi2_e6"] > got["g1"]["chi2_e6"] == 0 or \
        got["g2"]["chi2_e6"] > 0


# --- benford_profile ---------------------------------------------------------


def _brute_benford(docs):
    out = {}
    per = {}
    for g, text in docs:
        for tok in re.findall(r"[1-9][0-9]*", text):
            per.setdefault(g, []).append(tok[0])
    for g, digs in per.items():
        n = len(digs)
        oc = Counter(digs)
        chi = sum(
            _tdiv((oc.get(str(d + 1), 0) * 1_000_000 - n * p) ** 2
                  * 1_000_000, n * p * 1_000_000)
            for d, p in enumerate(textops.BENFORD_E6)
        )
        out[g] = (n, chi)
    return out


def test_benford_vs_brute(spark):
    rng = random.Random(242)
    docs = []
    # organic-ish: log-uniform magnitudes → near-Benford digits
    for i in range(40):
        nums = [str(int(10 ** rng.uniform(0, 6))) for _ in range(30)]
        docs.append(("organic", "x ".join(nums) + " end0123 no00"))
    # fabricated: uniform 5xx values → digit 5 every time
    for i in range(40):
        nums = [str(rng.randrange(500, 600)) for _ in range(30)]
        docs.append(("template", " ".join(nums)))
    df = spark.createDataFrame(docs, "src string, text string")
    got = {r["src"]: (r["n_numbers"], r["chi2_e6"])
           for r in textops.benford_profile(df, ["src"]).collect()}
    assert got == _brute_benford(docs)
    assert got["template"][1] > got["organic"][1]
    assert got["template"][1] > 15_500_000   # χ²₈ p<0.05 by miles


def test_benford_no_numbers_group_absent(spark):
    docs = [("words", "no digits here"), ("nums", "a 123 b 45")]
    df = spark.createDataFrame(docs, "src string, text string")
    got = {r["src"]: r["n_numbers"]
           for r in textops.benford_profile(df, ["src"]).collect()}
    assert got == {"nums": 2}                # zero-number group is absent
