"""Wave-55: American Soundex phonetic keys (classic vectors, cross-engine
DuckDB equality, blocking recall for typo'd names) and Borůvka minimum
spanning forest (vs Kruskal brute force incl. tie-heavy weights,
disconnected forests; single-linkage composition law)."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from pbf2json_spark import graph, textops


# --- soundex ----------------------------------------------------------------------


def test_soundex_classic_vectors(spark):
    cases = {
        "Robert": "R163", "Rupert": "R163", "Smith": "S530", "Smyth": "S530",
        "Pfister": "P236", "Tymczak": "T522", "Jackson": "J250",
        "Washington": "W252", "Lee": "L000", "Gutierrez": "G362",
        "O'Brien": "O165", "": None, "123": None,
    }
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(cases)], "id long, name string"
    )
    got = {
        r["name"]: r["sdx"]
        for r in df.select(
            "name", textops.soundex_key(F.col("name")).alias("sdx")
        ).collect()
    }
    for name, want in cases.items():
        assert got[name] == want, (name, got[name], want)


def test_soundex_matches_duckdb_mirror(spark):
    rnd = random.Random(55)
    names = [
        "".join(rnd.choice("abcdefghijklmnopqrstuvwxyz '")
                for _ in range(rnd.randrange(0, 15)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, n) for i, n in enumerate(names)],
                               "id long, name string")
    got = {
        r["id"]: r["sdx"]
        for r in df.select(
            "id", textops.soundex_key(F.col("name")).alias("sdx")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, name VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(names)))
    sql = f"SELECT id, {textops.soundex_sql('name')} AS sdx FROM t"
    want = {i: s for i, s in con.execute(sql).fetchall()}
    assert got == want


def test_soundex_blocks_typos_together(spark):
    pairs = [("meyer", "meier"), ("schmidt", "schmitt"), ("hansen", "hanson")]
    rows = [(i, n) for i, (a, b) in enumerate(pairs) for n in (a, b)]
    df = spark.createDataFrame(rows, "pid long, name string")
    out = df.select("pid", textops.soundex_key(F.col("name")).alias("s")).collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r["pid"], set()).add(r["s"])
    assert all(len(v) == 1 for v in by_pid.values())


# --- Borůvka MST ------------------------------------------------------------------


def _kruskal(edges):
    """edges: [(a,b,w)] canonical — returns the unique min forest under
    the (w, a, b) total order."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    best = {}
    for a, b, w in edges:
        k = (min(a, b), max(a, b))
        if k[0] != k[1] and (k not in best or w < best[k]):
            best[k] = w
    mst = []
    for (a, b), w in sorted(((k, w) for k, w in best.items()),
                            key=lambda t: (t[1], t[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            mst.append((a, b, w))
    return sorted(mst)


def test_boruvka_vs_kruskal(spark):
    rnd = random.Random(155)
    edges = []
    for _ in range(400):
        a, b = rnd.randrange(80), rnd.randrange(80)
        edges.append((a, b, rnd.randrange(1, 50)))  # heavy weight ties
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = sorted(
        (r["a"], r["b"], r["w"]) for r in graph.boruvka_mst(df).collect()
    )
    want = _kruskal(edges)
    assert got == want


def test_boruvka_disconnected_forest(spark):
    # two components + an isolated pair: forest has n - n_comp edges
    edges = [(0, 1, 5), (1, 2, 3), (0, 2, 9), (10, 11, 1), (11, 12, 2),
             (20, 21, 7)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = sorted((r["a"], r["b"], r["w"]) for r in graph.boruvka_mst(df).collect())
    assert got == _kruskal(edges)
    assert len(got) == 8 - 3  # 8 nodes, 3 components


def test_single_linkage_composition(spark):
    # cutting MST edges > threshold yields single-linkage clusters
    rnd = random.Random(255)
    pts = {}
    for c, base in enumerate((0, 1000, 5000)):
        for i in range(8):
            pts[c * 8 + i] = base + rnd.randrange(50)
    ids = sorted(pts)
    edges = [
        (i, j, abs(pts[i] - pts[j])) for i in ids for j in ids if i < j
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    mst = graph.boruvka_mst(df)
    kept = mst.filter(F.col("w") <= 200).select("a", "b")
    comps = graph.connected_components(kept)
    labels = {r[0]: r[1] for r in comps.collect()}
    groups = {}
    for node, lab in labels.items():
        groups.setdefault(lab, set()).add(node)
    assert sorted(sorted(g) for g in groups.values()) == [
        list(range(0, 8)), list(range(8, 16)), list(range(16, 24))
    ]
