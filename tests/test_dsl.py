"""Tag-DSL truth table (grammar: pbf2json.go:187-218; matching: 1002-1056)
plus a property test that the Column compiler agrees with the pure-Python
evaluator on random tag maps."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from pbf2json_spark import dsl

CASES = [
    # (dsl, tags, expected)
    ("building", {"building": "yes"}, True),
    ("building", {"shop": "bakery"}, False),
    ("building", {}, False),  # hasTags guard
    ("building,shop", {"shop": "bakery"}, True),  # OR groups
    ("building,shop", {"leisure": "park"}, False),
    # AND groups: both '§' (fork) and '+' (upstream/test grammar)
    ("addr:housenumber§addr:street", {"addr:housenumber": "1", "addr:street": "x"}, True),
    ("addr:housenumber+addr:street", {"addr:housenumber": "1", "addr:street": "x"}, True),
    ("addr:housenumber+addr:street", {"addr:housenumber": "1"}, False),
    # value set
    ("amenity~toilets", {"amenity": "toilets"}, True),
    ("amenity~toilets", {"amenity": "school"}, False),
    ("amenity~toilets;kindergarten", {"amenity": "kindergarten"}, True),
    ("amenity~toilets;kindergarten", {"amenity": "school"}, False),
    # OR of value selectors across groups
    ("amenity~toilets,amenity~kindergarten", {"amenity": "kindergarten"}, True),
    # '!' = OR of tag alternatives inside one selector
    ("highway!waterway", {"waterway": "river"}, True),
    ("highway!waterway", {"railway": "rail"}, False),
    ("highway~primary!waterway~river", {"waterway": "river"}, True),
    ("highway~primary!waterway~river", {"waterway": "stream"}, False),
    # value regex: text after the LAST '#'
    ("name~#^Ki", {"name": "Kirkkokatu"}, True),
    ("name~#^Ki", {"name": "Mannerheimintie"}, False),
    ("name~ignored#katu", {"name": "Kirkkokatu"}, True),  # substring search
    # key regex: text after the LAST '#' in the name part
    ("#^addr:", {"addr:street": "x"}, True),
    ("#^addr:", {"address": "x"}, False),
    ("#^addr:~x", {"addr:street": "x"}, True),
    ("#^addr:~y", {"addr:street": "x"}, False),
    # trim semantics: keys/values trimmed before matching
    ("building", {" building ": " yes "}, True),
    ("amenity~toilets", {"amenity": " toilets "}, True),
    # presence matches regardless of value
    ("building", {"building": ""}, True),
]


@pytest.mark.parametrize("q,tags,expected", CASES)
def test_python_eval(q, tags, expected):
    assert dsl.eval_query(dsl.parse(q), tags) is expected


def _spark_matches(spark, q, tag_maps):
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(tag_maps)], "i int, tags map<string,string>"
    )
    trimmed = dsl.trim_tags(F.col("tags"))
    pred = dsl.compile_tags_dsl(q, trimmed)
    got = df.select("i", pred.alias("m")).collect()
    return {r["i"]: bool(r["m"]) for r in got}


def test_column_compiler_truth_table(spark):
    by_query: dict[str, list[tuple[dict, bool]]] = {}
    for q, tags, expected in CASES:
        by_query.setdefault(q, []).append((tags, expected))
    for q, pairs in by_query.items():
        got = _spark_matches(spark, q, [t for t, _ in pairs])
        for i, (tags, expected) in enumerate(pairs):
            assert got[i] is expected, (q, tags)


def test_column_compiler_property_random(spark):
    rng = random.Random(42)
    keys = ["amenity", "building", "addr:street", "name", "name:fi", "shop", " pad "]
    vals = ["toilets", "yes", "x", "Kirkkokatu", "", " toilets ", "kindergarten"]
    queries = [
        "amenity~toilets;kindergarten,building",
        "addr:street+name~#^Ki",
        "#^name~#katu!shop",
        "building§amenity",
    ]
    maps = []
    for _ in range(200):
        m = {k: rng.choice(vals) for k in rng.sample(keys, rng.randint(0, len(keys)))}
        maps.append(m)
    for q in queries:
        parsed = dsl.parse(q)
        got = _spark_matches(spark, q, maps)
        for i, m in enumerate(maps):
            assert got[i] is dsl.eval_query(parsed, m), (q, m)


def test_xway_only(spark):
    # row matched only via 'highway' → suppressed; row with another reason kept
    q = "highway+name,waterway"
    parsed = dsl.parse(q)
    df = spark.createDataFrame(
        [
            (0, {"highway": "primary", "name": "X"}),  # only reason: highway
            (1, {"highway": "primary", "name": "X", "waterway": "y"}),  # also waterway
        ],
        "i int, tags map<string,string>",
    )
    got = {
        r["i"]: bool(r["x"])
        for r in df.select(
            "i", dsl.xway_only(parsed, F.col("tags"), "highway").alias("x")
        ).collect()
    }
    assert got[0] is True
    assert got[1] is False
