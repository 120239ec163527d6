"""Reconstruct OSM-style input tables from the reference's golden fixtures.

The goldens (/root/reference/test/fixtures/{colon,group,value,multivalue}.json,
produced from vancouver_canada.osm.pbf — test/end-to-end.js:48-56) carry the
full ordered geometry of every way (`nodes` array of 6-dp coordinate strings),
which is enough to re-derive a nodes table: each way position becomes a
synthetic node (fresh id, empty tags); fixture node records keep their own
ids/tags. Running our engine over these tables in parity mode must reproduce
the goldens byte-for-byte (SURVEY.md §5.3).
"""

from __future__ import annotations

import itertools
import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from pbf2json_spark.model import NODES_SCHEMA, WAYS_SCHEMA

FIXTURE_DIR = Path("/root/reference/test/fixtures")
SYNTH_NODE_BASE = 10**12  # fixture node ids are < 10^11


def load_fixture(name: str) -> dict:
    return json.loads((FIXTURE_DIR / f"{name}.json").read_text())


def tables_from_fixture(
    spark: SparkSession, fixture: dict
) -> tuple[DataFrame, DataFrame]:
    """fixture {id → record} → (nodes_df, ways_df)."""
    node_rows = []
    way_rows = []
    synth = itertools.count(SYNTH_NODE_BASE)
    for rec in fixture.values():
        if rec["type"] == "node":
            node_rows.append(
                (int(rec["id"]), float(rec["lat"]), float(rec["lon"]), rec["tags"])
            )
        elif rec["type"] == "way":
            refs = []
            for pt in rec["nodes"]:
                nid = next(synth)
                node_rows.append((nid, float(pt["lat"]), float(pt["lon"]), {}))
                refs.append(nid)
            way_rows.append((int(rec["id"]), rec["tags"], refs))
    nodes = spark.createDataFrame(node_rows, NODES_SCHEMA)
    ways = spark.createDataFrame(way_rows, WAYS_SCHEMA)
    return nodes, ways


def with_noise(
    spark: SparkSession, nodes: DataFrame, ways: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Adds rows that must NOT appear in any fixture query's output: tag
    non-matches and a way with a dangling ref (all-or-nothing drop,
    pbf2json.go:585-587)."""
    extra_nodes = spark.createDataFrame(
        [
            (9_100, 49.0, -123.0, {"tourism": "hotel"}),
            (9_101, 49.0, -123.1, {}),
            (9_102, 49.1, -123.0, {"amenity": "parking"}),
        ],
        NODES_SCHEMA,
    )
    extra_ways = spark.createDataFrame(
        [
            # non-matching tags
            (9_200, {"landuse": "forest"}, [9_100, 9_101, 9_100]),
            # matching tags but dangling ref -> must be dropped whole
            (9_201, {"amenity": "toilets", "addr:housenumber": "1", "addr:street": "s"},
             [9_100, 777_777_777_777]),
        ],
        WAYS_SCHEMA,
    )
    return nodes.unionByName(extra_nodes), ways.unionByName(extra_ways)
