"""Deterministic synthetic .osm.pbf fixture at bench scale (VERDICT r3
task 7): the reference's e2e corpus (test/vancouver_canada.osm.pbf,
test/pretest.sh:7-16) is absent from the sandbox, so the realism gap in
the ingest path is closed with a generated planet-slice large enough to
exercise the distributed decode (many OSMData blobs → many tasks), cached
on disk keyed by its entity counts.

Entities are pure integer-formula functions of the id (same _lat/_lon
family as the parquet testdata), so the SAME entity set can be rebuilt
as in-memory DataFrames and compared 1:1 against the file-decode path —
count parity between `Engine.from_pbf` and the frame-built engine is the
e2e assertion, not just a round-trip of the codec.

Usage: python tools/make_pbf.py [n_nodes] [n_ways] [out_path]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbf2json_spark import pbf  # noqa: E402

AMENITIES = [
    "toilets", "cafe", "bench", "parking", "school", "bank", "fuel",
]
HIGHWAYS = ["residential", "primary", "secondary", "footway", "service"]


def node_entities(n_nodes: int):
    """(id, lat, lon, tags) — ~1 in 13 nodes tagged (amenity + name),
    coordinates on the shared integer-formula grid (6 decimals, within
    PBF's default 100-nanodegree granularity so the round-trip is exact)."""
    out = []
    for i in range(1, n_nodes + 1):
        lat = (i * 911 % 17000) / 100.0 - 85.0
        lon = (i * 2347 % 35000) / 100.0 - 175.0
        if i % 13 == 0:
            # hex suffix = incompressible per-entity entropy, so the
            # on-disk bytes-per-entity is planet-like instead of the
            # near-zero a pure-formula name deflates to
            h = hashlib.md5(str(i).encode()).hexdigest()
            tags = {
                "amenity": AMENITIES[i % len(AMENITIES)],
                "name": f"poi {i} {h[:12]}",
                "addr:street": f"{h[12:20]} street",
                "addr:housenumber": str(i % 300),
            }
        else:
            tags = {}
        out.append((i, lat, lon, tags))
    return out


def way_entities(n_nodes: int, n_ways: int):
    """(id, tags, refs) — 5-node chains over the node id space; every way
    tagged highway+name, ~1 in 29 additionally amenity=toilets (so the
    flagship tag query hits ways, not just nodes)."""
    out = []
    for w in range(1, n_ways + 1):
        start = (w * 37) % max(n_nodes - 6, 1) + 1
        h = hashlib.md5(str(-w).encode()).hexdigest()
        tags = {
            "highway": HIGHWAYS[w % len(HIGHWAYS)],
            "name": f"way {w} {h[:12]}",
        }
        if w % 29 == 0:
            tags["amenity"] = "toilets"
        out.append((10_000_000 + w, tags, [start + j for j in range(5)]))
    return out


def relation_entities(n_ways: int, n_rels: int):
    out = []
    for r in range(1, n_rels + 1):
        out.append(
            (
                20_000_000 + r,
                {"type": "multipolygon", "name": f"rel {r}"},
                [
                    (10_000_000 + (r * 3) % max(n_rels, 1) + 1, "way", "outer"),
                    (10_000_000 + (r * 5) % max(n_ways, 1) + 1, "way", "inner"),
                ],
            )
        )
    return out


def ensure_fixture(n_nodes: int, n_ways: int, n_rels: int, path: str) -> str:
    """Write the fixture once; later calls reuse the cached file (the
    fixture is a pure function of the counts, so the path encodes them)."""
    if os.path.exists(path) and os.path.getsize(path) > 0:
        return path
    nodes = node_entities(n_nodes)
    ways = way_entities(n_nodes, n_ways)
    rels = relation_entities(n_ways, n_rels)
    tmp = path + ".tmp"
    pbf.write_pbf(tmp, nodes, ways, rels)
    os.replace(tmp, path)
    return path


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_ways = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"/tmp/spark_graft_fixture_{n_nodes}_{n_ways}.osm.pbf"
    )
    import time

    t0 = time.time()
    ensure_fixture(n_nodes, n_ways, n_rels=max(n_ways // 100, 1), path=out)
    print(
        f"{out}: {os.path.getsize(out) / 1e6:.1f} MB "
        f"({n_nodes:,} nodes, {n_ways:,} ways) in {time.time() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
