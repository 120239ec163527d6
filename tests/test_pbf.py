"""OSM-PBF codec round-trips: encode → blob framing → distributed decode.

The reference's golden PBF fixture is absent from disk
(.MISSING_LARGE_BLOBS), so synthetic round-trip is the executable parity
evidence for the wire format (pbf2json.go:236-244 createDecoder): every
entity, tag, ref order, member order, and coordinate written by the
encoder must come back bit-equal through the Spark reader.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pbf2json_spark import pbf
from pbf2json_spark.engine import Engine


def _fixture(n_nodes=50, n_ways=12, n_rels=4):
    nodes = [
        (
            i + 1,
            round(60.0 + i * 0.001, 7),
            round(24.0 + i * 0.002, 7),
            {"name": f"node {i}", "k%d" % (i % 3): "v"} if i % 2 == 0 else {},
        )
        for i in range(n_nodes)
    ]
    ways = [
        (
            1000 + w,
            {"highway": "residential", "name": f"way {w}"},
            [1 + (w * 3 + j) % n_nodes for j in range(4)],
        )
        for w in range(n_ways)
    ]
    rels = [
        (
            5000 + r,
            {"type": "multipolygon"},
            [
                (1000 + r, "way", "outer"),
                (1 + r, "node", ""),
                (5000 + ((r + 1) % n_rels), "relation", "sub"),
            ],
        )
        for r in range(n_rels)
    ]
    return nodes, ways, rels


def test_varint_zigzag_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**35, 2**63 - 1]:
        got, pos = pbf._read_varint(pbf._emit_varint(v), 0)
        assert got == v and pos == len(pbf._emit_varint(v))
    for v in [0, -1, 1, -2**31, 2**31, -(2**62), 2**62]:
        assert pbf._zigzag_decode(pbf._zigzag_encode(v)) == v


def test_pbf_roundtrip_entities(spark, tmp_path):
    nodes, ways, rels = _fixture()
    path = str(tmp_path / "t.osm.pbf")
    # tiny blobs force the multi-blob + delta-reset paths
    n_blobs = pbf.write_pbf(path, nodes, ways, rels, entities_per_blob=7)
    assert n_blobs >= 10

    idx = pbf.blob_index(path)
    assert idx[0][0] == "OSMHeader"
    assert sum(1 for t, _, _ in idx if t == "OSMData") == n_blobs

    ndf, wdf, rdf = pbf.read_pbf(spark, path, blobs_per_task=2)
    got_nodes = {
        r["id"]: (r["lat"], r["lon"], dict(r["tags"])) for r in ndf.collect()
    }
    assert len(got_nodes) == len(nodes)
    for nid, lat, lon, tags in nodes:
        glat, glon, gtags = got_nodes[nid]
        # coords survive at the format's 100-nanodegree granularity
        assert math.isclose(glat, lat, abs_tol=1e-7)
        assert math.isclose(glon, lon, abs_tol=1e-7)
        assert gtags == tags

    got_ways = {r["id"]: (dict(r["tags"]), list(r["refs"])) for r in wdf.collect()}
    assert got_ways == {wid: (tags, refs) for wid, tags, refs in ways}

    got_rels = {
        r["id"]: (
            dict(r["tags"]),
            [(m["ref"], m["mtype"], m["role"]) for m in r["members"]],
        )
        for r in rdf.collect()
    }
    assert got_rels == {rid: (tags, members) for rid, tags, members in rels}


def test_pbf_negative_int64_ids(spark, tmp_path):
    """Proto int64 way/relation ids are two's-complement on the wire:
    negative ids (used by some editors for un-uploaded entities) round-trip
    instead of hanging the varint encoder."""
    import pytest

    with pytest.raises(ValueError):
        pbf._emit_varint(-1)
    path = str(tmp_path / "n.osm.pbf")
    pbf.write_pbf(
        path,
        [(-3, 1.0, 2.0, {})],
        [(-5, {"a": "b"}, [-3])],
        [(-7, {}, [(-5, "way", "r")])],
    )
    ndf, wdf, rdf = pbf.read_pbf(spark, path)
    assert [r["id"] for r in ndf.collect()] == [-3]
    w = wdf.collect()[0]
    assert w["id"] == -5 and list(w["refs"]) == [-3]
    r = rdf.collect()[0]
    assert r["id"] == -7 and r["members"][0]["ref"] == -5


def test_pbf_nondefault_granularity(spark, tmp_path):
    nodes = [(7, 12.3456789, -45.6543211, {"a": "b"})]
    path = str(tmp_path / "g.osm.pbf")
    pbf.write_pbf(path, nodes, [], granularity=1000)
    ndf, _, _ = pbf.read_pbf(spark, path)
    r = ndf.collect()[0]
    # granularity 1000 = 1e-6 degrees of precision
    assert math.isclose(r["lat"], 12.3456789, abs_tol=1e-6)
    assert math.isclose(r["lon"], -45.6543211, abs_tol=1e-6)


def test_engine_from_pbf_end_to_end(spark, tmp_path):
    """The last reference-API gap: point the engine at a .osm.pbf and run a
    tag-DSL query — same lifecycle the binary runs from the CLI."""
    nodes = [
        (1, 60.0, 24.0, {"amenity": "cafe", "name": "A"}),
        (2, 60.001, 24.001, {}),
        (3, 60.002, 24.002, {}),
        (4, 61.0, 25.0, {"shop": "bakery"}),
    ]
    ways = [(10, {"highway": "residential", "name": "Main"}, [1, 2, 3])]
    path = str(tmp_path / "e.osm.pbf")
    pbf.write_pbf(path, nodes, ways, [(20, {"type": "route"}, [(10, "way", "")])])

    eng = Engine.from_pbf(spark, path, persist=False)
    res = eng.query("amenity~cafe", with_dictionary=False, with_entrances=False)
    got = res.nodes.collect()
    assert [r["id"] for r in got] == [1]
    assert got[0]["tags"]["name"] == "A"

    res2 = eng.query("name~Main", with_dictionary=False, with_entrances=False)
    w = res2.ways.collect()
    assert [r["id"] for r in w] == [10]
    assert w[0]["centroid"]["lat"] is not None
    # the highway key itself is xway-suppressed (pbf2json.go:498-534): a way
    # interesting ONLY for its highway tag is dropped from the output
    res3 = eng.query("highway", with_dictionary=False, with_entrances=False)
    assert res3.ways.count() == 0


def test_varints_np_matches_scalar():
    """The vectorized packed-varint decoder is bit-equal to the byte loop
    across the full width range, including 10-byte (64-bit) varints and
    zigzag-signed extremes."""
    import random

    import numpy as np

    rnd = random.Random(7)
    vals = [rnd.randrange(0, 2 ** b) for b in (1, 7, 8, 14, 21, 35, 53, 63, 64)
            for _ in range(200)]
    buf = b"".join(pbf._emit_varint(v) for v in vals)
    got = pbf._varints_np(buf)
    want = pbf._packed_varints([(pbf._WT_LEN, buf)])
    assert [int(x) for x in got] == [v & (2 ** 64 - 1) for v in want]

    svals = [rnd.randrange(-2 ** 62, 2 ** 62) for _ in range(2000)]
    svals += [0, -1, 1, -2 ** 63, 2 ** 63 - 1]
    sbuf = b"".join(pbf._emit_varint(pbf._zigzag_encode(v)) for v in svals)
    gs = pbf._packed_varints_np([(pbf._WT_LEN, sbuf)], signed=True)
    ws = pbf._packed_varints([(pbf._WT_LEN, sbuf)], signed=True)
    assert gs.dtype == np.int64 and [int(x) for x in gs] == ws
    # empty + repeated-scalar encodings
    assert pbf._varints_np(b"").size == 0
    rep = pbf._packed_varints_np([(pbf._WT_VARINT, 5), (pbf._WT_VARINT, 7)])
    assert [int(x) for x in rep] == [5, 7]


def test_decode_block_columns_matches_tuples():
    """Columnar decode and the legacy tuple view agree (same decoder, two
    shapes), including untagged-majority DenseNodes and tag terminators."""
    nodes = [
        (i + 1, 50.0 + i * 0.01, 7.0 + i * 0.02,
         {"k": f"v{i}", "x": "y"} if i % 7 == 0 else {})
        for i in range(500)
    ]
    ways = [(9000 + w, {"highway": "path"}, [1 + w, 2 + w, 3 + w])
            for w in range(40)]
    path = "/tmp/pbf_cols_test.osm.pbf"
    pbf.write_pbf(path, nodes, ways, [])
    for btype, off, ln in pbf.blob_index(path):
        if btype != "OSMData":
            continue
        with open(path, "rb") as f:
            f.seek(off)
            payload = pbf._blob_payload(f.read(ln))
        cols = pbf.decode_block_columns(payload)
        rows = pbf.decode_primitive_block(payload)
        assert len(rows["nodes"]) == cols["node_id"].size
        for (nid, lat, lon, tk, tv), i in zip(
            rows["nodes"], range(cols["node_id"].size)
        ):
            assert nid == int(cols["node_id"][i])
            assert lat == float(cols["node_lat"][i])
            assert tk == cols["node_tk"][i] and tv == cols["node_tv"][i]
        assert rows["ways"] == cols["ways"]
