"""CLI drop-in surface (python -m pbf2json_spark): reference flag names,
JSON-lines stdout with the Go zero timestamp, distributed -out mode, and
the upstream parity shape (pbf2json.go:167-184, 552-555)."""

from __future__ import annotations

import glob
import json

from pbf2json_spark import __main__ as cli
from pbf2json_spark import pbf


def _fixture(tmp_path):
    nodes = [
        (1, 60.0, 24.0, {"amenity": "cafe", "name": "A"}),
        (2, 60.001, 24.001, {}),
        (3, 60.002, 24.002, {}),
        (4, 61.0, 25.0, {"shop": "bakery", "name": "B"}),
    ]
    ways = [(10, {"highway": "residential", "name": "Main"}, [1, 2, 3])]
    path = str(tmp_path / "cli.osm.pbf")
    pbf.write_pbf(path, nodes, ways, [])
    return path


def test_cli_stdout_full_mode(spark, tmp_path, capsys):
    path = _fixture(tmp_path)
    rc = cli.main(["-tags", "amenity~cafe", path])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    recs = [json.loads(ln) for ln in lines]
    # the matched node, plus the named-highway merged street the reference
    # also prints unconditionally (pbf2json.go:537-539)
    by_type = {}
    for r in recs:
        by_type.setdefault(r["type"], []).append(r)
        assert r["timestamp"] == "0001-01-01T00:00:00Z"
    assert [r["id"] for r in by_type["node"]] == [1]
    assert by_type["node"][0]["tags"]["name"] == "A"


def test_cli_out_dir_and_upstream_mode(spark, tmp_path):
    path = _fixture(tmp_path)
    out = str(tmp_path / "out_json")
    rc = cli.main(["-tags", "name", "-mode", "upstream", "-out", out, path])
    assert rc == 0
    recs = []
    for f in glob.glob(out + "/part-*"):
        with open(f) as fh:
            recs += [json.loads(ln) for ln in fh if ln.strip()]
    ids = {r["id"] for r in recs}
    assert ids == {1, 4, 10}
    way = next(r for r in recs if r["id"] == 10)
    # upstream shape: 6-dp string centroid + denormalized nodes array
    assert way["centroid"]["lat"] == "60.001000"
    assert [p["lat"] for p in way["nodes"]] == [
        "60.000000", "60.001000", "60.002000"
    ]


def test_cli_ignored_reference_flags_accepted(spark, tmp_path, capsys):
    path = _fixture(tmp_path)
    rc = cli.main([
        "-tags", "shop", "-leveldb", "/tmp/nowhere", "-batch", "1000", path
    ])
    assert rc == 0
    recs = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
            if ln.strip()]
    assert any(r["id"] == 4 and r["type"] == "node" for r in recs)
