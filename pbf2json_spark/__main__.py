"""Drop-in CLI for the reference binary: ``python -m pbf2json_spark
-tags="amenity~toilets" file.osm.pbf`` emits the same JSON-lines stream
the Go binary writes to stdout (pbf2json.go:167-184 flag surface,
printJson :552-555).

Flag parity (same names, same defaults, same semantics):

  -tags      the tag DSL — ','=OR, '§' or '+'=AND, '~'=values, '#'=regex
             (dsl.parse mirrors pbf2json.go:187-218 including its quirks)
  -names     comma list of name keys feeding the street-merge dictionary
             (default "name", pbf2json.go:171)
  -highways  comma list of highway values (default "" = off — dead code
             in the reference, honored here when set; enrich docstring)
  -leveldb   ACCEPTED AND IGNORED: the reference needs an on-disk KV
             store to denormalize way refs; the Spark engine replaces
             point lookups with distributed hash joins, so there is
             nothing to spill. Kept so existing invocations run unchanged.
  -batch     ACCEPTED AND IGNORED: LevelDB write batching, same reason.

Spark-side additions (no reference counterpart):

  -master    Spark master (default local[*])
  -out       output DIRECTORY for a distributed JSON write — the 100-TB
             path (stdout, the default, streams through the driver like
             the reference's single-consumer pipe and is bounded by it)
  -mode      full (default: engine output with bbox/centroid/
             _centroidType/entrances) or upstream (the golden-fixture
             shape: 6-dp string centroids + denormalized nodes array)

The per-record ``timestamp`` field is the Go zero value the reference
prints for every entity ("0001-01-01T00:00:00Z", visible in its README
examples) — emitted for byte-compatible downstream parsers.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from pbf2json_spark import parity
from pbf2json_spark.engine import Engine
from pbf2json_spark.session import get_spark

_GO_ZERO_TS = "0001-01-01T00:00:00Z"


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m pbf2json_spark",
        description="pbf2json, Spark-native: tag-filter + denormalize an "
        ".osm.pbf to JSON lines",
    )
    p.add_argument("-tags", required=True, help="tag DSL (reference syntax)")
    p.add_argument("-names", default="name")
    p.add_argument("-highways", default="")
    p.add_argument("-leveldb", default="/tmp",
                   help="ignored (no KV store: joins replace lookups)")
    p.add_argument("-batch", type=int, default=50000, help="ignored")
    p.add_argument("-master", default=None)
    p.add_argument("-out", default=None,
                   help="output directory for distributed JSON write "
                   "(default: stream JSON lines to stdout)")
    p.add_argument("-mode", choices=("full", "upstream"), default="full")
    p.add_argument("path", help=".osm.pbf file")
    return p


def _json_lines(df, out: str | None) -> int:
    """Emit df as JSON lines: distributed write when `out` is given, else
    stream through the driver (toLocalIterator — one partition in flight,
    never a full collect)."""
    if out:
        df.write.mode("overwrite").json(out)
        return -1
    n = 0
    for line in df.toJSON().toLocalIterator():
        sys.stdout.write(line)
        sys.stdout.write("\n")
        n += 1
    return n


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    spark = get_spark("pbf2json-spark-cli", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    names = tuple(s for s in args.names.split(",") if s)
    highways = tuple(s for s in args.highways.split(",") if s) or None

    if args.mode == "upstream":
        from pbf2json_spark import pbf

        nodes, ways, _ = pbf.read_pbf(spark, args.path)
        n_out, w_out = parity.upstream_query(nodes, ways, args.tags)
        out = n_out.unionByName(
            w_out, allowMissingColumns=True
        ).withColumn("timestamp", F.lit(_GO_ZERO_TS))
    else:
        eng = Engine.from_pbf(
            spark, args.path, names=names, highways=highways
        )
        out = eng.query(args.tags).combined().withColumn(
            "timestamp", F.lit(_GO_ZERO_TS)
        )
    _json_lines(out, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
