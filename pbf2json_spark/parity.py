"""Parity output mode — reproduces the upstream golden-fixture shape.

The on-disk goldens are upstream-pelias output (SURVEY.md §5.3): ways carry a
`nodes` array and a `centroid` of 6-decimal *strings*, no bbox, no
_centroidType, no ref→addr:unit promotion and no entrance centroids. This
module runs the shared scan→filter→denorm→centroid pipeline in that mode so
fixture row counts, tag filtering, join row counts and centroid values can be
asserted byte-for-byte (BASELINE.json: "matching the reference's join output
rows ... and centroid values on pbf2json's own fixture PBFs").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pbf2json_spark import dsl
from pbf2json_spark.denorm import computed_centroid, denormalize_ways


def _fmt6(c: F.Column) -> F.Column:
    return F.format_string("%.6f", c)


def upstream_query(
    nodes: DataFrame, ways: DataFrame, tags_dsl: str
) -> tuple[DataFrame, DataFrame]:
    """Filter nodes/ways by the tag DSL and denormalize, upstream-style.

    Returns (nodes_out, ways_out):
      nodes_out: id, type='node', lat, lon, tags
      ways_out:  id, type='way',  tags, centroid struct<lat:str,lon:str>,
                 nodes array<struct<lat:str,lon:str>>
    """
    query = dsl.parse(tags_dsl)

    n_trim = nodes.select(
        "id", "lat", "lon", dsl.trim_tags(F.col("tags")).alias("tags")
    )
    w_trim = ways.select("id", dsl.trim_tags(F.col("tags")).alias("tags"), "refs")

    nodes_out = n_trim.filter(dsl.compile_query(query, F.col("tags"))).select(
        "id", F.lit("node").alias("type"), "lat", "lon", "tags"
    )

    w_matched = w_trim.filter(dsl.compile_query(query, F.col("tags")))
    denorm = denormalize_ways(w_matched, n_trim, entrance_cols=False)
    ways_out = denorm.withColumn("c", computed_centroid(F.col("pts"))).select(
        "id",
        F.lit("way").alias("type"),
        "tags",
        F.struct(
            _fmt6(F.col("c.lat")).alias("lat"), _fmt6(F.col("c.lon")).alias("lon")
        ).alias("centroid"),
        F.transform(
            "pts",
            lambda p: F.struct(
                _fmt6(p["lat"]).alias("lat"), _fmt6(p["lon"]).alias("lon")
            ),
        ).alias("nodes"),
    )
    return nodes_out, ways_out


def to_records(nodes_out: DataFrame, ways_out: DataFrame) -> dict[str, dict]:
    """Collect both frames into the goldens' {str(id) → record} map shape
    (test/end-to-end.js:27-41 compares this order-insensitively)."""
    out: dict[str, dict] = {}
    for r in nodes_out.collect():
        out[str(r["id"])] = {
            "id": r["id"],
            "type": "node",
            "lat": r["lat"],
            "lon": r["lon"],
            "tags": dict(r["tags"]),
        }
    for r in ways_out.collect():
        out[str(r["id"])] = {
            "id": r["id"],
            "type": "way",
            "tags": dict(r["tags"]),
            "centroid": {"lat": r["centroid"]["lat"], "lon": r["centroid"]["lon"]},
            "nodes": [{"lat": p["lat"], "lon": p["lon"]} for p in r["nodes"]],
        }
    return out
