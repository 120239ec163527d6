"""pbf2json_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of HSLdevcom/pbf2json
(reference: /root/reference/pbf2json.go) as idiomatic Spark DataFrame
operators, and generalizes its core pattern (node-lookup denormalization
joins, tag cherry-picking, centroid/bbox aggregation) to web-scale tables:
H3/S2-style cell indexing, point-in-polygon joins, kNN, tile aggregation,
dedup/similarity/text-analysis operators for training-data pipelines.

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

from pbf2json_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
