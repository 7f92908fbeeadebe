"""osmesa_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of azavea/osmesa (reference: /root/reference),
re-expressed Spark-first.

Layout:
    session     — SparkSession factory (mirrors reference Analytics.scala:10-28)
    schemas     — declared StructTypes for the OSM data model (SURVEY.md §1.2)
    functions/  — column-level function library (tag predicates, map aggs,
                  text, time/sequence, geo math)
    operators/  — batch operators/pipelines (preprocess, geometry, geocode,
                  stats, rollups, vectorgrid, dedup, similarity, text analysis)
    sources/    — replication-stream emulation + file readers
    sinks/      — idempotent upsert sinks
    streaming/  — streaming twins of the batch apps
"""

__version__ = "0.1.0"
