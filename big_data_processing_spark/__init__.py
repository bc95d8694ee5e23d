"""big_data_processing_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
HESHAN0119/big_data_processing (see SURVEY.md), re-expressed Spark-first:
DataFrame/SQL declarative plans optimized by Catalyst, Structured Streaming
for ingest, MLlib for regression — plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB-scale clusters.

Layout:
    session    — tuned SparkSession builders (AQE, Arrow, shuffle sizing)
    sources    — readers/writers (parquet testdata, CSV-with-schema, streams)
    functions  — column-expression helper library (dates, text, vectors)
    operators  — reusable DataFrame→DataFrame operators (top-k, dedup, knn…)
    plans      — query catalogs: generic testdata catalog + weather parity
    streaming  — Structured Streaming ingest and stateful ops
    ml         — MLlib pipelines (ET regression parity)
"""

__version__ = "0.1.0"
