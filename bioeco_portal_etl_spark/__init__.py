"""bioeco_portal_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the iobis/bioeco-portal-etl reference pipeline
(R-markdown ETL, see SURVEY.md), re-expressed Spark-first for 100 TB scale.

Layout:
    session    — SparkSession factory (AQE, Arrow, tuned shuffle)
    sources    — scans: csv/tsv/parquet/json/geojson/excel/shapefile/rest/jdbc
    functions  — scalar column functions (strings, dates, recode, ids)
    operators  — relational operators (projection, dedupe, aggregate, unpivot, union)
    geo        — WKT/GeoJSON geometry functions (pure-Python, no native deps)
    sinks      — writers: fixtures, sql-script, jdbc upsert, shapefile, csv
    llm        — large-scale training-data ops: dedup, similarity, text, multimodal
    streaming  — Structured Streaming ingest of the events table
    pipeline   — the reference's end-to-end program flows re-expressed as dataflow
"""

__version__ = "0.1.0"
