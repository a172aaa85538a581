"""JDBC scans (SURVEY.md §2.1 S8).

Reference parity: eov_to_keywords.Rmd:44-45 — a SQL join pushed to Postgres
(``layers_layer_eovs l LEFT JOIN goos_eov e ON l.eov_id = e.id``).

Two strategies, chosen per call:
  - ``read_jdbc_query``: push the whole query to the database (right when the
    DB side is small or the query is highly selective);
  - ``read_jdbc_table`` + Spark-side join: right when tables are large — add
    partitionColumn/numPartitions for parallel reads so the scan is not a
    single-connection bottleneck at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def read_jdbc_query(spark: SparkSession, url: str, query: str, properties: dict[str, str] | None = None) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
