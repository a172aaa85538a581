"""Source registry (SURVEY.md §1.3, §3 EP2).

The reference hard-codes ~35 imperative per-file ingest call sites with
per-file coordinate-column names and projections (notebooks/index.Rmd:424-462,
471-537). The engine replaces them with ONE data-driven abstraction: a
registry of SourceSpec rows; ingest is a map over the registry producing
DataFrames that union into the canonical layer table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.geo.wkt import point_wkt
from bioeco_portal_etl_spark.sources.files import read_csv, read_excel, read_tsv


@dataclass(frozen=True)
class SourceSpec:
    """(name, kind, path, coord_cols, crs) — one ingest unit.

    kind ∈ {csv, tsv, xlsx, parquet, shp, empty}. (GeoJSON embedded in a
    column is not a file source — see pipelines.layers.layer_table_from_geojson.)
    """

    name: str
    kind: str
    path: str | None = None
    lon_col: str | None = None
    lat_col: str | None = None
    crs: str = "EPSG:4326"
    options: dict = field(default_factory=dict)


def read_source(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    """Materialize one spec as a DataFrame with a ``geometry_wkt`` column when
    coordinates are declared, tagged with the program name."""
    if spec.kind == "csv":
        df = read_csv(spark, spec.path, **spec.options)
    elif spec.kind == "tsv":
        df = read_tsv(spark, spec.path, **spec.options)
    elif spec.kind == "xlsx":
        df = read_excel(spark, spec.path, **spec.options)
    elif spec.kind == "parquet":
        df = spark.read.parquet(spec.path)
    elif spec.kind == "shp":
        # S5: driver-side read (shapefiles are dimension-scale layer inputs)
        from bioeco_portal_etl_spark.geo.shapefile import read_shapefile

        feats = read_shapefile(spec.path)
        field_names = sorted({k for _, attrs in feats for k in attrs})
        rows = [
            (wkt, *[attrs.get(f) for f in field_names]) for wkt, attrs in feats
        ]
        schema = ", ".join(
            ["geometry_wkt string"] + [f"`{f}` string" for f in field_names]
        )
        df = spark.createDataFrame(rows, schema)
    elif spec.kind == "empty":
        df = spark.createDataFrame([], "geometry_wkt string")
    else:
        raise ValueError(f"unknown source kind: {spec.kind}")

    if spec.lon_col and spec.lat_col:
        # coordinate sanity filter (index.Rmd:435) + point construction
        df = df.filter(
            (F.col(spec.lat_col).cast("double") <= 90)
            & (F.col(spec.lat_col).cast("double") >= -90)
        )
        df = df.withColumn(
            "geometry_wkt",
            point_wkt(F.col(spec.lon_col).cast("double"), F.col(spec.lat_col).cast("double")),
        )
    return df.withColumn("source_name", F.lit(spec.name))
