"""Scans / sources (SURVEY.md §2.1 S1-S9)."""

from bioeco_portal_etl_spark.sources.files import (
    list_files,
    read_csv,
    read_tsv,
    read_parquet_table,
    load_tables,
)
from bioeco_portal_etl_spark.sources.registry import SourceSpec, read_source

__all__ = [
    "list_files",
    "read_csv",
    "read_tsv",
    "read_parquet_table",
    "load_tables",
    "SourceSpec",
    "read_source",
]
