"""Sinks (SURVEY.md §2.2 K1-K8)."""

from bioeco_portal_etl_spark.sinks.fixtures import rows_to_fixture_json, write_fixture
from bioeco_portal_etl_spark.sinks.jdbc_upsert import (
    replace_set_partitioned,
    stage_and_merge,
    upsert_partitioned,
)
from bioeco_portal_etl_spark.sinks.sqlscript import sql_update_script

__all__ = [
    "rows_to_fixture_json",
    "write_fixture",
    "sql_update_script",
    "upsert_partitioned",
    "stage_and_merge",
    "replace_set_partitioned",
]
