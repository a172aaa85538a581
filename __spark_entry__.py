"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full catalog (bioeco_portal_etl_spark.catalog) —
one entry per implemented operator from SURVEY.md §2 plus the LLM-pipeline
extensions, each with a DuckDB-equivalent oracle where SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bioeco_portal_etl_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the canonical-entities composite
    (union-by-name + slugify + make-unique + deterministic id — the
    reference's EP1 pipeline shape). Driver checks rows>0, stable schema."""
    return catalog.queries()["p0_canonical_entities"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
