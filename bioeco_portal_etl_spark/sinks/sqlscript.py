"""SQL-script generation sink (SURVEY.md §2.2 K8).

Reference parity: export_in_obis.R:12 — emit one
``UPDATE layers_layer SET data_in_obis = <v> WHERE name = '<n>';`` per row.

Pure column expressions (concat + null-sentinel quoting); the script body is
computed distributed and written via write.text or collected for small dims.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from bioeco_portal_etl_spark.functions.strings import null_quote


def sql_update_script(
    df: DataFrame,
    table: str,
    set_col: str,
    set_value: Column | str,
    key_col: str,
) -> DataFrame:
    """One ``stmt`` string column per row."""
    v = F.col(set_value) if isinstance(set_value, str) else set_value
    return df.select(
        F.concat(
            F.lit(f"update {table} set {set_col} = "),
            null_quote(v),
            F.lit(f" where {key_col} = "),
            null_quote(F.col(key_col)),
            F.lit(";"),
        ).alias("stmt")
    )
