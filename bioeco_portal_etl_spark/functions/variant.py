"""Semi-structured shredding through Spark 4's VariantType.

``parse_json`` turns a JSON string column into the binary-encoded
VARIANT form ONCE at ingest; every later ``variant_get`` walks the
pre-parsed tree with a typed path instead of re-tokenizing text — the
reason warehouses (and Parquet's own variant spec) adopted the type for
log/props columns at scale: parse cost is paid once per row, not once
per extracted field, and the encoding is columnar-shreddable.

All expressions here are Catalyst built-ins (whole-stage codegen, no
Python); the DuckDB oracle mirrors the SEMANTICS with its JSON
extractors, which is exactly the point — VARIANT is an execution-side
representation, not a semantics change.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def shred_variant(
    df: DataFrame,
    json_col: str,
    fields: dict[str, tuple[str, str]],
    keep: list[str] | None = None,
) -> DataFrame:
    """Parse ``json_col`` to VARIANT once and extract ``fields`` as
    typed columns: {out_name: (path, spark_type)} with JSONPath-style
    paths ('$.meta.k'). Missing/mistyped paths yield NULL
    (try_variant_get), the permissive ingest behavior a raw-log column
    needs."""
    v = F.parse_json(F.col(json_col))
    cols: list[Column] = [
        F.try_variant_get(v, path, typ).alias(out)
        for out, (path, typ) in fields.items()
    ]
    return df.select(*(keep or []), *cols)
