"""Django-fixture JSON sink (SURVEY.md §2.2 K4).

Reference parity: notebooks/index.Rmd:648-656 (eovs.json) and :680-687
(users.json) — each row becomes ``{"model": ..., "pk": ..., "fields": {...}}``
and the file is ONE JSON array.

Spark-first: the struct assembly and JSON encoding run distributed
(to_json(struct(...))); only the final array framing touches the driver
(fixtures are dimension-scale by definition — they feed Django loaddata).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def rows_to_fixture_json(df: DataFrame, model: str, pk_col: str, field_cols: list[str]) -> DataFrame:
    """One ``json`` string column per row: {"model","pk","fields":{...}}."""
    fields = F.struct(*[F.col(c) for c in field_cols])
    record = F.struct(
        F.lit(model).alias("model"),
        F.col(pk_col).alias("pk"),
        fields.alias("fields"),
    )
    return df.select(F.to_json(record).alias("json"))


def write_fixture(df: DataFrame, model: str, pk_col: str, field_cols: list[str], path: str, order_by: str | None = None) -> None:
    """Collect the encoded rows and frame them as one JSON array file."""
    src = df.orderBy(order_by) if order_by else df
    enc = rows_to_fixture_json(src, model, pk_col, field_cols)
    rows = [r["json"] for r in enc.collect()]
    with open(path, "w") as f:
        f.write("[\n" + ",\n".join(rows) + "\n]\n")
