"""Wide -> long reshaping (SURVEY.md §2.7 R2).

Reference parity: notebooks/index.Rmd:727-747 — boolean EOV flag columns
unpivot into (layer_id, eov_id) association rows, where eov_id is defined by
the EXPLICIT column order passed by the caller (it differs from the frame's
column order; preserving it is a golden-tested invariant).

Implementation: the built-in ``stack`` table-generating expression — one
narrow projection, no shuffle, fully codegen'd.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def unpivot_flags(
    df: DataFrame,
    id_cols: list[str],
    flag_cols: list[str],
    ordinal_col: str = "flag_id",
    name_col: str | None = None,
    keep_false: bool = False,
) -> DataFrame:
    """Unpivot boolean flag columns to (id_cols..., ordinal, [name]) rows.

    ``flag_cols`` ORDER defines the 1-based ordinal. Rows where the flag is
    not true are dropped unless keep_false.
    """
    n = len(flag_cols)
    stacked = df.select(
        *[F.col(c) for c in id_cols],
        F.expr(
            f"stack({n}, "
            + ", ".join(
                f"{i + 1}, '{c}', cast(`{c}` as boolean)" for i, c in enumerate(flag_cols)
            )
            + f") as ({ordinal_col}, __flag_name, __flag_val)"
        ),
    )
    if not keep_false:
        stacked = stacked.filter(F.col("__flag_val"))
    if name_col:
        stacked = stacked.withColumnRenamed("__flag_name", name_col)
    else:
        stacked = stacked.drop("__flag_name")
    return stacked.drop("__flag_val")
