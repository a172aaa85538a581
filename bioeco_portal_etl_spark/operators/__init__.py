"""Relational operators (SURVEY.md §2.3-2.8)."""

from bioeco_portal_etl_spark.operators.aggregate import (
    bool_any,
    distinct_concat,
    ordinal_min,
)
from bioeco_portal_etl_spark.operators.dedupe import (
    dedupe_keep_first,
    duplicate_audit,
    make_unique,
)
from bioeco_portal_etl_spark.operators.projection import (
    flag_columns,
    pair_null,
    patch,
    select_rename,
)
from bioeco_portal_etl_spark.operators.skew import salted_agg, with_salt
from bioeco_portal_etl_spark.operators.union import union_by_name
from bioeco_portal_etl_spark.operators.unpivot import unpivot_flags

__all__ = [
    "salted_agg",
    "with_salt",
    "bool_any",
    "distinct_concat",
    "ordinal_min",
    "dedupe_keep_first",
    "duplicate_audit",
    "make_unique",
    "flag_columns",
    "pair_null",
    "patch",
    "select_rename",
    "union_by_name",
    "unpivot_flags",
]
