"""Scalar column functions (SURVEY.md §2.3).

All hot-path functions are built-in Column expressions (JVM-side, whole-stage
codegen); only transliteration needs Python, and it ships as a pandas UDF.
"""

from bioeco_portal_etl_spark.functions.dates import end_of_year, year_to_date
from bioeco_portal_etl_spark.functions.ids import with_row_id, zip_with_index
from bioeco_portal_etl_spark.functions.recode import recode
from bioeco_portal_etl_spark.functions.strings import (
    make_identifier,
    na_if_blank,
    norm_ws,
    null_quote,
    shorten_identifier,
    slugify,
    str_trunc,
)

__all__ = [
    "end_of_year",
    "year_to_date",
    "with_row_id",
    "zip_with_index",
    "recode",
    "make_identifier",
    "na_if_blank",
    "norm_ws",
    "null_quote",
    "shorten_identifier",
    "slugify",
    "str_trunc",
]
