"""Date scalar functions.

Reference parity:
  - year_to_date -> notebooks/index.Rmd:103,182 (parse_date_time(orders="y"))
  - end_of_year  -> notebooks/index.Rmd:104,183 (ceiling_date(., "year") - days(1))

P9 boundary semantics (SURVEY.md §2.3): lubridate's ceiling_date with
change_on_boundary=FALSE returns a Jan-1 input unchanged, so the reference's
"end of year" of a year-precision date is actually **Dec 31 of year N-1 ... +364
days later**?  No: year_to_date always produces Jan 1 of the year, ceiling to
year boundary returns the same Jan 1, minus one day = **Dec 31 of year-1**.
We reproduce that observed behavior in ``end_of_year`` and expose the intended
semantics as ``end_of_year_intent``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def year_to_date(col: Column | str) -> Column:
    """Parse a year-precision string to Jan 1 of that year; non-year strings
    ("active", "current", "0", "NA") -> null."""
    c = F.trim(_c(col).cast("string"))
    year = F.regexp_extract(c, r"^(\d{4})(?:\.0)?$", 1)
    return F.when(
        year != "", F.to_date(F.concat(year, F.lit("-01-01")))
    ).otherwise(F.lit(None).cast("date"))


def end_of_year(col: Column | str) -> Column:
    """Reference-observed semantics: a date already on the Jan-1 boundary
    ceilings to itself, minus 1 day => Dec 31 of the PREVIOUS year."""
    d = _c(col)
    on_boundary = (F.month(d) == 1) & (F.dayofmonth(d) == 1)
    ceil = F.when(on_boundary, d).otherwise(
        F.to_date(F.concat((F.year(d) + 1).cast("string"), F.lit("-01-01")))
    )
    return F.date_sub(ceil, 1)


def end_of_year_intent(col: Column | str) -> Column:
    """Intended semantics: Dec 31 of the SAME year."""
    d = _c(col)
    return F.to_date(F.concat(F.year(d).cast("string"), F.lit("-12-31")))
