"""Tokenization / shingling primitives shared by the dedupe + analysis ops.

All pure Column expressions (split/filter/transform/slice) so they stay inside
whole-stage codegen; at 100 TB the tokenizer runs in the scan stage with zero
Python round-trips. Token definition: lowercase, split on non-alphanumeric
runs, drop empties — the standard shingling normalization (Broder 1997,
"On the resemblance and containment of documents").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

TOKEN_SPLIT = "[^a-z0-9]+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens: split on non-alnum, drop empty strings."""
    return F.filter(F.split(F.lower(_c(col)), TOKEN_SPLIT), lambda t: t != "")


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens (for raw token counting — no case folding)."""
    return F.filter(F.split(_c(col), r"\s+"), lambda t: t != "")


def shingles(tok: Column, k: int, distinct: bool = True) -> Column:
    """k-word shingles of a token array; fewer than k tokens -> empty array.

    ``distinct=True`` gives set semantics (what MinHash/Jaccard need)."""
    n = F.size(tok)
    sh = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.array_join(F.slice(tok, i, k), " "),
    )
    if distinct:
        sh = F.array_distinct(sh)
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))


def duck_tokens(text_expr: str) -> str:
    """DuckDB expression mirroring :func:`tokens` — used by oracle SQL."""
    return (
        f"list_filter(string_split_regex(lower({text_expr}), '{TOKEN_SPLIT}'),"
        " t -> t <> '')"
    )


def duck_shingles(tok_expr: str, k: int, distinct: bool = True) -> str:
    """DuckDB expression mirroring :func:`shingles` (1-based list_slice)."""
    sh = (
        f"list_transform(range(1, len({tok_expr}) - {k} + 2),"
        f" i -> array_to_string(list_slice({tok_expr}, i, i + {k - 1}), ' '))"
    )
    if distinct:
        sh = f"list_distinct({sh})"
    return f"CASE WHEN len({tok_expr}) >= {k} THEN {sh} ELSE [] END"
