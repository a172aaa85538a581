"""Context-window chunking — split each document into fixed-token-budget
windows with overlap: the sliding-window preprocessing step between cleaning
and tokenization in LLM training / retrieval pipelines (complement of
operators/packing.py, which concatenates SHORT docs up to a budget; this
splits LONG docs down to one).

Pure Column expressions (``sequence`` -> ``posexplode`` -> ``slice``), so the
whole operator runs inside whole-stage codegen in the scan stage: no shuffle
at all — chunking is embarrassingly parallel per document, and the plan
shows a single mapping stage over the parquet scan. Token definition is
whitespace-split (``ws_tokens``) to preserve the original text byte-for-byte
inside each window (the dedupe stack's lowercased ``tokens`` normalization
would be destructive here).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bioeco_portal_etl_spark.text.tokenize import ws_tokens


def chunk_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 256,
    stride: int = 192,
) -> DataFrame:
    """One row per (document, window): window ``i`` covers tokens
    ``[i*stride, i*stride + chunk_size)``. ``stride < chunk_size`` gives
    ``chunk_size - stride`` tokens of overlap between consecutive windows.
    Documents with zero tokens produce no rows.

    Output: ``id, chunk_id, start_tok, n_tok, chunk``.
    """
    if not (0 < stride <= chunk_size):
        raise ValueError(f"need 0 < stride <= chunk_size, got {stride}/{chunk_size}")
    tok = ws_tokens(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(tok)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    exploded = df.select(
        F.col(id_col),
        tok.alias("__tok"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    ct = F.slice(F.col("__tok"), F.col("__start") + 1, chunk_size)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("__start").cast("long").alias("start_tok"),
        F.size(ct).cast("long").alias("n_tok"),
        F.array_join(ct, " ").alias("chunk"),
    )
