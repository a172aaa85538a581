"""Winnowing document fingerprints (Schleimer–Wilkerson–Aiken, SIGMOD'03 —
the MOSS algorithm): hash every k-gram, slide a w-wide window over the
hash sequence, keep each window's minimum — guaranteeing any match of
length >= w + k - 1 between two documents shares at least one selected
fingerprint, at ~2/(w+1) of the k-gram density. This is the classic
ROLLING-fingerprint scheme a plagiarism/near-dup pipeline uses when
MinHash's set semantics lose too much position/locality information.

Complements the dedup family: tx4 (full/prefix content hash) is exact-dup;
td2/td3 (MinHash/SimHash) are bag-of-shingles similarity; winnowing gives
POSITIONAL fingerprints suitable for substring-level overlap detection
(contiguous cloned passages), which none of the above localize.

Spark-first: the k-gram expansion is ``posexplode(sequence)`` + substring
(whole-stage codegen, no UDF); the window-min is a single ROWS-frame
running min per doc — one sort per doc partition, which Catalyst serves
with ONE shuffle on doc_id for both the window and the downstream
per-doc aggregate (same partitioning). Hashes are md5 hex strings:
lexicographic min on hex is engine-portable (pure ASCII ordering) and
needs no 64-bit-int conversion. At 100 TB the expansion is the cost —
position rows = corpus chars — but it is embarrassingly parallel, feeds a
streaming window (no state beyond w rows), and the selected-fingerprint
output is ~2/(w+1) of it; the same expansion underlies every shingle
operator in text/dedupe.py.

Extension beyond the reference surface (no text processing in the R
notebooks); oracle = identical SQL windowing in DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(id, fp, pos) — the distinct selected fingerprints per document,
    ``fp`` the md5 hex of a k-char-gram, ``pos`` the 1-based position of
    the FIRST window selecting it. Documents shorter than k + w - 1 chars
    yield no rows (no complete window exists)."""
    t = F.coalesce(text_col, F.lit(""))
    base = df.select(
        F.col(id_col),
        t.alias("__t"),
        # complete w-windows over the k-gram sequence: len - (k + w - 1) + 1
        (F.length(t) - F.lit(k + w - 2)).alias("__nw"),
        F.posexplode(
            F.expr(
                f"sequence(1, greatest(length(coalesce({text_col}, ''))"
                f" - {k - 1}, 0))"
            )
        ).alias("__i", "pos"),
    )
    grams = base.select(
        id_col,
        "__nw",
        "pos",
        F.md5(F.expr(f"substring(__t, pos, {k})")).alias("h"),
    )
    # min hash over the w-gram window STARTING at pos (rows pos..pos+w-1);
    # only positions with a complete window select a fingerprint
    sel = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    picked = grams.withColumn("fp", F.min("h").over(sel)).filter(
        F.col("pos") <= F.col("__nw")
    )
    return picked.groupBy(id_col, "fp").agg(F.min("pos").alias("pos"))
