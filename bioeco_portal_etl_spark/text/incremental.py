"""Incremental batch-vs-history dedupe via a DataFrame-native Bloom filter.

The recurring ingest problem at 100 TB: yesterday's corpus is huge, today's
batch is small, and "drop batch docs whose content already exists" as a
left-anti join shuffles BOTH sides on the content hash — re-shuffling the
entire history every day. A Bloom filter inverts the cost: one scan of the
history builds a fixed-size bitset, and the batch filters against it
map-side.

Spark-native construction (no driver bitset, no UDFs, no JVM handles):
  - Each history doc's content hash yields ``k`` bit positions via
    Kirsch-Mitzenmacher double hashing (two ``xxhash64`` seeds compose all
    k functions — Kirsch & Mitzenmacher 2006, "Less hashing, same
    performance").
  - Positions fold into 64-bit WORDS with ``groupBy(word).agg(bit_or)`` —
    partial aggregation ORs map-side, so the shuffle carries at most
    ``m/64`` rows per map partition regardless of history size, and the
    result is a DataFrame of (word_idx, bits): ~190k rows / 1.5 MB for
    m = 2^23 — broadcastable by construction.
  - Membership: batch explodes to its k positions, broadcast-joins the
    word table (map-side), and a doc is "possibly seen" iff ALL k bits
    hit — one shuffle of the SMALL batch (groupBy doc), zero of history.

Guarantees (the Bloom contract): a batch doc whose exact content exists in
history is ALWAYS dropped (no false negatives); a genuinely-new doc is kept
with probability ~(1-fpp) — optimal k and sizing per Broder & Mitzenmacher
2004. Not DuckDB-oracle-able (xxhash64 is Spark-specific), so the gate is
property-based: tests/test_training_ops.py pins the no-false-negative
invariant and bounds the FP rate against the exact anti-join.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from bioeco_portal_etl_spark.text.dedupe import content_hash


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k) for an expected item count and FP rate:
    m = -n ln p / (ln 2)^2, k = (m/n) ln 2."""
    if not (0 < fpp < 1) or expected_items <= 0:
        raise ValueError(f"need expected_items > 0, 0 < fpp < 1; got {expected_items}, {fpp}")
    m = int(-expected_items * math.log(fpp) / (math.log(2) ** 2)) + 1
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _positions(c: Column, m_bits: int, k: int) -> Column:
    h1 = F.xxhash64(c)
    h2 = F.xxhash64(c, F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(h1 + i * h2, F.lit(m_bits)),
    )


def bloom_build(history: DataFrame, text_col: str, m_bits: int, k: int) -> DataFrame:
    """Bitset-as-DataFrame ``(word, bits)`` over the history's content
    hashes: one history scan, map-side bit_or combine, <= m_bits/64 rows."""
    pos = history.select(
        F.explode(_positions(content_hash(text_col), m_bits, k)).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_new_docs(
    batch: DataFrame,
    bloom: DataFrame,
    id_col: str,
    text_col: str,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Rows of ``batch`` whose content is NOT in the history bloom —
    i.e. at least one of the doc's k bits is unset. Broadcast word-table
    join (map-side) + one groupBy of the batch; history is never touched."""
    pos = batch.select(
        F.col(id_col).alias("__bid"),
        F.posexplode(_positions(content_hash(text_col), m_bits, k)).alias(
            "__i", "pos"
        ),
    ).select(
        "__bid",
        (F.col("pos") / 64).cast("long").alias("word"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
    )
    hits = pos.join(F.broadcast(bloom), "word", "left").select(
        "__bid",
        F.expr("(coalesce(bits, 0L) & bit) <> 0").alias("__hit"),
    )
    new_ids = (
        hits.groupBy("__bid")
        .agg(F.min("__hit").alias("__all_set"))
        .filter(~F.col("__all_set"))
        .select(F.col("__bid").alias(id_col))
    )
    return batch.join(new_ids, id_col, "left_semi")
