"""Bloom-filter join pruning — the explicit form of a runtime row filter
(Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled`, Trino's
dynamic filtering): before shuffling a 100 TB fact table into a join,
test each fact key against a Bloom filter of the (much smaller) build
side and drop non-matching rows INSIDE THE SCAN STAGE. Rows that cannot
join never enter the exchange; false positives are eliminated by the
real join that follows, so the composed result is EXACTLY the plain
join — the Bloom stage is pure I/O savings.

Implementation on top of the repo's md5-exact Bloom (sketches/
bloom_md5.py builds the identical (word, bits) table):

  1. build the bitset over the dim keys (one scan, bit_or combine,
     <= ceil(m_bits/60) rows out);
  2. COLLECT those words into a literal long array — bounded driver
     state (m_bits/60 longs, ~70 for 4096 bits), the same class as the
     k-means centroid fetch; as a plan literal, the probe needs no join,
     no shuffle, and no broadcast exchange;
  3. probe = AND over the k md5 double-hash positions. The hashes and
     positions are STAGED as named columns before the filter expression
     references them — an inline spelling would re-run the md5 chain per
     probe term (the CollapseProject trap documented in bloom_md5/cms);
  4. survivors flow into the ordinary equi-join.

Why not reuse bloom_contains_md5? That form (explode k probes ->
broadcast-join the word table -> groupBy to AND) re-aggregates on the
fact key — a fact-sized shuffle, fine for decontamination REPORTS but
self-defeating for join PRUNING, whose whole point is shrinking data
before the first exchange. The literal-array probe keeps the filter in
WholeStageCodegen inside the scan stage."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bioeco_portal_etl_spark.sketches import h60
from bioeco_portal_etl_spark.sketches.bloom_md5 import (
    WORD_BITS,
    bloom_build_md5,
)


def bloom_words(dim: DataFrame, dim_key: str, m_bits: int, k: int) -> list[int]:
    """The dim-key bitset as a dense word list (index w covers bits
    [w*60, (w+1)*60)) — the bounded collect of the build side."""
    rows = bloom_build_md5(dim, dim_key, m_bits, k).collect()
    by_word = {r["word"]: r["bits"] for r in rows}
    return [
        by_word.get(w, 0)
        for w in range((m_bits + WORD_BITS - 1) // WORD_BITS)
    ]


def with_bloom_probe(
    df: DataFrame,
    key_col: str,
    words: list[int],
    m_bits: int,
    k: int,
    out_col: str = "__bloom_hit",
) -> DataFrame:
    """Append a boolean scan-stage probe column (all k bits set)."""
    arr_sql = "array(" + ", ".join(f"{int(w)}L" for w in words) + ")"
    staged = df.withColumn(
        "__h1", h60(F.col(key_col).cast("string"))
    ).withColumn(
        "__h2", h60(F.concat(F.lit("b2:"), F.col(key_col).cast("string")))
    )
    for i in range(k):
        staged = staged.withColumn(
            f"__p{i}", F.pmod(F.col("__h1") + i * F.col("__h2"), F.lit(m_bits))
        )
    terms = [
        f"(shiftright(element_at({arr_sql},"
        f" CAST(__p{i} div {WORD_BITS} AS INT) + 1),"
        f" CAST(__p{i} % {WORD_BITS} AS INT)) % 2) != 0"
        for i in range(k)
    ]
    return staged.withColumn(out_col, F.expr(" AND ".join(terms))).drop(
        "__h1", "__h2", *[f"__p{i}" for i in range(k)]
    )


def bloom_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Inner equi-join fact⋈dim with a Bloom prefilter on the fact side;
    the result set is exactly the plain join's (false positives die in
    the join). Keep ``m_bits`` ~10x the dim-key count for a ~1-2% FP
    rate; at 100 TB the fact-side exchange shrinks by the true join
    selectivity."""
    words = bloom_words(dim, dim_key, m_bits, k)
    pruned = with_bloom_probe(fact, fact_key, words, m_bits, k).filter(
        F.col("__bloom_hit")
    ).drop("__bloom_hit")
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])
