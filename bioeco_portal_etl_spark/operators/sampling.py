"""Deterministic sampling / dataset splitting — train-pipeline operators
the reference (a one-shot ETL notebook) never needed, but any corpus
preparation at scale does: reproducible train/validation assignment that
is stable under reruns, repartitioning, and incremental appends.

Spark-first shape: the split is a pure COLUMN expression over a content
hash of the id (md5 -> first 8 hex digits -> integer bucket in [0, 10000)),
so it runs in whole-stage codegen, needs no shuffle, no RNG state, and the
same row always lands in the same split in any engine (md5 is
byte-identical in DuckDB — the oracle runs the same arithmetic).
`sample(fraction, seed)` by contrast is partition-order sensitive and
cannot be reproduced by another engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

BUCKETS = 10_000


def hash_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Stable bucket in [0, 10000): first 32 bits of md5(id || salt) mod 1e4.
    Uniform for any id distribution (sequential ints included)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(c.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS).alias(
        "bucket"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    train_frac: float = 0.9,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Two-way deterministic split: bucket < train_frac*10000 -> 'train',
    else 'val'. Rerun-stable and append-stable (new rows never move old
    rows between splits — the property seeded sample() lacks)."""
    b = hash_bucket(id_col, salt)
    thr = int(train_frac * BUCKETS)
    return df.withColumn(
        out_col, F.when(b < thr, F.lit("train")).otherwise(F.lit("val"))
    )


def stratified_hash_split(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    train_frac_by_stratum: dict[str, float],
    default_frac: float = 0.9,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Per-stratum train fraction (e.g. hold out more of a rare language):
    the threshold is a CASE over the stratum column; the bucket stays a pure
    hash of the id, so moving a row between strata never reshuffles other
    rows' assignments. No shuffle, no sampling pass, no collected stats."""
    b = hash_bucket(id_col, salt)
    thr: Column = F.lit(int(default_frac * BUCKETS))
    for stratum, frac in sorted(train_frac_by_stratum.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(int(frac * BUCKETS))
        ).otherwise(thr)
    return df.withColumn(
        out_col, F.when(b < thr, F.lit("train")).otherwise(F.lit("val"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    shards: int = 64,
    shard_col: Column | None = None,
) -> DataFrame:
    """Concat-and-split sequence packing (the GPT-style pretraining layout):
    documents are laid out as one contiguous token stream and cut into
    ``budget``-token bins; each document reports its stream offset and the
    bin its first token lands in.

    Scale shape: packing is SHARDED — a hash of the id picks one of
    ``shards`` independent streams, so the cumulative sum is a window
    partitioned by shard (one hash shuffle, per-shard sort), never a
    global single-partition window. Deterministic: stream order within a
    shard is the id order, so reruns and engines agree (the oracle runs
    the identical window arithmetic).

    Output: id, shard, token_start (offset within the shard's stream),
    bin_id (shard-global: shard * 2^32 + local bin).
    """
    from pyspark.sql import Window

    c = F.col(token_count_col).cast("long")
    shard = (
        shard_col
        if shard_col is not None
        else hash_bucket(id_col, salt="pack") % shards
    )
    w = Window.partitionBy("shard").orderBy(F.col(id_col))
    out = df.select(F.col(id_col), c.alias("n_tokens"), shard.alias("shard"))
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("token_start", (cum - F.col("n_tokens")).cast("long"))
    return out.withColumn(
        "bin_id",
        (F.col("shard").cast("long") * F.lit(2**32))
        + F.expr(f"token_start div {int(budget)}"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_by: list[Column | str],
    max_rows: int,
) -> DataFrame:
    """Per-group document cap (the per-domain/per-source quota every crawl
    curation applies): keep the first ``max_rows`` rows of each group under
    an explicit total order. One window on the group key — same shuffle
    family as dedupe_keep_first."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )


def priority_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "ps",
) -> DataFrame:
    """Weight-proportional sample of ``k`` rows per group — priority
    sampling (Duffield, Lund & Thorup 2004): each row gets priority
    ``q = w / u`` for a uniform hash draw ``u``, and the top-k priorities
    per group are a near-optimal weighted sample WITHOUT replacement,
    reproducible under reruns and engine changes because ``u`` is an
    md5-derived 60-bit hash, not an RNG.

    Cross-engine exactness: q is computed as ``w * 2^60 / h`` — one IEEE
    double multiply (2^60 is a power of two; for w < 2^13 the product is
    EXACT) and one correctly-rounded division, never a pow()/ln() whose
    libm could differ. Ties are broken by id, so the selected set and its
    ranking are bit-stable in any IEEE engine.

    Plan: pure column priority + one row_number window on the group key —
    identical shuffle family as cap_per_group; no RNG state, no collect.
    """
    from pyspark.sql import Window

    from bioeco_portal_etl_spark.sketches import H60_DOMAIN, h60

    h = h60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    q = F.col(weight_col).cast("double") * F.lit(float(H60_DOMAIN)) / h
    w = Window.partitionBy(group_col).orderBy(
        F.desc(q), F.asc(id_col)
    )
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def temporal_split(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    test_pct: int = 20,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe per-key temporal train/test split: each key's LAST
    ``test_pct`` percent of rows (by time) become 'test', the prefix
    'train' — the split an evaluation pipeline needs when random splits
    would leak future context into training (forecasting, session models,
    recommender logs).

    n_test = (n * test_pct) div 100 — pure integers, so the boundary row
    is identical in any engine. One window on the key (same exchange
    family as cap_per_group); no RNG, stable under reruns and appends of
    STRICTLY NEWER data (appending older rows re-ranks — by design: the
    split is a function of each key's full timeline).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.desc(ts_col), F.desc(tiebreak_col)
    )
    wc = Window.partitionBy(key_col)
    rn_from_end = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wc)
    return (
        df.withColumn("__rn_end", rn_from_end)
        .withColumn("__n", n)
        .withColumn(
            out_col,
            F.when(
                F.col("__rn_end") <= F.expr(f"(__n * {test_pct}) div 100"),
                F.lit("test"),
            ).otherwise(F.lit("train")),
        )
        .drop("__rn_end", "__n")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str,
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic training-epoch shuffle: every row gets a
    pseudo-random 60-bit key ``h = md5(seed || ':' || id)``, a shard
    ``h % n_shards``, and a within-shard position by ``h`` — the
    reproducible global shuffle a data loader needs per epoch. Change
    ``seed`` ('epoch-0', 'epoch-1', ...) and the permutation changes
    completely; rerun the same seed anywhere and byte-identical shards
    come back (no RNG state, no sampling pass — the same md5 idiom as
    hash_bucket/shard manifests).

    Plan: the key is scan-stage expression work; the only exchange is
    repartition-by-shard (what the writer needs anyway); within-shard
    order is a sortWithinPartitions, not a global sort. At 100 TB this is
    one hash shuffle + local sorts — the minimum any epoch shuffle pays.
    """
    from bioeco_portal_etl_spark.sketches import h60

    key = h60(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    return (
        df.withColumn("shuffle_key", key)
        .withColumn(
            "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("long")
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key")
    )


def epoch_shuffle_audit(shuffled: DataFrame, id_col: str) -> DataFrame:
    """Per-shard audit of an epoch_shuffle layout: row count, the first/
    last ids in shuffle order, and an order-insensitive id checksum —
    enough for a trainer to verify it got the exact permutation a prior
    run logged. min_by/max_by on the shuffle key are combinable
    aggregates, so the audit is one map-side-combined groupBy."""
    return (
        shuffled.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min_by(F.col(id_col), F.col("shuffle_key")).alias("first_id"),
            F.max_by(F.col(id_col), F.col("shuffle_key")).alias("last_id"),
            F.sum(F.col(id_col)).alias("id_sum"),
        )
    )
