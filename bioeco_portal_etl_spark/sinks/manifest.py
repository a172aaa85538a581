"""Training-shard export with a verifiable manifest — the contract layer
between a curation pipeline and a trainer: the trainer must know, before
reading a byte, how many shards exist, how many rows each holds, and a
content fingerprint to detect silent re-writes (a dataset card's
"provenance" block, machine-generated).

The reference has no manifest concept (its outputs are hand-counted in
notebook prose); this is the extension a 100 TB corpus handoff needs.

Spark-first shape:

- **Shard assignment is deterministic**: ``shard = crc32-style md5 hash
  of the id, mod n_shards`` — reruns produce byte-identical shard
  membership (no round-robin, which depends on partition scheduling).
  Assignment + write is ONE pass: `partitionBy(shard)` fans out files,
  `maxRecordsPerFile` bounds file sizes inside a shard.
- **The manifest is computed from the DATA, not the write path**: one
  aggregate per shard (row count, byte-ish size proxy, order-insensitive
  content hash via ``sum(hash-per-row)``) — so re-deriving the manifest
  from a re-read MUST reproduce it, which is exactly the integrity check
  ``verify_manifest`` runs. Order-insensitivity matters: parquet row
  order within a shard is not stable across writer parallelism, and a
  manifest that hashed ordered rows would false-alarm on every rerun.
- At scale both passes are map-side-combinable aggregates behind one
  shuffle on the shard key; the verify pass reads ONLY the shard under
  suspicion when given a predicate (partition pruning).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MANIFEST_SCHEMA = "shard long, n_rows long, n_chars long, content_sum long"


def assign_shards(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Append a deterministic ``shard`` column in [0, n_shards): md5 of
    the id folded to a long (same fold the sampling splits use), mod n.
    Hash-based, so membership survives reruns, repartitions, and engine
    versions — unlike anything derived from task/partition ids."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
    return df.withColumn("shard", (h.cast("long") % n_shards).cast("long"))


def _shard_rollup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # order-insensitive content fingerprint: per-row 40-bit md5 prefix of
    # (id, text), SUMMED per shard — commutative, so writer parallelism
    # and row order cannot change it. On huge shards the int64 sum may
    # wrap; wrap-around is modulo-2^64 arithmetic, still commutative and
    # deterministic, so the fingerprint stays valid — it is an integrity
    # check, not a count. Collisions need an adversary, not bad luck.
    row_h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "",
                    F.col(id_col).cast("string"),
                    F.coalesce(F.col(text_col), F.lit("")),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    return df.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "n_chars"
        ),
        F.sum(row_h).alias("content_sum"),
    )


def write_shards_with_manifest(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    n_shards: int = 16,
    max_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Write ``df`` as ``path/shard=N/*.parquet`` plus
    ``path/_manifest`` (parquet), and return the manifest DataFrame:
    (shard, n_rows, n_chars, content_sum), one row per NON-EMPTY shard."""
    sharded = assign_shards(df, id_col, n_shards)
    (
        sharded.write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    manifest = _shard_rollup(sharded, id_col, text_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(path + "/_manifest")
    return manifest


def verify_manifest(
    spark: SparkSession, path: str, id_col: str, text_col: str
) -> DataFrame:
    """Re-derive the rollup from the written shards and full-outer join
    it against the stored manifest: (shard, ok, stored_*, actual_*).
    ``ok = 0`` rows localize corruption/drift to a shard without reading
    anything twice. An empty frame means the dataset vanished — callers
    should treat 'no rows' as failure, not success."""
    stored = spark.read.parquet(path + "/_manifest").select(
        "shard",
        F.col("n_rows").alias("stored_rows"),
        F.col("n_chars").alias("stored_chars"),
        F.col("content_sum").alias("stored_sum"),
    )
    actual = _shard_rollup(
        spark.read.parquet(path), id_col, text_col
    ).select(
        "shard",
        F.col("n_rows").alias("actual_rows"),
        F.col("n_chars").alias("actual_chars"),
        F.col("content_sum").alias("actual_sum"),
    )
    j = stored.join(actual, "shard", "full_outer")
    ok = (
        F.col("stored_rows").eqNullSafe(F.col("actual_rows"))
        & F.col("stored_chars").eqNullSafe(F.col("actual_chars"))
        & F.col("stored_sum").eqNullSafe(F.col("actual_sum"))
    )
    return j.select("shard", ok.cast("long").alias("ok"), *[
        c for c in j.columns if c != "shard"
    ])
