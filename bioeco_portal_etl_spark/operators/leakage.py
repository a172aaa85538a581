"""Train/eval split-leakage audit — the pre-training QA gate that runs
AFTER splitting and BEFORE training: identical content appearing on both
sides of a split (same document ingested twice under different ids, mirror
URLs, boilerplate pages) silently turns held-out metrics into memorization
tests. The check is content-based, not id-based — id-level splits are
leak-proof by construction (hash_split), so the thing to audit is content
collisions ACROSS ids.

Spark-first: one md5 over the content column, one hash-partitioned
groupBy(content_hash) carrying conditional counts per split — map-side
combinable, no join, no window, output bounded by the number of LEAKED
hashes (tiny in a healthy corpus, and exactly the rows you want to stare
at when it isn't). At 100 TB this is a single shuffle of (hash, split)
pairs; compare dedupe-then-split, which needs the same shuffle anyway —
auditing is not more expensive than preventing.

Extension beyond the reference surface (no split/leakage concept in the
R pipeline); composes text/dedupe.py's content_hash convention (null
text hashes as '') with operators/sampling.py's deterministic splits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bioeco_portal_etl_spark.text.dedupe import content_hash


def split_leakage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str,
    train_value: str = "train",
) -> DataFrame:
    """Per leaked content hash: (content_hash, n_docs, n_train, n_eval,
    min_doc) for every hash whose documents land in BOTH the train split
    and any other split. ``min_doc`` (lowest id among the hash's docs) is
    the deterministic exemplar to inspect. Empty result = leak-free."""
    is_train = (F.col(split_col) == train_value).cast("long")
    return (
        df.select(
            F.col(id_col),
            content_hash(text_col).alias("content_hash"),
            is_train.alias("__t"),
        )
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").alias("n_train"),
            (F.count(F.lit(1)) - F.sum("__t")).alias("n_eval"),
            F.min(id_col).alias("min_doc"),
        )
        .filter((F.col("n_train") > 0) & (F.col("n_eval") > 0))
    )
