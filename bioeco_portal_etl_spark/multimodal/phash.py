"""Perceptual image hashing (average-hash) + banded Hamming near-dup join —
image-space deduplication for multimodal training corpora.

Text dedup has MinHash; images have perceptual hashes: decode, reduce to a
small grayscale grid, threshold each cell against the image mean, and pack
the bits (public aHash scheme, e.g. the pHash project / imagehash
library's average_hash). Byte-identical duplicates, re-encodes, and mild
crops/rescales collapse to equal-or-near hashes, so corpus-level image
dedup becomes integer work:

- :func:`ahash` runs the REAL PNG decode (multimodal/png.py: inflate +
  filter reconstruction) inside one Arrow batch stage and emits a 16-bit
  grid hash per image — payload bytes never return to the JVM.
- :func:`phash_dup_groups` is exact-dup collapse: a window count over the
  hash value (uniform 16-bit key — no skew beyond true duplicate mass).
- :func:`phash_near_pairs` finds Hamming-<=3 pairs WITHOUT an all-pairs
  join: the 16-bit hash splits into 4 nibbles and a pair with Hamming
  distance <= 3 must agree on at least one nibble (pigeonhole), so
  candidates come from 4 equi-joins on (band, nibble) and only candidates
  pay the exact ``bit_count(h1 ^ h2)`` verify — the LSH-banding contract
  of text/dedupe.py applied to image space.

All grid arithmetic is integer (sum // count means, strict > threshold),
so an oracle that knows the source pixels reproduces the hash bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

AHASH_SCHEMA = "media_id long, width long, height long, phash long"

GRID = 4  # 4x4 blocks -> 16-bit hash


def ahash(df: DataFrame, grid: int = GRID) -> DataFrame:
    """(media_id, payload) -> (media_id, width, height, phash).

    Grayscale is the integer mean ``(r + g + b) // 3``; block (by, bx)
    holds pixels with ``y*grid // h == by`` and ``x*grid // w == bx``
    (exact integer banding, any w/h >= grid); a bit is set when the block
    mean exceeds the floor-mean of all block means."""
    import pandas as pd

    def hash_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from bioeco_portal_etl_spark.multimodal.png import decode_png

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "phash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, rows = decode_png(bytes(payload))
                sums = [[0] * grid for _ in range(grid)]
                cnts = [[0] * grid for _ in range(grid)]
                for y in range(h):
                    row = rows[y]
                    by = y * grid // h
                    for x in range(w):
                        if ch >= 3:
                            g = (
                                row[x * ch]
                                + row[x * ch + 1]
                                + row[x * ch + 2]
                            ) // 3
                        else:
                            g = row[x * ch]
                        bx = x * grid // w
                        sums[by][bx] += g
                        cnts[by][bx] += 1
                means = [
                    [sums[by][bx] // cnts[by][bx] for bx in range(grid)]
                    for by in range(grid)
                ]
                thr = sum(m for r in means for m in r) // (grid * grid)
                hv = 0
                for by in range(grid):
                    for bx in range(grid):
                        if means[by][bx] > thr:
                            hv |= 1 << (by * grid + bx)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["phash"].append(hv)
            yield pd.DataFrame(out)

    return df.mapInPandas(hash_batch, schema=AHASH_SCHEMA)


def phash_dup_groups(hashed: DataFrame) -> DataFrame:
    """Per-image exact-duplicate group size: window count over the hash.

    The shuffle key is the 16-bit hash — duplicate groups co-locate, the
    rest spreads uniformly; heavy true-duplicate mass is exactly the data
    the operator exists to find."""
    from pyspark.sql import Window

    return hashed.withColumn(
        "group_n",
        F.count("*").over(Window.partitionBy("phash")).cast("long"),
    )


def phash_near_pairs(hashed: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All pairs (a < b) with Hamming distance <= ``max_hamming`` via
    nibble banding. Complete for ``max_hamming <= 3`` by pigeonhole over
    the 4 bands; candidates that match in several bands are de-duplicated
    before the verify, so each pair pays one ``bit_count``."""
    if max_hamming > 3:
        raise ValueError(
            "nibble banding over a 16-bit hash is complete only for "
            f"max_hamming <= 3, got {max_hamming}"
        )
    bands = hashed.select(
        F.col("media_id"),
        F.col("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(f"shiftright(phash, {4 * i}) & 15").alias(
                            "nib"
                        ),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("media_id", "phash", "b.band", "b.nib")
    lhs = bands.select(
        "band",
        "nib",
        F.col("media_id").alias("a_id"),
        F.col("phash").alias("a_hash"),
    )
    rhs = bands.select(
        "band",
        "nib",
        F.col("media_id").alias("b_id"),
        F.col("phash").alias("b_hash"),
    )
    cands = (
        lhs.join(rhs, ["band", "nib"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_hash", "b_hash")
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming",
            F.expr("bit_count(a_hash ^ b_hash)").cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
