"""Partition-batched grouped mapping — the fast tier under
``groupBy().applyInPandas``.

``applyInPandas`` materializes one pandas DataFrame per GROUP: at
clickstream cardinalities that is millions of tiny frames, and the
measured per-group glue (Arrow slice -> pandas construct -> UDF call ->
output collect) is ~1.8 ms/group on this machine — 2.8 s of pure
overhead for 1500 groups at sf0.1 before any real work happens. The
pattern here keeps the SAME semantics (a function sees complete, sorted
groups) at mapInPandas cost: repartition by key + sortWithinPartitions
makes every group contiguous, and the batch iterator carries the
trailing (possibly batch-split) group into the next Arrow batch, so the
processing function receives large multi-group frames and can vectorize
ACROSS groups. Memory bound: one Arrow batch + the largest single group
— the same bound applyInPandas pays.

Measured: the trivial identity drops 2.76 s -> 0.59 s at sf0.1 (1500
groups); resample/EWMA keep their oracles bit-identical (the per-group
arithmetic is unchanged, only the batching moved).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def map_complete_groups(
    df: DataFrame,
    key_col: str,
    sort_cols: list[str],
    batch_fn: Callable,
    schema: str,
) -> DataFrame:
    """Run ``batch_fn(pdf)`` over multi-group pandas frames in which every
    group (contiguous run of ``key_col``) is COMPLETE — never split
    across two calls — and rows are sorted by (key, *sort_cols).
    ``batch_fn`` returns a pandas DataFrame matching ``schema``.

    The shuffle is the same single hash(key) exchange applyInPandas
    pays; only the Python-side batching differs."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            keys = pdf[key_col].to_numpy()
            # keys are ascending within the partition (sortWithinPartitions),
            # so the trailing group starts at the first occurrence of the
            # last key — hold it back until the next batch completes it
            cut = int(np.searchsorted(keys, keys[-1], side="left"))
            carry = pdf.iloc[cut:]
            body = pdf.iloc[:cut]
            if len(body):
                yield batch_fn(body)
        if carry is not None and len(carry):
            yield batch_fn(carry)

    return (
        df.repartition(F.col(key_col))
        .sortWithinPartitions(key_col, *sort_cols)
        .mapInPandas(run, schema)
    )


def group_bounds(keys) -> "tuple":
    """(starts, ends) index arrays of the contiguous key runs in a sorted
    key array — the per-group slicing primitive for batch_fn bodies."""
    import numpy as np

    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    ends = np.append(starts[1:], len(keys))
    return starts, ends
