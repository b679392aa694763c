"""Mergeable sketches: HyperLogLog approximate distinct count.

The reference has no sketches (SURVEY.md §2.5), but a 10^12-document
engine needs approximate distinct counts where exact ``COUNT(DISTINCT)``
would shuffle every value. Pattern per the Ray guide: one serialized
sketch per batch (map_batches partial), merged in a tiny final stage —
sketches are designed to be mergeable, so the shuffle payload is
#batches × 4 KiB regardless of corpus size.

HyperLogLog (Flajolet et al. 2007) with p=12 (4096 uint8 registers,
~1.6% standard error), linear-counting small-range correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

P = 12
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _hash_column(col: pa.Array) -> np.ndarray:
    """Stable 64-bit hashes of an arrow column (strings or ints)."""
    import pandas as pd

    vals = col.to_pandas()
    if vals.dtype.kind in ("i", "u"):
        # splitmix64-style scramble of integer keys (vectorized)
        h = vals.to_numpy().astype(np.uint64).copy()
        with np.errstate(over="ignore"):
            h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h = h ^ (h >> np.uint64(31))
        return h
    return pd.util.hash_array(vals.to_numpy().astype(object))


def hll_partial_batch(batch: pa.Table, *, column: str) -> pa.Table:
    """One row per batch: the batch's serialized HLL register array."""
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    regs = np.zeros(M, dtype=np.uint8)
    if len(col):
        h = _hash_column(col)
        idx = (h >> np.uint64(64 - P)).astype(np.int64)
        rest = (h << np.uint64(P)) | np.uint64(1 << (P - 1))  # sentinel bit
        # rank = #leading zeros of rest + 1, vectorized via log2
        # (rest != 0 guaranteed by the sentinel)
        lz = np.uint64(63) - np.floor(np.log2(rest.astype(np.float64))).astype(np.uint64)
        rank = (lz + np.uint64(1)).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
    return pa.table({"hll": pa.array([regs.tobytes()], pa.binary())})


def hll_merge(partials: list[bytes]) -> np.ndarray:
    regs = np.zeros(M, dtype=np.uint8)
    for buf in partials:
        regs = np.maximum(regs, np.frombuffer(buf, dtype=np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * M * M / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)  # linear counting for small cardinalities
    return float(est)


def approx_distinct(ds, column: str) -> float:
    """Approximate COUNT(DISTINCT column): partial sketch per batch →
    merge on the driver (#batches tiny rows)."""
    from functools import partial

    partials = ds.map_batches(
        partial(hll_partial_batch, column=column), batch_format="pyarrow"
    ).take_all()
    regs = hll_merge([r["hll"] for r in partials])
    return hll_estimate(regs)
