"""Benchmark decontamination and duplicate-n-gram statistics.

Standard large-scale training-data hygiene (the n-gram overlap rule
popularized by GPT-3/PaLM data cards, and RefinedWeb-style duplicate
n-gram fractions) over the engine's span/document tables. The
reference has no corpus-level analog (its dedup granularity is the
aligned OCR line); these extend `stages/dedup.py`'s shingle machinery
(`_batch_shingle_hashes` — one siphash pass + rolling combine, distinct
per doc) to corpus hygiene:

- `benchmark_ngram_hashes`: distill a (small) benchmark/eval set into a
  sorted uint64 n-gram hash array, built distributed and collected once
  — the ONLY driver materialization, bounded by the benchmark's size
  (eval suites are MBs, not TBs) and guarded by `max_ngrams`.
- `contamination_counts`: broadcast the benchmark array via `ray.put`
  once, then a stateless scan — per batch: explode distinct doc
  n-grams, one `np.searchsorted` membership probe, per-doc bincount.
  ZERO shuffle at any corpus size.
- `dup_ngram_stats`: per-doc duplicate-n-gram counts. Exploded
  (shingle, doc) pairs -> ONE bucketed exchange on the gram (df is
  exact inside the bucket, reduced directly to per-(doc, bucket)
  partials) -> one tiny per-doc exchange of the partials. No join, no
  materialize; the big exchange moves only (uint64, id) pairs.

64-bit hashing means oracle parity is probabilistic in principle;
with ~2^64 space a corpus needs ~10^9 distinct n-grams per expected
collision, far beyond the oracle scales (sf0.01 ~ 10^6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ocrd_cis_ray.shuffle import bucketed_aggregate
from ocrd_cis_ray.stages.dedup import _batch_shingle_hashes, shingle_batch

DEFAULT_MAX_BENCH_NGRAMS = 50_000_000  # ~400 MB broadcast ceiling


def benchmark_ngram_hashes(
    bench_ds,
    *,
    n: int = 8,
    text_col: str = "text",
    max_ngrams: int = DEFAULT_MAX_BENCH_NGRAMS,
) -> np.ndarray:
    """Sorted distinct n-gram hashes of the benchmark set.

    Distributed explode + per-block distinct, then one driver-side
    merge (the benchmark is the SMALL side by definition; `max_ngrams`
    raises rather than silently OOM the driver on a misuse)."""

    def distinct(t: pa.Table) -> pa.Table:
        flat, _ = _batch_shingle_hashes(t[text_col].to_pylist(), n)
        return pa.table({"h": pa.array(np.unique(flat))})

    col = bench_ds.map_batches(distinct, batch_format="pyarrow").to_pandas()["h"]
    merged = np.unique(col.to_numpy().astype(np.uint64))
    if merged.size > max_ngrams:
        raise ValueError(
            f"benchmark n-gram set has {merged.size} entries > max_ngrams="
            f"{max_ngrams}; this operator broadcasts the benchmark — "
            "it must be the small side"
        )
    return merged


def contamination_counts(
    ds,
    bench_hashes,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document benchmark-overlap counts: (id, n_ngrams,
    n_contaminated) where n_contaminated = how many of the doc's
    DISTINCT n-grams appear in the benchmark set.

    `bench_hashes` may be an ndarray or a `ray.ObjectRef` from
    `ray.put` (preferred: ships to each node once, zero-copy reads)."""
    ref = (
        bench_hashes
        if isinstance(bench_hashes, ray.ObjectRef)
        else ray.put(np.asarray(bench_hashes, np.uint64))
    )

    def scan(t: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        flat, lengths = _batch_shingle_hashes(t[text_col].to_pylist(), n)
        pos = np.searchsorted(bench, flat)
        pos = np.minimum(pos, max(bench.size - 1, 0))
        hit = (bench[pos] == flat) if bench.size else np.zeros(flat.size, bool)
        doc_idx = np.repeat(np.arange(len(t)), lengths)
        hits = np.bincount(doc_idx, weights=hit, minlength=len(t)).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_ngrams": pa.array(lengths),
                "n_contaminated": pa.array(hits),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def dup_ngram_stats(ds, *, n: int = 8, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document duplicate-n-gram counts: (id, n_ngrams,
    n_dup_ngrams) where a doc's n-gram is "duplicate" when it occurs in
    >= 2 DISTINCT documents corpus-wide (RefinedWeb's dup-n-gram
    fraction, reported as exact integers so the oracle compares
    losslessly)."""
    pairs = ds.map_batches(lambda t: shingle_batch(t, n=n), batch_format="pyarrow")

    # ONE bucketed exchange on the shingle: every row of a given gram
    # lands in the same bucket, so document frequency is exact inside
    # the bucket (shingle_batch emits per-doc-DISTINCT shingles, so
    # group size == df). The bucket reduces straight to per-(doc,
    # bucket) partials — no second pass over the pairs, no join.
    from ..shuffle import bucketed_groupby

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dup = (df.groupby("shingle")["shingle"].transform("size") >= 2)
        return (
            df.assign(dup=dup.to_numpy(dtype=np.int64))
            .groupby(id_col, as_index=False)
            .agg(n_dup_ngrams=("dup", "sum"), n_ngrams=("n_shingles", "first"))
        )

    partials = bucketed_groupby(pairs, "shingle", per_bucket, whole_bucket=True)
    # tiny second exchange: O(docs × buckets-touched) partial rows
    agg = bucketed_aggregate(
        partials,
        id_col,
        {"n_ngrams": ("n_ngrams", "first"), "n_dup_ngrams": ("n_dup_ngrams", "sum")},
        combine=True,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["n_dup_ngrams"] = df["n_dup_ngrams"].astype(np.int64)
        df["n_ngrams"] = df["n_ngrams"].astype(np.int64)
        return df[[id_col, "n_ngrams", "n_dup_ngrams"]]

    return agg.map_batches(finalize, batch_format="pandas")
