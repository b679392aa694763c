"""Corpus sampling / chunking / packing operators.

The reference's only sampling is the randomized per-iteration training
draw (`/root/reference/README.md:184`, ocropus_rtrain) already modeled
in `stages/lstm.py`; these are the corpus-level selection operators a
large-scale training-data pipeline needs on top, expressed
Ray-Data-first:

- `stratified_sample` / `sample_fraction`: deterministic-hash filters —
  pure `map_batches`, ZERO shuffle, reproducible across runs and
  engines (the hash is plain modular arithmetic, so the DuckDB oracle
  computes the identical selection).
- `sample_per_group`: exact smallest-k-hash-per-group via a two-level
  tree top-k — per-block partial top-k, then ONE tiny reduce over
  k x groups x blocks rows. No global sort, no groupby shuffle.
- `chunk_documents`: fixed-token-window splitting (doc -> chunk rows),
  one vectorized kernel per batch.
- `pack_sequences`: greedy block-local sequence packing for LLM
  training (concat-and-bound, never splitting a chunk across
  sequences). Packing is BLOCK-LOCAL by design: each block packs
  independently, so the stage stays shuffle-free and streams; the
  cost is at most one underfull trailing sequence per block, which at
  128 MB blocks is noise in the fill ratio (reported per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Knuth's multiplicative hash over a 32-bit ring. Chosen over a "real"
# hash (siphash etc.) because the selection rule must be expressible
# EXACTLY in ANSI SQL for the oracle: (id * 2654435761) % 2^32 is one
# multiply and one modulo on both sides. Products stay < 2^63 for ids
# up to ~3.4e9; beyond that (full 100-TB id space) callers should
# pre-fold ids into 32 bits the same way on both sides.
KNUTH = 2654435761
_RING = 1 << 32


def knuth_hash32(ids: np.ndarray) -> np.ndarray:
    """(id * KNUTH) mod 2^32 as int64 — the shared engine/oracle hash."""
    return (ids.astype(np.int64) * KNUTH) % _RING


def sample_fraction(ds, rate: float, *, id_col: str = "doc_id"):
    """Keep a deterministic `rate` fraction of rows by id hash."""
    thr = int(rate * _RING)

    def keep(t: pa.Table) -> pa.Table:
        h = knuth_hash32(t[id_col].to_numpy())
        return t.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds,
    rates: dict[str, float],
    *,
    key: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
):
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 20% of English, 100% of low-resource languages).

    A row survives iff hash32(id) < rate[stratum] * 2^32. One stateless
    `map_batches` filter — no shuffle, no state, trivially resumable.
    The rates dict is tiny and ships inside the task closure.
    """
    keys = pa.array(list(rates.keys()), pa.string())
    thrs = np.array(
        [int(v * _RING) for v in rates.values()] + [int(default_rate * _RING)],
        dtype=np.int64,
    )

    def keep(t: pa.Table) -> pa.Table:
        h = knuth_hash32(t[id_col].to_numpy())
        idx = (
            pc.fill_null(pc.index_in(t[key], keys), len(thrs) - 1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return t.filter(pa.array(h < thrs[idx]))

    return ds.map_batches(keep, batch_format="pyarrow")


def _topk_per_group(df: pd.DataFrame, group: str, k: int) -> pd.DataFrame:
    df = df.sort_values(["__h", "__id"], kind="mergesort")
    return df.groupby(group, sort=False).head(k)


def sample_per_group(ds, k: int, *, group: str = "lang", id_col: str = "doc_id"):
    """EXACT k rows per group: the k smallest hash32(id) values (ties
    broken by id) in each group — a deterministic reservoir sample.

    Tree top-k: each block keeps its own per-group top-k (vectorized
    sort + groupby-head), then one reduce over the tiny partials
    (k x groups x blocks rows) repeats the same kernel. The reduce input
    is bounded by block COUNT, not data size, so the stage scales to
    any corpus; only the selected rows ever move.
    """
    import functools

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(__h=knuth_hash32(df[id_col].to_numpy()), __id=df[id_col])
        return _topk_per_group(df, group, k)

    part = ds.map_batches(partial, batch_format="pandas")
    final = part.repartition(1).map_batches(
        functools.partial(_final_topk, group=group, k=k), batch_format="pandas"
    )
    return final


def _final_topk(df: pd.DataFrame, *, group: str, k: int) -> pd.DataFrame:
    return _topk_per_group(df, group, k).drop(columns=["__h", "__id"])


def _token_counts(text_col) -> np.ndarray:
    """Tokens = single-space-separated words (corpus convention shared
    with dedup shingles and q20's token counter)."""
    n = pc.add(pc.count_substring(text_col, " "), 1)
    return n.to_numpy(zero_copy_only=False).astype(np.int64)


def chunk_documents(
    ds, *, chunk_tokens: int = 128, id_col: str = "doc_id", text_col: str = "text"
):
    """Split each document's token stream into fixed windows: one row
    per (doc, chunk) with the chunk's token count (the last chunk holds
    the remainder). Pure per-batch expansion — no shuffle."""
    L = int(chunk_tokens)

    def expand(t: pa.Table) -> pa.Table:
        n = _token_counts(t[text_col])
        n_chunks = -(-n // L)  # ceil; n >= 1 always (empty text -> 1 token "")
        idx = np.repeat(np.arange(len(n)), n_chunks)
        total = int(n_chunks.sum())
        chunk_no = np.arange(total) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        size = np.minimum(np.repeat(n, n_chunks) - chunk_no * L, L)
        return pa.table(
            {
                id_col: t[id_col].take(pa.array(idx)),
                "chunk_no": pa.array(chunk_no.astype(np.int64)),
                "n_tokens": pa.array(size.astype(np.int64)),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow")


def _greedy_boundaries(sizes: np.ndarray, cap: int) -> np.ndarray:
    """Start index of each packed sequence under greedy order-preserving
    packing (each piece <= cap). O(n_sequences) searchsorted steps on
    one prefix-sum — no per-piece Python loop."""
    cs = np.cumsum(sizes)
    starts = [0]
    base = 0
    while True:
        j = int(np.searchsorted(cs, base + cap, side="right"))
        if j >= len(sizes):
            break
        starts.append(j)
        base = cs[j - 1]
    return np.array(starts, dtype=np.int64)


def pack_sequences(
    ds, *, seq_len: int = 1024, id_col: str = "doc_id", text_col: str = "text"
):
    """Greedy block-local packing of documents into fixed-length
    training sequences. Documents longer than `seq_len` are first split
    into chunks (never crossing a sequence boundary), then chunks are
    packed in order until the next one would overflow.

    Output: one row per packed sequence — (seq_id, n_pieces, n_docs,
    n_tokens, fill). seq_id is `firstdoc:firstchunk`, deterministic
    given the block layout. Conservation invariants (sum of n_tokens ==
    sum of doc tokens; every fill <= 1) are tested, the layout itself
    is block-dependent by design (see module docstring).
    """
    L = int(seq_len)

    def pack(t: pa.Table) -> pa.Table:
        n = _token_counts(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n_chunks = -(-n // L)
        doc_idx = np.repeat(np.arange(len(n)), n_chunks)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table(
                {
                    "seq_id": pa.array([], pa.string()),
                    "n_pieces": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "fill": pa.array([], pa.float64()),
                }
            )
        chunk_no = np.arange(total) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        sizes = np.minimum(np.repeat(n, n_chunks) - chunk_no * L, L)
        starts = _greedy_boundaries(sizes, L)
        ends = np.append(starts[1:], total)
        cs0 = np.concatenate([[0], np.cumsum(sizes)])
        seq_tokens = cs0[ends] - cs0[starts]
        n_docs = np.array(
            [len(np.unique(doc_idx[s:e])) for s, e in zip(starts, ends)], np.int64
        )
        seq_ids = [
            f"{ids[doc_idx[s]]}:{chunk_no[s]}" for s in starts
        ]
        return pa.table(
            {
                "seq_id": pa.array(seq_ids, pa.string()),
                "n_pieces": pa.array(ends - starts),
                "n_docs": pa.array(n_docs),
                "n_tokens": pa.array(seq_tokens.astype(np.int64)),
                "fill": pa.array(seq_tokens / L),
            }
        )

    return ds.map_batches(pack, batch_format="pyarrow")
