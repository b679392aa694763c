"""Character n-gram language-model perplexity scoring (the CCNet
quality signal — Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data" — scores each document with
a small LM and filters/buckets on perplexity; CCNet uses a KenLM
5-gram, this engine trains its own char-n-gram model distributed).

Two corpus passes, both shuffle-light:

1. ``train_char_lm``: per-batch vectorized char-gram hashing (bytes
   view + rolling multiply-xor, NO per-char Python) emits
   (gram_hash, count) partials for order n AND n-1; ONE bucketed
   hash aggregate sums them; top-V truncation (the q26 pattern —
   driver/broadcast memory is O(V) at any corpus scale, tail grams
   fall back to the smoothing floor). The model is two sorted
   uint64 arrays + count vectors, broadcast via ``ray.put``.
2. ``perplexity_batch``: per doc, add-alpha smoothed conditional
   log-probs  log((c_n + a) / (c_ctx + a*A))  looked up with two
   ``np.searchsorted`` probes over the broadcast arrays; perplexity =
   exp(-mean logp). Zero shuffle.

Scoring is deterministic given the count tables (integer counts,
float math row-local); the query is rows-only because log/exp have no
bit-stable SQL mirror. Hash identity stands in for gram identity
(64-bit, the repo convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MULT = np.uint64(0x9E3779B97F4A7C15)
_SEP = 0  # doc-boundary byte; never occurs in utf-8 text


def _char_gram_hashes(texts: list, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All order-n char-gram hashes for a batch.

    Returns (flat hashes, grams-per-doc). Windows never cross doc
    boundaries (a NUL separator poisons crossing windows, which are
    then masked out by position bookkeeping)."""
    if not texts:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    bufs = [t.encode("utf-8", "ignore") for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    joined = b"\x00".join(bufs)
    a = np.frombuffer(joined, dtype=np.uint8).astype(np.uint64)
    total = len(a)
    g_counts = np.maximum(lens - n + 1, 0)
    if total < n or int(g_counts.sum()) == 0:
        return np.zeros(0, np.uint64), np.zeros(len(texts), np.int64)
    # seed the rolling hash with the order so order-n and order-(n-1)
    # grams live in disjoint hash spaces: the count aggregate keys on
    # the hash alone, and an unsalted cross-order collision would merge
    # an n-gram's count into a context gram's count
    acc = np.full(total - n + 1, np.uint64(n), np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            acc = acc * _MULT ^ a[j : total - n + 1 + j]
    # valid window start positions: within-doc offsets only
    doc_starts = np.concatenate([[0], np.cumsum(lens[:-1] + 1)])
    starts = np.concatenate(
        [ds + np.arange(c) for ds, c in zip(doc_starts, g_counts)]
    ).astype(np.int64) if len(texts) else np.zeros(0, np.int64)
    return acc[starts], g_counts


def _count_partials(batch: pa.Table, *, n: int) -> pa.Table:
    texts = batch["text"].to_pylist()
    out_h, out_c, out_o = [], [], []
    for order in (n, n - 1):
        flat, _ = _char_gram_hashes(texts, order)
        if len(flat):
            u, c = np.unique(flat, return_counts=True)
            out_h.append(u)
            out_c.append(c.astype(np.int64))
            out_o.append(np.full(len(u), order, np.int8))
    if not out_h:
        return pa.table(
            {"h": pa.array([], pa.uint64()), "c": pa.array([], pa.int64()),
             "order": pa.array([], pa.int8())}
        )
    return pa.table(
        {
            "h": pa.array(np.concatenate(out_h)),
            "c": pa.array(np.concatenate(out_c)),
            "order": pa.array(np.concatenate(out_o)),
        }
    )


def train_char_lm(ds, *, n: int = 3, top_v: int = 1_000_000):
    """-> model dict {n, alpha_space, hi/lo sorted hash arrays +
    counts}. Distributed: combiner partials + one bucketed aggregate +
    per-block top-V candidate prune (global top-V ⊆ union of block
    top-V since each hash lives in one block)."""
    from functools import partial

    from ..shuffle import bucketed_aggregate

    parts = ds.map_batches(
        partial(_count_partials, n=n), batch_format="pyarrow"
    )
    agg = bucketed_aggregate(parts, "h", {"c": ("c", "sum"), "order": ("order", "max")})

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        keep = []
        for order, g in df.groupby("order"):
            if len(g) > top_v:
                g = g.sort_values(["c", "h"], ascending=[False, True]).head(top_v)
            keep.append(g)
        return pd.concat(keep) if keep else df

    cand = agg.map_batches(local_top, batch_format="pandas").to_pandas()
    model = {"n": n}
    for key, order in (("hi", n), ("lo", n - 1)):
        g = cand[cand["order"] == order]
        if len(g) > top_v:
            g = g.sort_values(["c", "h"], ascending=[False, True]).head(top_v)
        g = g.sort_values("h")
        model[key + "_h"] = g["h"].to_numpy().astype(np.uint64)
        model[key + "_c"] = g["c"].to_numpy().astype(np.int64)
    return model


def _lookup(h: np.ndarray, table_h: np.ndarray, table_c: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(table_h, h)
    pos = np.clip(pos, 0, len(table_h) - 1) if len(table_h) else pos
    if not len(table_h):
        return np.zeros(len(h), np.int64)
    hit = table_h[pos] == h
    out = np.zeros(len(h), np.int64)
    out[hit] = table_c[pos[hit]]
    return out


def perplexity_batch(batch: pa.Table, *, model: dict, alpha: float = 1.0, alphabet: int = 256) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_grams, logprob_mean, perplexity)."""
    texts = batch["text"].to_pylist()
    n = model["n"]
    hi_flat, g_counts = _char_gram_hashes(texts, n)
    # context hash of each gram = hash of its first n-1 chars: recompute
    # per doc with the lower order and align (context i pairs gram i)
    lo_flat, lo_counts = _char_gram_hashes(texts, n - 1)
    # per doc, gram i's context is lower-order window i (same start)
    doc_hi_off = np.concatenate([[0], np.cumsum(g_counts)])
    doc_lo_off = np.concatenate([[0], np.cumsum(lo_counts)])
    ctx_idx = np.concatenate(
        [
            doc_lo_off[i] + np.arange(g_counts[i])
            for i in range(len(texts))
        ]
    ).astype(np.int64) if len(texts) else np.zeros(0, np.int64)
    c_hi = _lookup(hi_flat, model["hi_h"], model["hi_c"])
    c_lo = _lookup(lo_flat[ctx_idx] if len(lo_flat) else lo_flat, model["lo_h"], model["lo_c"])
    logp = np.log((c_hi + alpha) / (c_lo + alpha * alphabet))
    n_docs = len(texts)
    # pad one zero so offsets == len(logp) (trailing zero-gram docs)
    # are valid WITHOUT stealing the previous doc's last gram (the
    # failure mode of clamping); empty segments repeat the pad -> masked
    padded = np.append(logp, 0.0)
    sums = (
        np.add.reduceat(padded, doc_hi_off[:-1]) if len(logp) else np.zeros(n_docs)
    )
    sums = np.where(g_counts > 0, sums, 0.0)
    mean = np.where(g_counts > 0, sums / np.maximum(g_counts, 1), 0.0)
    ppl = np.exp(-mean)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_grams": pa.array(g_counts),
            "logprob_mean": pa.array(mean, pa.float64()),
            "perplexity": pa.array(ppl, pa.float64()),
        }
    )


def lm_perplexity(ds, *, n: int = 3, top_v: int = 1_000_000, alpha: float = 1.0):
    """Train on the corpus, score the corpus (the CCNet loop trains on
    a reference corpus; same machinery, two Datasets)."""
    import ray

    from functools import partial

    model = train_char_lm(ds, n=n, top_v=top_v)
    model_ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        return perplexity_batch(t, model=m, alpha=alpha)

    return ds.map_batches(score, batch_format="pyarrow")
