"""Word n-gram LM with Stupid Backoff (Brants et al. 2007, "Large
Language Models in Machine Translation" — THE distributed-LM-at-scale
recipe: raw counts, no discounting, a fixed backoff factor, because at
web scale smoothing buys nothing and count collection is the whole
job).

    S(w | ctx_k)   = c(ctx_k w) / c(ctx_k)      if c(ctx_k w) > 0
                   = 0.4 · S(w | ctx_{k-1})     otherwise
    S(w)           = (c(w) + 0.5) / (N + 0.5)   (unigram floor so
                                                 unseen words score
                                                 finite, documented
                                                 engine convention)

Distributed exactly like the char LM (``stages/lm.py``): ONE corpus
pass emits order-salted (gram_hash, count) partials for every order
1..n (vectorized rolling multiply-xor over per-word hashes — no
per-token Python beyond the initial split), one bucketed aggregate
sums them, per-order top-V truncation bounds driver/broadcast memory,
and scoring is a zero-shuffle ``map_batches`` with ``searchsorted``
probes + a vectorized backoff cascade (one numpy pass per order, not
per token). Hash identity stands in for gram identity (64-bit, the
repo convention).

The query is rows-only (log10 has no bit-stable SQL mirror);
``tests/test_wordlm.py`` pins a brute-force reference at 1e-9.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MULT = np.uint64(0x9E3779B97F4A7C15)
BACKOFF = 0.4


def _word_hashes(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace tokens -> (flat word-hash array with one sentinel 0
    between docs, tokens-per-doc). pd.util.hash_array is deterministic
    and vectorized over the object array."""
    words_per_doc = [t.split() if t else [] for t in texts]
    lens = np.array([len(w) for w in words_per_doc], np.int64)
    flat = [w for ws in words_per_doc for w in ws]
    if flat:
        h = pd.util.hash_array(np.asarray(flat, object)).astype(np.uint64)
        h[h == 0] = np.uint64(1)  # keep 0 free for the doc sentinel
    else:
        h = np.zeros(0, np.uint64)
    # interleave sentinels: one 0 after each doc's tokens
    total = int(lens.sum())
    out = np.zeros(total + len(texts), np.uint64)
    pos = (np.cumsum(lens + 1) - 1)  # sentinel positions
    mask = np.ones(len(out), bool)
    mask[pos] = False
    out[mask] = h
    return out, lens


def _gram_ends(a: np.ndarray, k: int) -> np.ndarray:
    """Order-k gram hash ENDING at each index of ``a`` (positions with
    fewer than k predecessors or a sentinel inside the window yield 0
    = invalid; word hashes are never 0)."""
    n = len(a)
    if n < k:
        return np.zeros(n, np.uint64)
    acc = np.full(n - k + 1, np.uint64(k), np.uint64)
    ok = np.ones(n - k + 1, bool)
    with np.errstate(over="ignore"):
        for j in range(k):
            w = a[j : n - k + 1 + j]
            acc = acc * _MULT ^ w
            ok &= w != 0
    out = np.zeros(n, np.uint64)
    out[k - 1 :] = np.where(ok, acc, np.uint64(0))
    return out


def _count_partials(batch: pa.Table, *, n: int) -> pa.Table:
    a, _ = _word_hashes(batch["text"].to_pylist())
    hs, cs, orders = [], [], []
    for k in range(1, n + 1):
        g = _gram_ends(a, k)
        g = g[g != 0]
        if len(g):
            u, c = np.unique(g, return_counts=True)
            hs.append(u)
            cs.append(c.astype(np.int64))
            orders.append(np.full(len(u), k, np.int8))
    # every batch also reports its token total (order 0, hash 0) so N
    # rides the same aggregate
    n_tok = int((a != 0).sum())
    hs.append(np.array([0], np.uint64))
    cs.append(np.array([n_tok], np.int64))
    orders.append(np.array([0], np.int8))
    return pa.table(
        {
            "h": pa.array(np.concatenate(hs)),
            "c": pa.array(np.concatenate(cs)),
            "order": pa.array(np.concatenate(orders)),
        }
    )


def train_word_lm(ds, *, n: int = 3, top_v: int = 2_000_000) -> dict:
    """-> {n, total, (h, c) sorted arrays per order}. One corpus pass,
    one bucketed aggregate, per-order top-V truncation (global top-V ⊆
    union of block top-Vs since a hash lives in one block)."""
    from functools import partial

    from ..shuffle import bucketed_aggregate

    parts = ds.map_batches(partial(_count_partials, n=n), batch_format="pyarrow")
    agg = bucketed_aggregate(
        parts, ["h", "order"], {"c": ("c", "sum")}
    )

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        keep = []
        for _, g in df.groupby("order"):
            if len(g) > top_v:
                g = g.sort_values(["c", "h"], ascending=[False, True]).head(top_v)
            keep.append(g)
        return pd.concat(keep) if keep else df

    cand = agg.map_batches(local_top, batch_format="pandas").to_pandas()
    model: dict = {"n": n}
    total = cand[cand["order"] == 0]["c"].sum()
    model["total"] = int(total)
    for k in range(1, n + 1):
        g = cand[cand["order"] == k]
        if len(g) > top_v:
            g = g.sort_values(["c", "h"], ascending=[False, True]).head(top_v)
        g = g.sort_values("h")
        model[f"h{k}"] = g["h"].to_numpy().astype(np.uint64)
        model[f"c{k}"] = g["c"].to_numpy().astype(np.int64)
    return model


def _lookup(h, table_h, table_c):
    if not len(table_h):
        return np.zeros(len(h), np.int64)
    pos = np.clip(np.searchsorted(table_h, h), 0, len(table_h) - 1)
    hit = table_h[pos] == h
    out = np.zeros(len(h), np.int64)
    out[hit] = table_c[pos[hit]]
    return out


def score_batch(batch: pa.Table, *, model: dict) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_tokens, logscore): mean log10
    Stupid-Backoff score per token. Vectorized backoff cascade: one
    pass per order over ALL token positions of the batch."""
    n = model["n"]
    total = max(model["total"], 1)
    a, lens = _word_hashes(batch["text"].to_pylist())
    tok_mask = a != 0
    P = int(tok_mask.sum())
    score = np.zeros(P)
    mult = np.ones(P)
    done = np.zeros(P, bool)
    grams = {k: _gram_ends(a, k)[tok_mask] for k in range(1, n + 1)}
    # context gram of order k-1 ENDING one position earlier: compute on
    # the full array, shift, then select token positions
    ctxs = {}
    for k in range(2, n + 1):
        g = _gram_ends(a, k - 1)
        shifted = np.concatenate([[np.uint64(0)], g[:-1]])
        ctxs[k] = shifted[tok_mask]
    for k in range(n, 1, -1):
        gk = grams[k]
        ck = ctxs[k]
        valid = ~done & (gk != 0) & (ck != 0)
        if not valid.any():
            continue
        c_num = _lookup(gk[valid], model[f"h{k}"], model[f"c{k}"])
        c_den = _lookup(ck[valid], model[f"h{k-1}"], model[f"c{k-1}"])
        hit = (c_num > 0) & (c_den > 0)
        idx = np.flatnonzero(valid)
        hit_idx = idx[hit]
        score[hit_idx] = mult[hit_idx] * c_num[hit] / c_den[hit]
        done[hit_idx] = True
        miss_idx = idx[~hit]
        mult[miss_idx] *= BACKOFF
    rest = ~done
    if rest.any():
        c1 = _lookup(grams[1][rest], model["h1"], model["c1"])
        score[rest] = mult[rest] * (c1 + 0.5) / (total + 0.5)
    logs = np.log10(score)
    # per-doc mean via reduceat over token counts
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    out = np.zeros(len(lens))
    nz = lens > 0
    if nz.any():
        sums = np.add.reduceat(logs, starts[nz]) if P else np.zeros(0)
        out[nz] = sums / lens[nz]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(lens, pa.int64()),
            "logscore": pa.array(out, pa.float64()),
        }
    )


def word_lm_scores(ds, *, n: int = 3, top_v: int = 2_000_000):
    """Train on the corpus, broadcast the count tables via ray.put,
    score every document zero-shuffle."""
    import ray
    from functools import partial

    model = train_word_lm(ds, n=n, top_v=top_v)
    ref = ray.put(model)

    def fn(t: pa.Table) -> pa.Table:
        return score_batch(t, model=ray.get(ref))

    return ds.map_batches(fn, batch_format="pyarrow")
