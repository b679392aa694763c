"""Model-based document quality scoring: a linear classifier over
hashed bag-of-words features, trained distributed in closed form.

CCNet (Wenzek et al. 2020) and FineWeb-Edu (Penedo et al. 2024) gate
corpora with a trained quality model (fastText / linear head). This
module is that stage built Ray-Data-first with an EXACTLY deterministic
training pass:

1. features: word unigrams hashed into D buckets; a document is the
   integer count vector of its buckets (plus a constant bias bucket).
2. training (ridge regression on a 0/1 label — a linear probability
   model): the sufficient statistics A = XᵀX and b = Xᵀy are INTEGER
   sums, so partial accumulation is order-independent and the model is
   bit-deterministic regardless of block arrival order. Each block
   emits its nonzero A entries as COO rows (i·D+j, count) — at most
   D(D+1)/2 + D rows per block however large the corpus — reduced with
   ONE bounded bucketed exchange; the driver materializes only the
   ≤D² reduced rows and solves (A + λI)w = b once with numpy.
3. scoring: broadcast w via ``ray.put``; one streamed pass computes
   score = x·w per document (bincount + dot, no Python loop).

D defaults to 256: A is ≤64 Ki entries, the solve is microseconds, and
the exchange payload is capped at (blocks × 64 Ki) rows pre-reduce —
a fixed-size reduce at any corpus scale, same philosophy as
``stages/dsir.py``'s hashed-feature stats.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa


def _doc_count_matrix(texts: list, d: int) -> np.ndarray:
    """Batch of texts -> dense (n, d+1) int64 count matrix; the last
    column is the constant bias feature. Vectorized: one hash_array
    pass over all words, one bincount over (doc, bucket) pairs."""
    words_per_doc = [t.split(" ") if t else [] for t in texts]
    wc = np.array([len(ws) for ws in words_per_doc], dtype=np.int64)
    n = len(texts)
    x = np.zeros((n, d + 1), dtype=np.int64)
    x[:, d] = 1
    total = int(wc.sum())
    if total:
        all_words = np.asarray(
            [w for ws in words_per_doc for w in ws], dtype=object
        )
        bucket = (pd.util.hash_array(all_words).astype(np.uint64) % np.uint64(d)).astype(
            np.int64
        )
        doc_of_word = np.repeat(np.arange(n), wc)
        flat = np.bincount(doc_of_word * (d + 1) + bucket, minlength=n * (d + 1))
        x += flat.reshape(n, d + 1)
        x[:, d] = 1  # bias stays exactly 1 (bucket d is never hashed to)
    return x


def _suffstats_partial(
    batch: pa.Table, *, d: int, label_col: str, label_value
) -> pa.Table:
    """Per-block COO partial of A = XᵀX (upper triangle) and b = Xᵀy.
    Row key: i·(d+1)+j for A entries, -(i+1) for b entries."""
    texts = batch["text"].to_pylist()
    y = np.asarray(
        [v == label_value for v in batch[label_col].to_pylist()], dtype=np.int64
    )
    x = _doc_count_matrix(texts, d)
    a = x.T @ x  # (d+1, d+1) int64 — exact
    b = x.T @ y
    iu, ju = np.triu_indices(d + 1)
    av = a[iu, ju]
    nz = av != 0
    keys = (iu[nz] * (d + 1) + ju[nz]).astype(np.int64)
    vals = av[nz]
    bnz = b != 0
    bkeys = -(np.flatnonzero(bnz) + 1).astype(np.int64)
    return pa.table(
        {
            "k": pa.array(np.concatenate([keys, bkeys])),
            "v": pa.array(np.concatenate([vals, b[bnz]])),
        }
    )


def train_quality_clf(
    ds,
    *,
    d: int = 256,
    label_col: str = "lang",
    label_value="en",
    ridge: float = 1.0,
) -> dict:
    """documents(text, <label_col>) -> model dict {d, w}. One corpus
    pass (integer COO sufficient-statistic partials) + one bounded
    exchange + a (d+1)×(d+1) driver solve. Bit-deterministic."""
    from ..shuffle import bucketed_aggregate

    parts = ds.map_batches(
        partial(_suffstats_partial, d=d, label_col=label_col, label_value=label_value),
        batch_format="pyarrow",
    )
    red = bucketed_aggregate(parts, "k", {"v": ("v", "sum")}).to_pandas()
    dim = d + 1
    a = np.zeros((dim, dim), dtype=np.float64)
    b = np.zeros(dim, dtype=np.float64)
    ak = red[red["k"] >= 0]
    i, j = ak["k"].to_numpy() // dim, ak["k"].to_numpy() % dim
    a[i, j] = ak["v"].to_numpy()
    a[j, i] = ak["v"].to_numpy()  # mirror the stored upper triangle
    bk = red[red["k"] < 0]
    b[(-bk["k"].to_numpy() - 1)] = bk["v"].to_numpy()
    w = np.linalg.solve(a + ridge * np.eye(dim), b)
    return {"d": d, "w": w}


def score_quality(ds, model: dict, *, threshold: float = 0.5):
    """documents(doc_id, text) -> (doc_id, quality_score, keep_quality).
    Broadcast weights, one streamed bincount+dot pass per batch."""
    import ray

    d = int(model["d"])
    w_ref = ray.put(np.asarray(model["w"], dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        x = _doc_count_matrix(batch["text"].to_pylist(), d)
        s = x @ w
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "quality_score": pa.array(s, pa.float64()),
                "keep_quality": pa.array(s >= threshold),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def quality_pipeline(ds, *, d: int = 256, label_col: str = "lang", label_value="en", ridge: float = 1.0, threshold: float = 0.5):
    """Train on the corpus's own weak labels, then score every doc —
    the CCNet pattern (train on 'looks like target' labels, score all).
    The input is consumed twice (train pass + score pass), so it is
    materialized here once: lazy inputs would re-execute their whole
    upstream (read + transforms) for the second pass."""
    ds = ds.materialize()
    model = train_quality_clf(
        ds, d=d, label_col=label_col, label_value=label_value, ridge=ridge
    )
    return score_quality(ds, model, threshold=threshold)
