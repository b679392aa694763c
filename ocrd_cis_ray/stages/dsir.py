"""DSIR importance weighting (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"): score every raw document
by how target-like its hashed n-gram profile is, so a training-data
pipeline can resample raw web data toward a target domain.

Shape (both passes stream, zero shuffle):

1. ``dsir_feature_stats``: hashed word {1,2}-gram features into B
   buckets; ONE streamed pass emits per-batch (B,)-vector partials for
   the TARGET distribution (rows matching the predicate column) and
   the RAW distribution (all rows) — 2·B ints per block, summed
   driver-side (B is a few thousand: a fixed-size reduce at any
   corpus scale).
2. ``dsir_weights``: broadcast the smoothed log-ratio vector
   log(p_target[f] / p_raw[f]); per doc, log w = Σ_f c_f(x)·ratio[f]
   — one bincount + one dot per batch.

The paper then samples ∝ w with Gumbel noise; this engine keeps the
deterministic part (the weights + a rank) and leaves sampling to the
seeded samplers in stages/sampling.py. Rows-only (log); pytest pins
the weights against a brute-force recomputation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MULT = np.uint64(0x9E3779B97F4A7C15)


def _doc_feature_hashes(texts: list, buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """Flat bucket ids of word unigrams + bigrams for a batch, plus
    features-per-doc counts. Vectorized: one hash_array pass over all
    words + a rolling combine for bigrams."""
    words_per_doc = [t.split(" ") if t else [] for t in texts]
    wc = np.array([len(ws) for ws in words_per_doc], dtype=np.int64)
    total = int(wc.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(len(texts), np.int64)
    all_words = np.asarray([w for ws in words_per_doc for w in ws], dtype=object)
    wh = pd.util.hash_array(all_words).astype(np.uint64)
    uni = wh
    # bigrams within docs: combine adjacent word hashes, mask doc ends
    with np.errstate(over="ignore"):
        big = wh[:-1] * _MULT ^ wh[1:] if total > 1 else np.zeros(0, np.uint64)
    doc_of_word = np.repeat(np.arange(len(texts)), wc)
    valid_bi = doc_of_word[:-1] == doc_of_word[1:] if total > 1 else np.zeros(0, bool)
    feats = np.concatenate([uni, big[valid_bi]])
    feat_doc = np.concatenate([doc_of_word, doc_of_word[:-1][valid_bi]])
    order = np.argsort(feat_doc, kind="stable")
    per_doc = np.bincount(feat_doc, minlength=len(texts)).astype(np.int64)
    return (feats[order] % np.uint64(buckets)).astype(np.int64), per_doc


def _stats_partial(batch: pa.Table, *, buckets: int, target_col: str, target_value) -> pa.Table:
    texts = batch["text"].to_pylist()
    tgt = np.asarray(
        [v == target_value for v in batch[target_col].to_pylist()], dtype=bool
    )
    feats, per_doc = _doc_feature_hashes(texts, buckets)
    doc_of_feat = np.repeat(np.arange(len(texts)), per_doc)
    raw = np.bincount(feats, minlength=buckets).astype(np.int64)
    target = np.bincount(
        feats[tgt[doc_of_feat]], minlength=buckets
    ).astype(np.int64)
    return pa.table(
        {
            "bucket": pa.array(np.arange(buckets, dtype=np.int64)),
            "target_c": pa.array(target),
            "raw_c": pa.array(raw),
        }
    )


def dsir_feature_stats(ds, *, buckets: int = 4096, target_col: str = "lang", target_value="en"):
    """-> (target counts, raw counts), each a (buckets,) int vector."""
    from functools import partial

    p = ds.map_batches(
        partial(
            _stats_partial,
            buckets=buckets,
            target_col=target_col,
            target_value=target_value,
        ),
        batch_format="pyarrow",
    ).to_pandas()
    g = p.groupby("bucket")[["target_c", "raw_c"]].sum()
    g = g.reindex(range(buckets), fill_value=0)
    return g["target_c"].to_numpy(), g["raw_c"].to_numpy()


def dsir_weights(ds, *, buckets: int = 4096, target_col: str = "lang", target_value="en", alpha: float = 0.5):
    """documents(doc_id, text, <target_col>) -> (doc_id, n_features,
    log_weight). log_weight > 0 ⇒ more target-like than raw-average."""
    import ray

    from functools import partial

    target_c, raw_c = dsir_feature_stats(
        ds, buckets=buckets, target_col=target_col, target_value=target_value
    )
    pt = (target_c + alpha) / (target_c.sum() + alpha * buckets)
    pr = (raw_c + alpha) / (raw_c.sum() + alpha * buckets)
    ratio_ref = ray.put(np.log(pt / pr))

    def score(batch: pa.Table) -> pa.Table:
        ratio = ray.get(ratio_ref)
        texts = batch["text"].to_pylist()
        feats, per_doc = _doc_feature_hashes(texts, buckets)
        off = np.concatenate([[0], np.cumsum(per_doc)])
        # pad one zero so offsets == len(vals) (trailing zero-feature
        # docs) are valid reduceat indices WITHOUT corrupting the
        # previous doc's segment (a clamped offset would steal its last
        # element); empty segments still repeat the pad -> masked below
        vals = np.append(ratio[feats], 0.0)
        sums = np.add.reduceat(vals, off[:-1]) if len(feats) else np.zeros(len(texts))
        w = np.where(per_doc > 0, sums, 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_features": pa.array(per_doc),
                "log_weight": pa.array(w, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
