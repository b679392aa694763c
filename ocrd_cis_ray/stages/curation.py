"""Corpus curation compose: the FineWeb/RefinedWeb-style quality gate
(Penedo et al. 2024, "The FineWeb Datasets") as ONE pipeline —
Gopher A1.1 quality rules + A1.2 repetition rules + exact-dedup
canonicalization, with a per-doc keep decision and the stage that
dropped it.

Shape: ONE row-local fused pass computes both Gopher gates AND the
content hash (three kernels share the batch — no extra corpus scan),
then ONE content-hash exchange both picks the canonical copy per
duplicate group and emits the final decision rows. The exchange moves
(doc_id, two flags, hash) tuples — never document text — and there is
no join: the decision is completed inside the bucket. Every decision
is integer/boolean, so the q56 oracle reproduces the whole pipeline —
including the precedence of the drop stages — exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _feature_batch(batch: pa.Table, *, gopher_kwargs: dict, repetition_kwargs: dict, carry: tuple = ()) -> pa.Table:
    """doc_id + pass_gopher + pass_repetition + content_hash, one pass.
    ``carry`` columns ride along through the exchange."""
    from .dedup import add_content_hash
    from .textops import gopher_quality_batch, repetition_stats_batch

    g = gopher_quality_batch(batch, **gopher_kwargs)
    r = repetition_stats_batch(batch, **repetition_kwargs)
    h = add_content_hash(batch.select(["doc_id", "text"]))
    cols = {
        "doc_id": batch["doc_id"],
        "pass_gopher": g["pass_filter"],
        "pass_repetition": r["pass_filter"],
        "content_hash": h["content_hash"],
    }
    for c in carry:
        cols[c] = batch[c]
    return pa.table(cols)


def curate_corpus(ds, *, gopher_kwargs: dict | None = None, repetition_kwargs: dict | None = None, carry: tuple = ()):
    """documents(doc_id, text) -> (doc_id, pass_gopher,
    pass_repetition, is_canonical, keep, drop_stage).

    drop_stage precedence (first failing gate wins, FineWeb ordering):
    'gopher' -> 'repetition' -> 'duplicate' -> 'kept'. Threshold
    kwargs pass straight through to the two gate kernels (corpora with
    constrained vocabularies need e.g. a lower distinct-stopword
    floor). ``carry`` columns (e.g. the text itself) ride through the
    exchange and appear on the output rows — a consumer that wants the
    KEPT CORPUS, not just decisions, gets it without a second join
    (documents then move exactly once, the dedup-standard cost)."""
    from functools import partial

    from ..shuffle import bucketed_groupby

    feats = ds.map_batches(
        partial(
            _feature_batch,
            gopher_kwargs=gopher_kwargs or {},
            repetition_kwargs=repetition_kwargs or {},
            carry=tuple(carry),
        ),
        batch_format="pyarrow",
    )

    def decide(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values("doc_id", kind="mergesort")
        ic = (~b.duplicated("content_hash", keep="first")).to_numpy().astype(np.int32)
        pg = b["pass_gopher"].to_numpy().astype(np.int32)
        pr = b["pass_repetition"].to_numpy().astype(np.int32)
        keep = ((pg == 1) & (pr == 1) & (ic == 1)).astype(np.int32)
        stage = np.where(
            pg == 0,
            "gopher",
            np.where(pr == 0, "repetition", np.where(ic == 0, "duplicate", "kept")),
        )
        out = {
            "doc_id": b["doc_id"].to_numpy(),
            "pass_gopher": pg,
            "pass_repetition": pr,
            "is_canonical": ic,
            "keep": keep,
            "drop_stage": stage,
        }
        for c in carry:
            out[c] = b[c].to_numpy()
        return pd.DataFrame(out)

    return bucketed_groupby(feats, "content_hash", decide, whole_bucket=True)
