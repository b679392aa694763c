"""Corpus curation compose: the FineWeb/RefinedWeb-style quality gate
(Penedo et al. 2024, "The FineWeb Datasets") as ONE pipeline —
Gopher A1.1 quality rules + A1.2 repetition rules + exact-dedup
canonicalization, with a per-doc keep decision and the stage that
dropped it.

Shape: one row-local fused feature pass (both Gopher kernels share a
batch — no extra corpus scan), ONE content-hash exchange for the
canonical flag (tuple rows: hash + doc_id, not documents), and one
doc_id-keyed join to combine them. Every decision is integer/boolean,
so the q56 oracle reproduces the whole pipeline — including the
precedence of the drop stages — exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _feature_batch(batch: pa.Table, *, gopher_kwargs: dict, repetition_kwargs: dict) -> pa.Table:
    from .textops import gopher_quality_batch, repetition_stats_batch

    g = gopher_quality_batch(batch, **gopher_kwargs)
    r = repetition_stats_batch(batch, **repetition_kwargs)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pass_gopher": g["pass_filter"],
            "pass_repetition": r["pass_filter"],
        }
    )


def curate_corpus(ds, *, gopher_kwargs: dict | None = None, repetition_kwargs: dict | None = None):
    """documents(doc_id, text) -> (doc_id, pass_gopher,
    pass_repetition, is_canonical, keep, drop_stage).

    drop_stage precedence (first failing gate wins, FineWeb ordering):
    'gopher' -> 'repetition' -> 'duplicate' -> 'kept'. Threshold
    kwargs pass straight through to the two gate kernels (corpora with
    constrained vocabularies need e.g. a lower distinct-stopword
    floor)."""
    from functools import partial

    from ..shuffle import bucketed_groupby, hash_join
    from .dedup import add_content_hash

    feats = ds.map_batches(
        partial(
            _feature_batch,
            gopher_kwargs=gopher_kwargs or {},
            repetition_kwargs=repetition_kwargs or {},
        ),
        batch_format="pyarrow",
    )

    hashed = ds.select_columns(["doc_id", "text"]).map_batches(
        add_content_hash, batch_format="pyarrow"
    ).select_columns(["doc_id", "content_hash"])

    def canon_flags(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values("doc_id", kind="mergesort")
        winner = ~b.duplicated("content_hash", keep="first")
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "is_canonical": winner.to_numpy().astype(np.int32),
            }
        )

    canon = bucketed_groupby(hashed, "content_hash", canon_flags, whole_bucket=True)

    joined = hash_join(feats, canon, on="doc_id")

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        pg = df["pass_gopher"].to_numpy().astype(np.int32)
        pr = df["pass_repetition"].to_numpy().astype(np.int32)
        ic = df["is_canonical"].to_numpy().astype(np.int32)
        keep = ((pg == 1) & (pr == 1) & (ic == 1)).astype(np.int32)
        stage = np.where(
            pg == 0,
            "gopher",
            np.where(pr == 0, "repetition", np.where(ic == 0, "duplicate", "kept")),
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "pass_gopher": pg,
                "pass_repetition": pr,
                "is_canonical": ic,
                "keep": keep,
                "drop_stage": stage,
            }
        )

    return joined.map_batches(decide, batch_format="pandas")
