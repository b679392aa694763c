"""BM25 full-text retrieval over a documents table.

The reference engine has no retrieval component (its lookup surface is
the alignment/GT joins, align/cli.py); a training-data engine needs
one — quality-filter mining, prompt retrieval, and decontamination
lookups are all "score docs against a small query set" problems.

Ray-Data-first shape (NO inverted-index shuffle):

- the query set is tiny and broadcast; scoring needs per-doc term
  frequencies of QUERY terms only, so the corpus is never exploded
  into a (term, doc) postings exchange;
- pass 1 streams the corpus once and reduces (df per query term,
  n_docs, total words) — a per-batch partial of ~|terms| rows, summed
  driver-side (tiny reduce, same pattern as the chain's lexicon);
- pass 2 streams the corpus again scoring each doc against all
  queries vectorized (one ``pc.index_in`` over the flattened words +
  a dense (docs x terms) tf grid), keeps a block-local top-k per
  query, and a final single tiny partition ranks the survivors.
  Per-block candidate volume is k x n_queries rows — constant in
  corpus size, so the reduce never grows.

Determinism / oracle parity (q49): scores use RATIONAL-idf BM25
(Robertson idf without the log: ``(N - df + 0.5) / (df + 0.5)``) so
every term score is a chain of exactly-rounded IEEE-754 ops that
DuckDB reproduces bit-for-bit, and each term score is floored to
integer micro-points BEFORE summation — integer addition is
order-independent, so the per-doc score is identical regardless of
execution order. Ties rank by doc_id ascending.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

K1 = 1.2
B = 0.75
SCALE = 1000000.0

DEFAULT_QUERIES = (
    "hash join merge",
    "spark fast query",
    "window agg stream",
    "sort order key",
)


def _query_terms(queries) -> tuple[list[str], np.ndarray]:
    """Distinct term list (sorted) + (n_queries, n_terms) incidence."""
    per_q = [q.split() for q in queries]
    terms = sorted({t for ts in per_q for t in ts})
    idx = {t: i for i, t in enumerate(terms)}
    inc = np.zeros((len(queries), len(terms)), dtype=np.int64)
    for qi, ts in enumerate(per_q):
        for t in ts:
            inc[qi, idx[t]] = 1  # repeated query terms count once
    return terms, inc


def _stats_partial(batch: pa.Table, *, terms: list[str]) -> pa.Table:
    """Per-batch (df per term, docs, words) partial — ~|terms| rows."""
    text = batch["text"]
    n = len(batch)
    words = pc.split_pattern(text, " ")
    flat = pc.list_flatten(words)
    wc = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    codes = pc.index_in(flat, pa.array(terms)).to_numpy(zero_copy_only=False)
    hit = ~np.isnan(codes)
    codes_i = np.nan_to_num(codes, nan=-1).astype(np.int64)
    doc_of_word = np.repeat(np.arange(n, dtype=np.int64), wc)
    grid = np.zeros((n, len(terms)), dtype=bool)
    grid[doc_of_word[hit], codes_i[hit]] = True
    t = len(terms)
    docs = np.zeros(t, np.int64)
    docs[0] = n
    word_tot = np.zeros(t, np.int64)
    word_tot[0] = int(wc.sum())
    return pa.table(
        {
            "term_idx": pa.array(np.arange(t, dtype=np.int64)),
            "df": pa.array(grid.sum(axis=0).astype(np.int64)),
            "docs": pa.array(docs),
            "words": pa.array(word_tot),
        }
    )


def corpus_term_stats(ds, terms: list[str]):
    """ONE streamed pass -> (df vector, n_docs, avgdl). The reduce is
    |terms| rows per block — driver-side sum is a tiny fixed-size
    frame at any corpus scale."""
    from functools import partial

    p = ds.map_batches(
        partial(_stats_partial, terms=terms), batch_format="pyarrow"
    ).to_pandas()
    df = (
        p.groupby("term_idx")["df"].sum().reindex(range(len(terms)), fill_value=0)
    ).to_numpy()
    n_docs = int(p["docs"].sum())
    n_words = int(p["words"].sum())
    avgdl = n_words / n_docs  # int/int true-divide == SQL DOUBLE/BIGINT
    return df.astype(np.int64), n_docs, avgdl


def _score_batch(
    batch: pa.Table,
    *,
    terms: list[str],
    inc: np.ndarray,
    df: np.ndarray,
    n_docs: int,
    avgdl: float,
    k: int,
) -> pa.Table:
    """Score every doc in the batch against all queries; emit the
    block-local top-k rows per query."""
    text = batch["text"]
    n = len(batch)
    t = len(terms)
    words = pc.split_pattern(text, " ")
    flat = pc.list_flatten(words)
    wc = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    codes = pc.index_in(flat, pa.array(terms)).to_numpy(zero_copy_only=False)
    hit = ~np.isnan(codes)
    codes_i = np.nan_to_num(codes, nan=-1).astype(np.int64)
    doc_of_word = np.repeat(np.arange(n, dtype=np.int64), wc)
    tf = np.zeros((n, t), dtype=np.float64)
    np.add.at(tf, (doc_of_word[hit], codes_i[hit]), 1.0)

    # exact-parity arithmetic — every op mirrors the oracle SQL's
    # expression tree: idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1 - .75
    # + .75 * (dl / avgdl))), floored to micro-ints per term
    idf = (n_docs - df + 0.5) / (df + 0.5)
    dl_ratio = wc / avgdl
    denom = tf + K1 * (1.0 - B + B * dl_ratio)[:, None]
    ts = idf[None, :] * (tf * (K1 + 1.0)) / denom
    micro = np.floor(ts * SCALE + 0.5)
    micro[tf == 0] = 0.0  # absent term contributes nothing (SQL inner join)
    score = (micro @ inc.T.astype(np.float64)).astype(np.int64)
    present = (tf > 0) @ inc.T.astype(np.float64) > 0

    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    q_idx, d_idx = np.nonzero(present.T)  # grouped by query
    scores = score[d_idx, q_idx]
    docs = doc_ids[d_idx]
    # block-local top-k per query: sort (query, -score, doc), keep
    # first k of each query run
    order = np.lexsort((docs, -scores, q_idx))
    qs = q_idx[order]
    pos = np.arange(len(qs)) - np.concatenate(
        [[0], np.cumsum(np.bincount(qs))[:-1]]
    )[qs]
    keep = order[pos < k]
    return pa.table(
        {
            "query_id": pa.array(q_idx[keep], pa.int64()),
            "doc_id": pa.array(doc_ids[d_idx[keep]]),
            "score_int": pa.array(scores[keep], pa.int64()),
        }
    )


def _final_topk(batch: pa.Table, *, k: int) -> pa.Table:
    dfr = batch.to_pandas()
    dfr = dfr.sort_values(
        ["query_id", "score_int", "doc_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    dfr["rank"] = dfr.groupby("query_id").cumcount() + 1
    out = dfr[dfr["rank"] <= k].reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def bm25_topk(ds, queries=DEFAULT_QUERIES, *, k: int = 10):
    """documents(doc_id, text) x queries -> top-k (query_id, doc_id,
    score_int, rank). Two streamed passes (stats, score+prune) and one
    constant-size final reduce; zero corpus shuffle."""
    from functools import partial

    terms, inc = _query_terms(queries)
    df, n_docs, avgdl = corpus_term_stats(ds, terms)
    scored = ds.map_batches(
        partial(
            _score_batch,
            terms=terms,
            inc=inc,
            df=df,
            n_docs=n_docs,
            avgdl=avgdl,
            k=k,
        ),
        batch_format="pyarrow",
    )
    return scored.repartition(1).map_batches(
        partial(_final_topk, k=k), batch_format="pyarrow", batch_size=None
    )
