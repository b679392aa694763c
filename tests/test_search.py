"""BM25 retrieval: scoring parity with a readable local recomputation,
block-layout invariance of the distributed top-k, and ranking sanity."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _t(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def _brute_bm25(texts, queries, k1=1.2, b=0.75):
    """Straightforward per-doc loop implementing the documented
    rational-idf micro-int formula."""
    docs = [t.split(" ") for t in texts]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    out = {}
    for qi, q in enumerate(queries):
        terms = sorted(set(q.split()))
        for di, d in enumerate(docs):
            s = 0
            for t in terms:
                tf = d.count(t)
                if tf == 0:
                    continue
                df = sum(1 for dd in docs if t in dd)
                idf = (n - df + 0.5) / (df + 0.5)
                ts = idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * (len(d) / avgdl))
                )
                s += math.floor(ts * 1000000.0 + 0.5)
            if s or any(t in d for t in terms):
                out[(qi, di)] = s
    return out


def test_bm25_scores_match_brute_force(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.search import bm25_topk

    texts = [
        "hash join hash join fast",
        "merge sort merge sort slow table",
        "join the table with a hash key",
        "totally unrelated words only here",
        "hash hash hash hash hash",
    ]
    queries = ("hash join", "merge table")
    want = _brute_bm25(texts, queries)
    got = bm25_topk(rd.from_arrow(_t(texts)), queries, k=10).to_pandas()
    got_map = {
        (int(r.query_id), int(r.doc_id)): int(r.score_int)
        for r in got.itertuples()
    }
    assert got_map == want
    # ranks are dense per query, ordered by (score desc, doc asc)
    for qi in (0, 1):
        sub = got[got.query_id == qi].sort_values("rank")
        assert list(sub["rank"]) == list(range(1, len(sub) + 1))
        keys = list(zip(-sub["score_int"], sub["doc_id"]))
        assert keys == sorted(keys)


def test_bm25_topk_block_layout_invariant(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.search import bm25_topk

    rng = np.random.RandomState(7)
    vocab = ["hash", "join", "scan", "sort", "key", "x", "y", "z"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(5, 30)))
        for _ in range(60)
    ]
    ref = None
    for nparts in (1, 5, 17):
        ds = rd.from_arrow(_t(texts)).repartition(nparts)
        got = (
            bm25_topk(ds, ("hash join", "sort key"), k=5)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        if ref is None:
            ref = got
        else:
            pd.testing.assert_frame_equal(ref, got)
    assert (ref.groupby("query_id")["rank"].max() == 5).all()
