"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one float64 matmul of its block against
the queries and emits its block-local top-k candidates; a final
``groupby(query_id)`` over the tiny candidate set (k per query per
block) picks the global top-k. Shuffle payload = O(#blocks · q · k)
rows, independent of corpus size.

Scale path: ``ivf_topk`` — k-means-lite (seeded, few iterations) over a
sample builds ``nlist`` centroids; vectors are bucketed to their nearest
centroid (one groupby); queries probe the ``nprobe`` nearest buckets
only. Cuts the per-batch matmul by ~nlist/nprobe at a small recall cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def brute_topk(ds, query_ids, query_mat: np.ndarray, *, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding", exclude_self: bool = True):
    """Exact cosine top-k per query. Returns Dataset
    (query_id, neighbor_id, rank:int32) with deterministic
    (cosine desc, neighbor_id asc) tie-break."""
    import ray

    qref = ray.put((np.asarray(query_ids), _normalize(np.asarray(query_mat, dtype=np.float64))))

    def block_candidates(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qmat = ray.get(qref)
        ids = batch[id_col].to_numpy()
        mat = _normalize(_as_matrix(batch[vec_col]))
        sims = qmat @ mat.T  # (q, b)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            s = sims[qi]
            order = np.lexsort((ids, -s))[: k + 1]  # +1 in case self is in block
            for j in order:
                if exclude_self and ids[j] == qid:
                    continue
                out_q.append(qid)
                out_n.append(ids[j])
                out_s.append(s[j])
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_s})

    cands = ds.map_batches(block_candidates, batch_format="pandas")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "neighbor_id", "rank"]]

    return cands.groupby("query_id").map_groups(final_topk, batch_format="pandas")


class IVFIndex:
    """Driver-built coarse quantizer: seeded k-means over a sample."""

    def __init__(self, sample: np.ndarray, nlist: int = 16, iters: int = 10, seed: int = 42):
        rng = np.random.default_rng(seed)
        sample = _normalize(np.asarray(sample, dtype=np.float64))
        idx = rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)
        cents = sample[idx].copy()
        for _ in range(iters):
            assign = np.argmax(sample @ cents.T, axis=1)
            for c in range(len(cents)):
                mask = assign == c
                if mask.any():
                    v = sample[mask].mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        cents[c] = v / n
        self.centroids = cents

    def assign(self, mat: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(mat) @ self.centroids.T, axis=1)


def ivf_topk(ds, query_ids, query_mat: np.ndarray, *, k: int = 5, nlist: int = 16, nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding", sample_size: int = 2048, seed: int = 42):
    """IVF-bucketed ANN: probe only the nprobe closest centroid buckets.

    Approximate (recall < 1 when a true neighbor lives outside probed
    buckets); the scale path for ``brute_topk``.
    """
    import ray

    sample = _as_matrix(pd.DataFrame(ds.take(sample_size))[vec_col])
    index = IVFIndex(sample, nlist=nlist, seed=seed)
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    # buckets each query probes
    qsims = qmat @ index.centroids.T
    probes = np.argsort(-qsims, axis=1)[:, :nprobe]
    probe_sets = [set(p.tolist()) for p in probes]
    ref = ray.put((np.asarray(query_ids), qmat, index.centroids, probe_sets))

    def block_candidates(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qm, cents, psets = ray.get(ref)
        ids = batch[id_col].to_numpy()
        mat = _normalize(_as_matrix(batch[vec_col]))
        assign = np.argmax(mat @ cents.T, axis=1)
        sims = qm @ mat.T
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.fromiter((a in psets[qi] for a in assign), bool, len(assign))
            if not mask.any():
                continue
            s = np.where(mask, sims[qi], -np.inf)
            order = np.lexsort((ids, -s))[: k + 1]
            for j in order:
                if s[j] == -np.inf or ids[j] == qid:
                    continue
                out_q.append(qid)
                out_n.append(ids[j])
                out_s.append(s[j])
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_s})

    cands = ds.map_batches(block_candidates, batch_format="pandas")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "neighbor_id", "rank"]]

    return cands.groupby("query_id").map_groups(final_topk, batch_format="pandas")
