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
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _mat_from_arrow(col) -> np.ndarray:
    """Arrow list<float> column -> (n, dim) float64 matrix without a
    per-row Python loop: one flatten (offset-aware) + one reshape +
    one vectorized cast. Requires uniform list lengths (embedding
    columns are)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), np.float64)
    if isinstance(col.type, pa.ExtensionType):
        # Ray tensor extension (in-memory datasets): to_numpy gives (n, dim)
        arr = np.asarray(col.to_numpy(zero_copy_only=False))
        if arr.dtype == object:
            arr = np.stack(arr)
        return arr.astype(np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    dim = len(flat) // n
    return flat.reshape(n, dim).astype(np.float64)


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

    def block_candidates(batch: pa.Table) -> pd.DataFrame:
        qids, qmat = ray.get(qref)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        mat = _normalize(_mat_from_arrow(batch[vec_col]))
        sims = qmat @ mat.T  # (q, b)
        top = min(k + 1, sims.shape[1])  # +1 in case self is in block
        if top == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        # deterministic (cosine desc, id asc) block-local top-(k+1); the
        # only per-query Python is the lexsort dispatch
        rows_idx = np.empty((len(qids), top), np.int64)
        for qi in range(len(qids)):
            rows_idx[qi] = np.lexsort((ids, -sims[qi]))[:top]
        df = pd.DataFrame(
            {
                "query_id": np.repeat(np.asarray(qids), top),
                "neighbor_id": ids[rows_idx.ravel()],
                "cosine": np.take_along_axis(sims, rows_idx, axis=1).ravel(),
            }
        )
        if exclude_self:
            df = df[df["query_id"] != df["neighbor_id"]]
        return df

    cands = ds.map_batches(block_candidates, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "neighbor_id", "rank"]]

    return cands.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def _train_sample(ds, sample_size: int, vec_col: str, seed: int = 42) -> np.ndarray:
    """Codebook/quantizer training sample: randomize block order first
    (seeded — the weighted_ranges precedent in state/manifest.py) so
    take() draws from across the keyspace instead of whatever blocks
    execute first; on an id- or cluster-sorted corpus a head sample
    trains codebooks on one corner of the space and recall silently
    degrades. The caller's seed reaches the draw too, so seeded runs
    are independent where it matters (not only in k-means init)."""
    return _as_matrix(
        pd.DataFrame(ds.randomize_block_order(seed=seed).take(sample_size))[vec_col]
    )


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
    buckets); the scale path for ``brute_topk``. The inverted file is
    realized WITHIN each batch: rows are grouped by centroid assignment
    (one argsort) and each centroid group is matmul'd only against the
    queries probing it — total flops ≈ (nprobe/nlist) · q · rows · dim,
    the true IVF saving, with no extra shuffle (the corpus never moves;
    only per-block top-k candidate rows do).
    """
    import ray

    sample = _train_sample(ds, sample_size, vec_col, seed=seed)
    index = IVFIndex(sample, nlist=nlist, seed=seed)
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    # buckets each query probes → inverted: queries per centroid
    qsims = qmat @ index.centroids.T
    probes = np.argsort(-qsims, axis=1)[:, :nprobe]  # (q, nprobe)
    ncent = len(index.centroids)
    queries_of_centroid = [np.flatnonzero((probes == c).any(axis=1)) for c in range(ncent)]
    ref = ray.put((np.asarray(query_ids), qmat, index.centroids, queries_of_centroid))

    def block_candidates(batch: pa.Table) -> pd.DataFrame:
        qids, qm, cents, q_of_c = ray.get(ref)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        mat = _normalize(_mat_from_arrow(batch[vec_col]))
        assign = np.argmax(mat @ cents.T, axis=1)
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        bounds = np.searchsorted(sorted_assign, np.arange(len(cents) + 1))
        out_q, out_n, out_s = [], [], []
        for c in np.unique(sorted_assign):
            rows = order[bounds[c] : bounds[c + 1]]
            qsel = q_of_c[c]
            if len(qsel) == 0 or len(rows) == 0:
                continue
            sims = qm[qsel] @ mat[rows].T  # (|qsel|, |rows|) — probed pairs only
            top = min(k + 1, sims.shape[1])
            if top < sims.shape[1]:
                # batched argpartition across the group's queries; ties at
                # the cut are resolved arbitrarily (approximate op)
                sel = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            else:
                sel = np.broadcast_to(np.arange(sims.shape[1]), (len(qsel), sims.shape[1]))
            out_q.append(np.repeat(qids[qsel], sel.shape[1]))
            out_n.append(ids[rows[sel.ravel()]])
            out_s.append(np.take_along_axis(sims, sel, axis=1).ravel())
        if not out_q:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        df = pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "cosine": np.concatenate(out_s),
            }
        )
        return df[df["query_id"] != df["neighbor_id"]]

    cands = ds.map_batches(block_candidates, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "neighbor_id", "rank"]]

    return cands.groupby("query_id").map_groups(final_topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# Distributed k-means + SemDeDup (Abbas et al. 2023, "SemDeDup: Data-
# efficient learning at web-scale through semantic deduplication"):
# cluster the embedding space, then drop near-identical points within
# each cluster. The reference has no analog; this is the semantic
# counterpart of the hash-based dedup suite in stages/dedup.py.


def _seed_rows(ds, k: int, id_col: str, vec_col: str):
    """Deterministic init: the k rows with the smallest ids —
    block-local min-k prune, then one constant-size reduce (never a
    global sort)."""
    def local(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        idx = np.argsort(ids, kind="stable")[:k]
        return b.take(pa.array(idx))

    cand = ds.map_batches(local, batch_format="pyarrow").repartition(1)
    return cand.map_batches(local, batch_format="pyarrow", batch_size=None)


def _assign_partials(batch: pa.Table, *, cent: np.ndarray, id_col: str, vec_col: str) -> pa.Table:
    """One batch of the Lloyd step: spherical assignment (cosine) +
    per-cluster partial sums — k rows out per batch regardless of
    batch size (map-side combine)."""
    m = _normalize(_mat_from_arrow(batch[vec_col]))
    a = np.argmax(m @ cent.T, axis=1)
    k, d = cent.shape
    sums = np.zeros((k, d), np.float64)
    np.add.at(sums, a, m)
    counts = np.bincount(a, minlength=k).astype(np.int64)
    return pa.table(
        {
            "cluster": pa.array(np.arange(k, dtype=np.int64)),
            "count": pa.array(counts),
            "sum": pa.array(list(sums)),
        }
    )


def _assign_batch(batch: pa.Table, *, cent: np.ndarray, id_col: str, vec_col: str) -> pa.Table:
    m = _normalize(_mat_from_arrow(batch[vec_col]))
    sims = m @ cent.T
    a = np.argmax(sims, axis=1)
    return pa.table(
        {
            id_col: batch[id_col],
            "cluster": pa.array(a.astype(np.int64)),
            "centroid_sim": pa.array(sims[np.arange(len(a)), a]),
        }
    )


def kmeans(ds, *, k: int = 8, n_iter: int = 8, tol: float = 1e-4, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Distributed spherical k-means (cosine). Returns (assignments
    Dataset(id, cluster, centroid_sim), centroids (k, d)).

    Iterative by nature: one streamed pass per Lloyd iteration, each
    pass reducing to k (cluster, count, sum) partial rows per block —
    the driver combine is O(k·d) however large the corpus. The
    projected 2-column input is materialized ONCE so iterations rescan
    object-store blocks, not the source files. Determinism: seeds are
    the k smallest ids; partial-sum float order varies with block
    layout, so assignments are reproducible for separated data but not
    bit-pinned (rows-only query contract, like the other float-training
    outputs)."""
    from functools import partial as _p

    proj = ds.select_columns([id_col, vec_col]).materialize()
    seeds = _seed_rows(proj, k, id_col, vec_col).take_all()
    cent = _normalize(_as_matrix([r[vec_col] for r in seeds]))
    for _ in range(n_iter):
        p = proj.map_batches(
            _p(_assign_partials, cent=cent, id_col=id_col, vec_col=vec_col),
            batch_format="pyarrow",
        ).to_pandas()
        counts = p.groupby("cluster")["count"].sum()
        sums = {}
        for c, g in p.groupby("cluster"):
            sums[c] = np.sum(np.stack(g["sum"].to_numpy()), axis=0)
        new = cent.copy()
        for c in range(k):
            if counts.get(c, 0) > 0:
                new[c] = sums[c] / counts[c]
        new = _normalize(new)
        shift = float(np.abs(new - cent).max())
        cent = new
        # tol is a RUNTIME pin, not just a float guard: each Lloyd
        # iteration is a full corpus pass, and centroids of separated
        # data stop moving after 2-3 passes — waiting for 1e-9 paid
        # ~n_iter passes on every run (q54's 2.5x bench spread)
        if shift < tol:  # converged — skip the remaining passes
            break
    out = proj.map_batches(
        _p(_assign_batch, cent=cent, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
    )
    return out, cent


def semdedup_collapse(ds, *, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding", **pair_kwargs):
    """Cluster-insensitive semantic-dup collapse — the oracle-checkable
    member of the SemDeDup family. Rule: a row is dropped iff ANY
    smaller-id row sits above the cosine threshold, and ``dup_of`` is
    the SMALLEST such neighbor (not the greedy kept one) — no k-means
    partition, so the result is independent of cluster layout and has
    an exact SQL mirror (pairwise cosine self-join + min per node).

    Distributed shape: threshold pairs from ``embedding_dup_pairs``
    (broadcast ≤100k rows, centroid-bucketed above — the q34 path),
    then ONE bucketed aggregate unions the pair-mins with the base id
    set via a +inf sentinel: no join stage, ids move once.

    Output: (id, keep:int32, dup_of:int64 — -1 for keepers).
    """
    from ..shuffle import bucketed_aggregate
    from .dedup import embedding_dup_pairs

    SENTINEL = np.int64(2**62)
    pairs = embedding_dup_pairs(
        ds, threshold=threshold, id_col=id_col, vec_col=vec_col, **pair_kwargs
    )

    def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df["id_b"].to_numpy().astype(np.int64),
                "dup_of": df["id_a"].to_numpy().astype(np.int64),
            }
        )

    def base_rows(t: pa.Table) -> pd.DataFrame:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({id_col: ids, "dup_of": np.full(len(ids), SENTINEL)})

    unioned = pairs.map_batches(pair_rows, batch_format="pandas").union(
        ds.select_columns([id_col]).map_batches(base_rows, batch_format="pyarrow")
    )
    agg = bucketed_aggregate(unioned, id_col, {"dup_of": ("dup_of", "min")}, combine=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df["dup_of"].to_numpy().astype(np.int64)
        keep = d == SENTINEL
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy().astype(np.int64),
                "keep": keep.astype(np.int32),
                "dup_of": np.where(keep, np.int64(-1), d),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def semdedup(ds, *, k: int = 8, n_iter: int = 8, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"):
    """SemDeDup: k-means partition, then per-cluster near-duplicate
    drop. Keeps the smallest id of every semantic duplicate group
    (deterministic; the paper keeps an arbitrary/farthest point).

    Output: (id, cluster, keep:int32, dup_of:int64 — kept neighbor's
    id, -1 for keepers). ONE cluster-keyed exchange of (id, vector)
    rows; per-cluster work is a blocked pairwise matmul, so the
    worst case is bounded by the largest cluster — at web scale raise
    k so clusters stay bucket-sized (same skew rule as the centroid-
    bucketed embedding_dup_pairs path)."""
    from functools import partial as _p

    from ..shuffle import bucketed_groupby

    _assigned, cent = kmeans(
        ds, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )

    # final pass carries the vector with its cluster id so the
    # cluster-keyed exchange needs NO join (vectors move exactly once)
    def assign_carry(batch: pa.Table) -> pa.Table:
        m = _normalize(_mat_from_arrow(batch[vec_col]))
        a = np.argmax(m @ cent.T, axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a.astype(np.int64)),
                vec_col: batch[vec_col],
            }
        )

    joined = ds.select_columns([id_col, vec_col]).map_batches(
        assign_carry, batch_format="pyarrow"
    )

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        m = _normalize(_as_matrix(g[vec_col].to_numpy()))
        n = len(g)
        keep = np.ones(n, bool)
        dup_of = np.full(n, -1, np.int64)
        ids = g[id_col].to_numpy()
        # greedy in id order: drop a row iff it matches an already-kept
        # earlier row above threshold (blocked to bound memory)
        block = 2048
        for i0 in range(0, n, block):
            sims = m[i0 : i0 + block] @ m[:i0 + block].T
            for i in range(i0, min(i0 + block, n)):
                s = sims[i - i0, :i]
                cand = np.flatnonzero((s > threshold) & keep[:i])
                if len(cand):
                    keep[i] = False
                    dup_of[i] = ids[cand[0]]
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": g["cluster"].to_numpy().astype(np.int64),
                "keep": keep.astype(np.int32),
                "dup_of": dup_of,
            }
        )

    return bucketed_groupby(joined, "cluster", dedup_cluster, whole_bucket=True)


# ---------------------------------------------------------------------------
# product quantization (PQ): the memory-bound ANN scale path


class PQCodebooks:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    (normalized) vector into ``m`` subspaces and k-means each to
    ``ksub`` centroids; a vector becomes ``m`` uint8 codes — 16x
    compression of a float32 embedding at m=dim/4, which is what makes
    a 100-TB embedding corpus resident at all. Trained driver-local on
    a bounded sample with seeded Lloyd iterations (the codebook IS the
    model — the IVFIndex/sample-bound convention)."""

    def __init__(self, sample: np.ndarray, m: int = 4, ksub: int = 16, iters: int = 12, seed: int = 42):
        sample = _normalize(np.asarray(sample, dtype=np.float64))
        if sample.ndim != 2 or len(sample) == 0:
            raise ValueError("PQ: empty sample — no rows to train codebooks on")
        n, dim = sample.shape
        if dim % m:
            raise ValueError(f"PQ: dim {dim} not divisible by m={m}")
        self.m, self.ksub, self.dsub = int(m), int(ksub), dim // int(m)
        rng = np.random.default_rng(seed)
        self.books = np.zeros((self.m, self.ksub, self.dsub))
        for j in range(self.m):
            sub = sample[:, j * self.dsub : (j + 1) * self.dsub]
            cent = sub[rng.choice(n, size=self.ksub, replace=n < self.ksub)].copy()
            for _ in range(iters):
                d = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
                assign = d.argmin(1)
                for c in range(self.ksub):
                    pts = sub[assign == c]
                    if len(pts):
                        cent[c] = pts.mean(0)
            self.books[j] = cent

    def encode(self, mat: np.ndarray) -> np.ndarray:
        """(n, dim) normalized -> (n, m) uint8 codes."""
        codes = np.empty((len(mat), self.m), np.uint8)
        for j in range(self.m):
            sub = mat[:, j * self.dsub : (j + 1) * self.dsub]
            d = ((sub[:, None, :] - self.books[j][None]) ** 2).sum(-1)
            codes[:, j] = d.argmin(1)
        return codes

    def lut(self, qmat: np.ndarray) -> np.ndarray:
        """(q, m, ksub) table of per-subspace squared L2 partials —
        the ADC trick: query-to-code distance becomes m table lookups
        instead of a dim-length dot product."""
        out = np.empty((len(qmat), self.m, self.ksub))
        for j in range(self.m):
            qs = qmat[:, j * self.dsub : (j + 1) * self.dsub]
            out[:, j, :] = ((qs[:, None, :] - self.books[j][None]) ** 2).sum(-1)
        return out


def pq_encode(ds, codebooks: PQCodebooks, *, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Materializable code table: (id, code: list<uint8>) — one
    stateless vectorized pass; the stored index for repeated queries
    (m bytes/vector vs 4·dim for float32)."""
    import ray

    ref = ray.put(codebooks)

    def enc(batch: pa.Table) -> pa.Table:
        pq_ = ray.get(ref)
        mat = _normalize(_mat_from_arrow(batch[vec_col]))
        codes = pq_.encode(mat)
        return pa.table(
            {
                id_col: batch[id_col],
                "code": pa.array(list(codes), pa.list_(pa.uint8())),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_topk(
    ds,
    query_ids,
    query_mat: np.ndarray,
    *,
    k: int = 5,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
    seed: int = 42,
    exclude_self: bool = True,
):
    """PQ/ADC approximate top-k: codebooks train on a bounded sample,
    the (q, m, ksub) distance LUT is built ONCE on the driver and
    broadcast, and each block scores its rows with m table lookups per
    (query, row) — no full-dimension matmul, no shuffle of vectors
    (only block-local top-k candidate rows move, the brute_topk
    pattern). On normalized vectors squared-L2 ranking equals cosine
    ranking, so recall is measured directly against ``brute_topk``."""
    import ray

    sample = _train_sample(ds, sample_size, vec_col, seed=seed)
    pq_ = PQCodebooks(sample, m=m, ksub=ksub, seed=seed)
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    lut = pq_.lut(qmat)
    ref = ray.put((np.asarray(query_ids), lut, pq_))

    def block_candidates(batch: pa.Table) -> pd.DataFrame:
        qids, lut_, pqc = ray.get(ref)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        mat = _normalize(_mat_from_arrow(batch[vec_col]))
        codes = pqc.encode(mat)
        dist = np.zeros((len(qids), len(ids)))
        for j in range(pqc.m):
            dist += lut_[:, j, codes[:, j]]
        top = min(k + 1, dist.shape[1])
        if top == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "dist": []})
        rows_idx = np.empty((len(qids), top), np.int64)
        for qi in range(len(qids)):
            rows_idx[qi] = np.lexsort((ids, dist[qi]))[:top]
        df = pd.DataFrame(
            {
                "query_id": np.repeat(np.asarray(qids), top),
                "neighbor_id": ids[rows_idx.ravel()],
                "dist": np.take_along_axis(dist, rows_idx, axis=1).ravel(),
            }
        )
        if exclude_self:
            df = df[df["query_id"] != df["neighbor_id"]]
        return df

    cands = ds.map_batches(block_candidates, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", "neighbor_id"], ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "neighbor_id", "rank"]]

    return cands.groupby("query_id").map_groups(final_topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# hyperplane-LSH ANN (Charikar 2002 sign-random-projection) — the
# CANDIDATE-PRUNING regime beside brute (q40, exact), IVF (q41,
# centroid-probed) and PQ (q107, memory-bound): brute/IVF/PQ all score
# something for EVERY row, while LSH touches only rows whose bucket
# matches a query bucket in at least one table — sub-linear candidate
# work with ZERO shuffle (the (tables × bits) plane tensor and the tiny
# per-table query-bucket sets broadcast once; each batch filters itself
# and exact-rescoring runs only on the survivors).


def _lsh_buckets(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) × (tables, bits, dim) -> (tables, n) int bucket ids
    (sign pattern of the projections, packed little-endian)."""
    signs = (np.einsum("tbd,nd->tnb", planes, mat) > 0).astype(np.int64)
    weights = 1 << np.arange(planes.shape[1], dtype=np.int64)
    return signs @ weights


def lsh_topk(
    ds,
    query_ids,
    query_mat: np.ndarray,
    *,
    k: int = 5,
    n_tables: int = 8,
    n_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Approximate cosine top-k via multi-table hyperplane LSH.

    A corpus row becomes a candidate for a query iff they share a
    bucket in ANY table (multi-probe OR); candidates are exact-rescored
    block-locally and reduced by the brute_topk final groupby. Recall
    rises with n_tables (each table is an independent chance to catch a
    neighbor) and falls with n_bits (finer buckets prune more);
    8 × 12 bits lands ~0.9 recall@5 on 64-dim unit vectors while
    scoring a small fraction of rows — the knob pair is the documented
    tradeoff, pinned by pytest recall bounds against brute_topk."""
    import ray

    rng = np.random.default_rng(seed)
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    dim = qmat.shape[1]
    planes = rng.standard_normal((n_tables, n_bits, dim))
    qbuckets = _lsh_buckets(qmat, planes)  # (tables, q)
    # per-table bucket -> query-index lists (tiny; broadcast)
    table_maps: list[dict[int, np.ndarray]] = []
    for t in range(n_tables):
        m: dict[int, list[int]] = {}
        for qi, b in enumerate(qbuckets[t]):
            m.setdefault(int(b), []).append(qi)
        table_maps.append({b: np.array(v) for b, v in m.items()})
    ref = ray.put((np.asarray(query_ids), qmat, planes, table_maps))

    def block_candidates(batch: pa.Table) -> pd.DataFrame:
        qids, qm, pl, maps = ray.get(ref)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        mat = _normalize(_mat_from_arrow(batch[vec_col]))
        rb = _lsh_buckets(mat, pl)  # (tables, n)
        # (query, row) collision pairs, vectorized per table: rows that
        # hit ANY query bucket found by one searchsorted over the
        # table's (tiny) sorted bucket keys; the Python loop runs over
        # HITS only, then pairs dedupe across tables in one np.unique
        qi_parts: list[np.ndarray] = []
        ri_parts: list[np.ndarray] = []
        for t in range(len(pl)):
            m = maps[t]
            if not m:
                continue
            keys = np.sort(np.fromiter(m.keys(), np.int64, len(m)))
            pos = np.searchsorted(keys, rb[t])
            pos_c = np.minimum(pos, len(keys) - 1)
            hits = np.flatnonzero(keys[pos_c] == rb[t])
            for r in hits:
                qsel = m[int(rb[t][r])]
                qi_parts.append(qsel)
                ri_parts.append(np.full(len(qsel), r, np.int64))
        if not qi_parts:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        packed = np.unique(
            np.concatenate(qi_parts).astype(np.int64) * len(mat)
            + np.concatenate(ri_parts)
        )
        qi = packed // len(mat)
        ri = packed % len(mat)
        sims = np.einsum("pd,pd->p", qm[qi], mat[ri])  # exact rescoring, candidates only
        df = pd.DataFrame({"query_id": qids[qi], "neighbor_id": ids[ri], "cosine": sims})
        df = df[df["query_id"] != df["neighbor_id"]]
        # block-local top-(k+1) per query
        df = df.sort_values(["query_id", "cosine", "neighbor_id"], ascending=[True, False, True])
        return df.groupby("query_id", sort=False).head(k + 1).reset_index(drop=True)

    cands = ds.map_batches(block_candidates, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "neighbor_id", "rank"]]

    return cands.groupby("query_id").map_groups(final_topk, batch_format="pandas")
