"""Deduplication stages: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

The reference has no dedup operators (SURVEY.md §2.7) but a
trillion-document extraction corpus needs them; these are first-class
engine stages. Design per the Ray guide's aggregation-at-scale pattern:
vectorized per-batch signature computation (map_batches) → explode to
small key rows → a single ``groupby`` on the signature key → row-local
verification. The only shuffle per dedup mode is the signature groupby,
whose payload is (key, doc_id) pairs — tiny relative to the corpus —
so the all-to-all moves ~1% of input bytes at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Hot shingles shared by more docs than this are dropped from candidate
# generation by default: one stop-phrase in 10^6 docs creates 10^12
# candidate pairs inside its bucket. At this cap the pair blowup per
# shingle is bounded at ~8M rows while the oracle fixtures (≤20k docs)
# never reach it, so exact-Jaccard parity holds at test scale. Pass
# ``max_shingle_freq=None`` for exact semantics at any scale.
DEFAULT_MAX_SHINGLE_FREQ = 4096

# ---------------------------------------------------------------------------
# exact dedup


def add_content_hash(batch: pa.Table, *, column: str = "text") -> pa.Table:
    """Append a 64-bit content hash column — one vectorized
    ``pd.util.hash_array`` (siphash) call over the whole batch, no
    per-row Python hashing."""
    texts = batch[column]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    arr = np.asarray(texts.to_pylist(), dtype=object)
    if len(arr):
        null = np.array([t is None for t in arr])
        arr[null] = ""
        hashes = pd.util.hash_array(arr)
        hashes[null] = 0
    else:
        hashes = np.zeros(0, dtype=np.uint64)
    return batch.append_column("content_hash", pa.array(hashes.astype(np.uint64)))


def dedup_exact(ds, *, column: str = "text", key: str = "doc_id"):
    """Exact dedup: hash-partition on content hash, keep min-key row per group.

    SURVEY.md §2.7's ``doc_id``-dedup generalized to content identity.
    One bucketed shuffle on the content hash; inside each bucket the
    winner per hash is picked with a single vectorized sort +
    drop_duplicates (no per-group Python). Deterministic winner
    (min key) so reruns are stable.
    """
    from ..shuffle import bucketed_groupby

    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow", fn_kwargs={"column": column})

    def keep_first(bucket: pd.DataFrame) -> pd.DataFrame:
        out = bucket.sort_values([key]).drop_duplicates("content_hash", keep="first")
        return out.drop(columns=["content_hash"]).reset_index(drop=True)

    return bucketed_groupby(hashed, "content_hash", keep_first, whole_bucket=True)


# ---------------------------------------------------------------------------
# word n-gram shingles (shared by jaccard / minhash)


_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)  # odd 64-bit mixer for the rolling combine


def _batch_shingle_hashes(texts: list, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct 64-bit word-n-gram shingle hashes for a whole batch.

    Returns (flat, lengths): ``flat`` is the concatenation of each doc's
    distinct shingle hashes (ascending within a doc), ``lengths[i]`` the
    count for doc i. Fully vectorized: ONE ``pd.util.hash_array``
    (siphash) call over every word in the batch, then a rolling
    multiply-xor combine of n consecutive word hashes (equivalent to
    hashing the joined gram — words cannot contain the split char), and
    a lexsort-based per-doc distinct. Docs with fewer than n words emit
    ZERO shingles — matching the oracle SQL's lead()-based n-gram CTE,
    which produces no rows for short docs.
    """
    n_docs = len(texts)
    words_per_doc = [t.split(" ") if t else [] for t in texts]
    word_counts = np.array([len(ws) for ws in words_per_doc], dtype=np.int64)
    gram_counts = np.maximum(word_counts - n + 1, 0)
    total = int(gram_counts.sum())
    if total == 0:
        return np.zeros(0, np.uint64), np.zeros(n_docs, np.int64)
    all_words = np.asarray([w for ws in words_per_doc for w in ws], dtype=object)
    wh = pd.util.hash_array(all_words).astype(np.uint64)
    doc_word_off = np.concatenate([[0], np.cumsum(word_counts)])[:-1]
    starts = np.repeat(doc_word_off, gram_counts) + (
        np.arange(total) - np.repeat(np.cumsum(gram_counts) - gram_counts, gram_counts)
    )
    with np.errstate(over="ignore"):
        acc = np.zeros(total, np.uint64)
        for j in range(n):
            acc = acc * _GRAM_MULT ^ wh[starts + j]
    # per-doc distinct: lexsort (doc, hash), drop consecutive duplicates
    doc_idx = np.repeat(np.arange(n_docs), gram_counts)
    order = np.lexsort((acc, doc_idx))
    d_s, h_s = doc_idx[order], acc[order]
    keep = np.ones(total, bool)
    keep[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    return h_s[keep], np.bincount(d_s[keep], minlength=n_docs).astype(np.int64)


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Distinct shingle hashes of ONE doc (unit-test convenience)."""
    flat, _ = _batch_shingle_hashes([text], n)
    return flat


def shingle_batch(batch: pa.Table, *, n: int = 3) -> pa.Table:
    """Explode docs to (doc_id, shingle:uint64, n_shingles) rows."""
    texts = batch["text"].to_pylist()
    flat, lengths = _batch_shingle_hashes(texts, n)
    idx = np.repeat(np.arange(len(texts)), lengths)
    return pa.table(
        {
            "doc_id": batch["doc_id"].take(pa.array(idx)),
            "shingle": pa.array(flat),
            "n_shingles": pa.array(np.repeat(lengths, lengths)),
        }
    )


def jaccard_pairs(ds, *, n: int = 3, threshold: float = 0.8, max_shingle_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ):
    """Exact n-gram Jaccard near-dup pairs via a shingle-key shuffle.

    docs → shingle rows → ONE bucketed shuffle on the shingle hash →
    per bucket, a vectorized self-merge on shingle emits partial
    (id_a, id_b, shared-count) rows → a small groupby(pair) sum →
    jaccard = shared / (na + nb - shared) ≥ threshold. Exact (no LSH
    recall loss) — the oracle-checkable baseline for the sketch
    variants. ``max_shingle_freq`` drops shingles hotter than the cap
    from candidate generation (stop-phrase skew protection: a shingle
    shared by f docs contributes f² candidate pairs); the default cap
    never triggers at oracle-fixture scale, pass None for exact
    semantics at any scale.
    """
    from ..shuffle import bucketed_aggregate, bucketed_groupby

    shingled = ds.map_batches(shingle_batch, batch_format="pyarrow", fn_kwargs={"n": n})

    def bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        if max_shingle_freq is not None:
            freq = bucket.groupby("shingle")["doc_id"].transform("size")
            bucket = bucket[freq <= max_shingle_freq]
        m = bucket.merge(bucket, on="shingle", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        g = (
            m.groupby(["doc_id_a", "doc_id_b"], sort=False)
            .agg(shared=("shingle", "size"), n_a=("n_shingles_a", "first"), n_b=("n_shingles_b", "first"))
            .reset_index()
        )
        return g.rename(columns={"doc_id_a": "id_a", "doc_id_b": "id_b"})

    partial_counts = bucketed_groupby(shingled, "shingle", bucket_pairs, whole_bucket=True)
    totals = bucketed_aggregate(
        partial_counts,
        ["id_a", "id_b"],
        {"shared": ("shared", "sum"), "n_a": ("n_a", "max"), "n_b": ("n_b", "max")},
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        denom = b["n_a"] + b["n_b"] - b["shared"]
        j = np.where(denom > 0, b["shared"] / denom, 0.0)
        out = pd.DataFrame({"id_a": b["id_a"], "id_b": b["id_b"], "jaccard": j})
        return out[out["jaccard"] >= threshold].reset_index(drop=True)

    return totals.map_batches(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH


_SIG_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


def _densify_rotation(sig: np.ndarray) -> np.ndarray:
    """Rotation densification for one-permutation MinHash (Shrivastava &
    Li 2014): each empty bin borrows the nearest non-empty bin to its
    left, cyclically. Fully-empty rows (zero-shingle docs) densify to
    the all-zero signature — the engine's legacy empty-doc semantic."""
    n, k = sig.shape
    valid = sig != _SIG_EMPTY
    idx = np.where(valid, np.arange(k)[None, :], -1)
    np.maximum.accumulate(idx, axis=1, out=idx)
    last = idx[:, -1]  # -1 only for fully-empty rows
    idx = np.where(idx < 0, last[:, None], idx)
    out = sig[np.arange(n)[:, None], np.clip(idx, 0, k - 1)]
    out[last < 0] = 0
    return out


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature (k components) via
    ONE-PERMUTATION HASHING with rotation densification.

    Classical k-permutation MinHash pays O(shingles × k) multiplies per
    doc; OPH splits the single 64-bit hash space into k bins and keeps
    the min per bin — one O(shingles) pass, same unbiased
    component-equality Jaccard estimator (Li, Owen & Zhang 2012). The
    bin index is the hash's top bits via a fixed-point scale, so bins
    are MONOTONE over each doc's (already ascending, distinct) shingle
    hashes from _batch_shingle_hashes — the per-bin min is just the
    first element of each run: no sort, no reduceat, no multiply.
    """

    def __init__(self, num_perm: int = 128, ngram: int = 3, seed: int = 42):
        self.num_perm = num_perm
        self.ngram = ngram

    def _sigs_from_flat(self, flat: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        k = self.num_perm
        n = len(lengths)
        sig = np.full(n * k, _SIG_EMPTY, np.uint64)
        if len(flat):
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
            # monotone bin: floor(high32(h) * k / 2^32) — works for any k
            bins = (((flat >> np.uint64(32)) * np.uint64(k)) >> np.uint64(32)).astype(
                np.int64
            )
            key = doc_idx * k + bins
            first = np.ones(len(flat), bool)
            first[1:] = key[1:] != key[:-1]
            sig[key[first]] = flat[first]
        return _densify_rotation(sig.reshape(n, k))

    def signature(self, text: str) -> np.ndarray:
        flat, lengths = _batch_shingle_hashes([text], self.ngram)
        return self._sigs_from_flat(flat, lengths)[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        flat, lengths = _batch_shingle_hashes(texts, self.ngram)
        sigs = self._sigs_from_flat(flat, lengths)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "minhash": pa.array(list(sigs), pa.list_(pa.uint64(), self.num_perm)),
            }
        )


def _sig_matrix(col) -> np.ndarray:
    """fixed_size_list<uint64> (or Ray tensor-extension) column ->
    (n, k) uint64 matrix without a per-row Python pass."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col.type, pa.ExtensionType):  # Ray ArrowTensorType
        return np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.uint64)
    k = col.type.list_size
    flat = col.values.to_numpy(zero_copy_only=False)
    return np.asarray(flat, dtype=np.uint64).reshape(len(col), k)


def band_batch(batch: pa.Table, *, bands: int = 32, rows: int = 4) -> pa.Table:
    """Signature -> (band_id, band_hash, doc_id) rows for the LSH groupby.

    Band hashes are a vectorized FNV-1a fold over each band's signature
    components (uint64 wraparound) — one numpy pass per band across the
    whole batch, no per-doc hashing."""
    sig_col = batch["minhash"]
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    n = len(sig_col)
    if n == 0:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "band_id": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.uint64()),
            }
        )
    sig_mat = _sig_matrix(sig_col)  # (n, k) — zero-copy from the Arrow buffer
    FNV_OFF = np.uint64(1469598103934665603)
    FNV_PRIME = np.uint64(1099511628211)
    hashes = np.empty((bands, n), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            h = np.full(n, FNV_OFF, dtype=np.uint64)
            for j in range(b * rows, (b + 1) * rows):
                h = (h ^ sig_mat[:, j]) * FNV_PRIME
            hashes[b] = h
    doc_ids = batch["doc_id"].take(pa.array(np.tile(np.arange(n), bands)))
    return pa.table(
        {
            "doc_id": doc_ids,
            "band_id": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(hashes.ravel()),
        }
    )


def minhash_lsh_pairs(ds, *, num_perm: int = 128, bands: int = 32, ngram: int = 3, threshold: float = 0.8, concurrency: int = 4, verify_strategy: str = "auto"):
    """MinHash-LSH candidate pairs with estimated Jaccard ≥ threshold.

    shingle→minhash (actor pool) → band rows → groupby(band) buckets →
    candidate pairs → dedup pairs → verify with the estimated Jaccard
    (fraction of equal signature components). The scale path for
    ``jaccard_pairs``: shuffle payload is (band_hash, doc_id), constant
    per doc (bands rows), independent of doc length.
    """
    import ray

    rows = num_perm // bands
    cpus = int(ray.cluster_resources().get("CPU", concurrency))
    # OPH minhashing is STATELESS (no permutation table), so this is a
    # plain task-pool map — it overlaps the read and pays zero actor
    # spin-up, unlike the k-permutation design it replaced
    hasher = MinHasher(num_perm=num_perm, ngram=ngram)
    sigs = ds.map_batches(hasher, batch_format="pyarrow")
    # signatures feed BOTH the banding pipeline and the verify pass;
    # without materializing, each consumer re-runs the shingle+minhash
    # map (measured 2x the stage cost). ~1 KiB/doc resident.
    sigs = sigs.materialize()
    n_docs = sigs.count()  # free: row count metadata of a materialized ds
    banded = sigs.map_batches(band_batch, batch_format="pyarrow", fn_kwargs={"bands": bands, "rows": rows})

    def bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the hash bucket: self-merge per (band, hash)
        b = bucket.drop_duplicates(["band_id", "band_hash", "doc_id"])
        m = b.merge(b, on=["band_id", "band_hash"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return m[["doc_id_a", "doc_id_b"]].drop_duplicates().rename(
            columns={"doc_id_a": "id_a", "doc_id_b": "id_b"}
        )

    from ..shuffle import bucketed_aggregate, bucketed_groupby

    # verify: estimated Jaccard from the signatures (fraction of equal
    # components). Two strategies:
    #  - "broadcast" (≤ ~1M docs, 1 KiB/doc): the signature matrix is
    #    collected once and ray.put — pair generation, global dedup AND
    #    verification all fuse into the single band shuffle (the
    #    first-colliding-band emit rule below);
    #  - "join": candidates hash_join sigs twice — the 100 TB path (no
    #    driver materialization; candidate set ≪ corpus).
    if verify_strategy == "join" or (verify_strategy == "auto" and n_docs > 1_000_000):
        from ..shuffle import hash_join

        cand = bucketed_groupby(
            banded, ["band_id", "band_hash"], bucket_pairs, whole_bucket=True
        )
        # global pair dedup (pairs can collide in several bands):
        # bucketed hash agg — the candidate set is orders smaller than
        # the band rows, so fewer buckets cut fixed overhead
        cand = bucketed_aggregate(
            cand,
            ["id_a", "id_b"],
            {"n_bands": ("id_a", "size")},
            num_buckets=max(16, cpus),
        ).drop_columns(["n_bands"])

        def as_bytes(id_out: str, sig_out: str):
            # signatures travel as raw bytes through the join: the
            # fixed-size-list column maps to Ray's TensorArray pandas
            # extension, which can't union with the null fill of the
            # join's superset schema
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame(
                    {
                        id_out: df["doc_id"],
                        sig_out: [np.asarray(s, dtype=np.uint64).tobytes() for s in df["minhash"]],
                    }
                )

            return fn

        sig_a = sigs.map_batches(as_bytes("id_a", "sig_a"), batch_format="pandas")
        sig_b = sigs.map_batches(as_bytes("id_b", "sig_b"), batch_format="pandas")
        # column hints: cand (and the first join's output) are
        # shuffle-rooted — without them hash_join's schema() call
        # executes the whole candidate exchange a second time
        joined = hash_join(
            cand, sig_a, on="id_a",
            left_cols=["id_a", "id_b"], right_cols=["id_a", "sig_a"],
        )
        joined = hash_join(
            joined, sig_b, on="id_b",
            left_cols=["id_a", "id_b", "sig_a"],
            right_cols=["id_b", "sig_b"],
        )

        def verify_joined(batch: pd.DataFrame) -> pd.DataFrame:
            est = [
                float(
                    (np.frombuffer(a, dtype=np.uint64) == np.frombuffer(b, dtype=np.uint64)).mean()
                )
                if isinstance(a, bytes) and isinstance(b, bytes)
                else 0.0
                for a, b in zip(batch["sig_a"], batch["sig_b"])
            ]
            batch = batch.assign(est_jaccard=est)
            return batch[batch["est_jaccard"] >= threshold][["id_a", "id_b", "est_jaccard"]]

        return joined.map_batches(verify_joined, batch_format="pandas")

    # broadcast path — ONE shuffle total. The signature matrix + id
    # index ship once via ray.put; inside each band bucket we generate
    # pairs, verify with a single stacked equality, AND deduplicate
    # globally with the FIRST-COLLIDING-BAND rule: a pair is emitted
    # only by the lowest band whose signature segment matches (every
    # bucket can recompute all band collisions from the broadcast
    # matrix, so cross-band duplicates die locally — no second
    # pair-dedup exchange).
    id_chunks, mat_chunks = [], []
    for t in sigs.iter_batches(batch_format="pyarrow", batch_size=8192):
        col = t["doc_id"]
        id_chunks.append(col.to_numpy() if isinstance(col, pa.ChunkedArray) else col.to_numpy(zero_copy_only=False))
        mat_chunks.append(_sig_matrix(t["minhash"]))
    all_ids = np.concatenate(id_chunks) if id_chunks else np.zeros(0, object)
    mat = np.vstack(mat_chunks) if mat_chunks else np.zeros((0, num_perm), np.uint64)
    sig_ref = ray.put((pd.Index(all_ids), mat))

    def bucket_verify(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=bucket["doc_id"].dtype),
                "id_b": pd.Series([], dtype=bucket["doc_id"].dtype),
                "est_jaccard": pd.Series([], dtype=np.float64),
            }
        )
        b = bucket.drop_duplicates(["band_id", "band_hash", "doc_id"])
        mm = b.merge(b, on=["band_id", "band_hash"], suffixes=("_a", "_b"))
        mm = mm[mm["doc_id_a"] < mm["doc_id_b"]]
        if mm.empty:
            return empty
        index, m = ray.get(sig_ref)
        ia = index.get_indexer(mm["doc_id_a"].to_numpy())
        ib = index.get_indexer(mm["doc_id_b"].to_numpy())
        eq = m[ia] == m[ib]  # (pairs, k)
        band_coll = eq.reshape(len(mm), bands, rows).all(axis=2)
        # emit iff THIS band is the first truly-colliding band. (A pure
        # band_hash collision with unequal segments has band_coll False
        # here — such a pair is dropped by every bucket, which is fine:
        # its est_jaccard is far below threshold by construction.)
        keep = (
            band_coll.argmax(axis=1) == mm["band_id"].to_numpy()
        ) & band_coll.any(axis=1)
        est = eq.mean(axis=1)
        keep &= est >= threshold
        if not keep.any():
            return empty
        out = mm.loc[keep, ["doc_id_a", "doc_id_b"]].rename(
            columns={"doc_id_a": "id_a", "doc_id_b": "id_b"}
        )
        out["est_jaccard"] = est[keep]
        return out

    return bucketed_groupby(
        banded,
        ["band_id", "band_hash"],
        bucket_verify,
        whole_bucket=True,
        num_buckets=max(32, 2 * cpus),
    )


# ---------------------------------------------------------------------------
# near-dup clustering (connected components) + dedup decision


def _label_state(labels_ds):
    """Convergence fingerprint of a (node, label) Dataset: the exact
    label sum when labels are numeric, else an order-independent sum of
    64-bit label hashes (string doc_ids have no numeric sum; pandas
    object-sum would CONCATENATE them)."""

    def part(b: pd.DataFrame) -> pd.DataFrame:
        vals = b["label"].to_numpy()
        if vals.dtype == object:
            c = pd.util.hash_array(np.asarray(vals, dtype=object)).sum(dtype=np.uint64)
        else:
            c = np.uint64(0) if not len(vals) else np.uint64(vals.astype(np.uint64).sum(dtype=np.uint64))
        return pd.DataFrame({"c": np.array([c], np.uint64)})

    parts = labels_ds.map_batches(part, batch_format="pandas").to_pandas()
    return int(parts["c"].to_numpy(dtype=np.uint64).sum(dtype=np.uint64))


def _dup_clusters_driver(edges_ds):
    """Exact driver-side components for the small-side gate of
    dup_clusters: factorize node ids, path-halving union-find over the
    (already doubled) edge list, cluster = min doc_id per component —
    identical output to the converged distributed propagation."""
    import ray.data as rd

    eb = edges_ds.to_pandas()
    codes, uniq = pd.factorize(
        pd.concat([eb["node"], eb["nbr"]], ignore_index=True)
    )
    n = len(uniq)
    if n == 0:
        return rd.from_pandas(pd.DataFrame({"doc_id": [], "cluster": []}))
    a = codes[: len(eb)]
    b = codes[len(eb):]
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for i in range(len(a)):
        ra, rb = find(a[i]), find(b[i])
        if ra != rb:
            parent[rb] = ra
    roots = np.fromiter((find(i) for i in range(n)), np.int64, n)
    ids = np.asarray(uniq)
    # min id per component: visit ids in ascending order, first hit wins
    min_label: dict[int, object] = {}
    for i in np.argsort(ids, kind="stable"):
        r = roots[i]
        if r not in min_label:
            min_label[r] = ids[i]
    out = pd.DataFrame(
        {"doc_id": ids, "cluster": [min_label[r] for r in roots]}
    )
    return rd.from_pandas(out)


def dup_clusters(
    pairs_ds,
    *,
    max_rounds: int = 30,
    num_buckets: int | None = None,
    strict: bool = True,
    small_limit: int = 500_000,
):
    """Connected components over near-dup pairs via distributed
    min-label propagation WITH pointer doubling.

    Input: pairs (id_a, id_b). Output: (doc_id, cluster) where cluster
    is the min doc_id of the component — the canonical keeper, so
    dedup = drop rows where doc_id != cluster.

    Size-aware (the embedding_dups broadcast-vs-blocked pattern): the
    pairs table is an operator OUTPUT, usually orders of magnitude
    smaller than the corpus, and each distributed round costs two joins
    plus an aggregate of mostly scheduling floor. At or below
    ``small_limit`` directed edges the components are solved exactly on
    the driver with a path-halving union-find — bounded but not free:
    at the 500k-edge cap the driver holds ~1M Python-object ids
    (~10^2 MB with object overhead) and the per-edge find loop runs
    single-threaded for ~1 s. Above the cap the pointer-doubling path
    keeps the all-to-all bounded and the work distributed.

    Distributed path: each round combines (a) one-hop neighbour offers
    (edges ⋈ labels) with (b) a pointer-doubling shortcut (labels ⋈
    labels: each node adopts its label's label), so the distance a min
    label travels doubles per round — O(log diameter) rounds instead of
    O(diameter) one-hop rounds (a chain of 1000 near-dups converges in
    ~11 rounds). Convergence is detected via the monotone
    non-increasing label sum; if the round budget is exhausted first,
    raises (``strict=True``, default) or logs a warning — never a
    silent wrong answer.
    """
    import logging

    from ..shuffle import bucketed_aggregate, hash_join

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"node": b["id_a"], "nbr": b["id_b"]})
        rev = pd.DataFrame({"node": b["id_b"], "nbr": b["id_a"]})
        return pd.concat([fwd, rev], ignore_index=True)

    from ..shuffle import n_default_buckets

    nb = num_buckets or n_default_buckets()
    # edges are re-joined every round: coalesce to ~nb blocks ONCE so
    # each round schedules O(nb) tasks, not O(input blocks) (a
    # fine-grained input would otherwise spawn hundreds of tiny tasks
    # per round), then pin in the object store
    edges = pairs_ds.map_batches(to_edges, batch_format="pandas")
    edges = edges.repartition(nb).materialize()

    if edges.count() <= small_limit:
        return _dup_clusters_driver(edges)

    # labels: node -> current component label (min known)
    labels = bucketed_aggregate(edges, "node", {"label": ("nbr", "min")}, num_buckets=num_buckets)

    def tighten(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["label"] = np.minimum(b["node"].to_numpy(), b["label"].to_numpy())
        return b

    labels = labels.map_batches(tighten, batch_format="pandas").repartition(nb).materialize()

    def offer(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["nbr"], "label": b["label"]})

    def as_ptr(b: pd.DataFrame) -> pd.DataFrame:
        # labels re-keyed by their label value: (mid=label(u), src=u)
        return pd.DataFrame({"mid": b["label"], "src": b["node"]})

    def as_mid(b: pd.DataFrame) -> pd.DataFrame:
        # labels keyed by node for the shortcut join: (mid=u, mid_label=label(u))
        return pd.DataFrame({"mid": b["node"], "mid_label": b["label"]})

    def shortcut_out(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["src"], "label": b["mid_label"]})

    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # (a) one-hop: each node offers its label to all neighbours
        offered = hash_join(
            edges, labels, on="node", num_buckets=num_buckets,
            left_cols=["node", "nbr"], right_cols=["node", "label"],
        ).map_batches(offer, batch_format="pandas")
        # (b) pointer doubling: node u adopts label(label(u))
        ptr = labels.map_batches(as_ptr, batch_format="pandas")
        mid = labels.map_batches(as_mid, batch_format="pandas")
        shortcut = hash_join(
            ptr, mid, on="mid", num_buckets=num_buckets,
            left_cols=["mid", "src"], right_cols=["mid", "mid_label"],
        ).map_batches(shortcut_out, batch_format="pandas")
        both = offered.union(shortcut).union(labels.select_columns(["node", "label"]))
        # repartition to nb blocks each round: groupby output block count
        # tracks its INPUT block count, which would otherwise compound
        # ~4× per round (measured 40 → 168 → 680 blocks by round 3).
        # combine=True: per-batch min partials shrink the exchange when
        # high-degree nodes receive many offers in one batch
        labels = bucketed_aggregate(
            both, "node", {"label": ("label", "min")}, num_buckets=num_buckets, combine=True
        ).repartition(nb).materialize()
        # converged? exact for numeric ids (label sum is monotone
        # non-increasing); for string ids an order-independent 64-bit
        # label checksum (same hash-identity convention as content-hash
        # dedup — labels only move toward the component min, so a false
        # stop needs same-round hash-delta cancellation mod 2^64)
        new_sum = _label_state(labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    if not converged:
        msg = (
            f"dup_clusters: label propagation did not stabilize within "
            f"{max_rounds} rounds — component labels may be split"
        )
        if strict:
            raise RuntimeError(msg)
        logging.getLogger(__name__).warning(msg)

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["node"], "cluster": b["label"]})

    return labels.map_batches(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash


def simhash_batch(batch: pa.Table, *, ngram: int = 3) -> pa.Table:
    """64-bit SimHash per doc over word-ngram hashes — whole-batch
    vectorized: one (total_shingles, 64) bit expansion + per-doc bit
    votes via ``np.add.reduceat`` at the doc offsets."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out = np.zeros(len(ids), dtype=np.uint64)
    flat, lengths = _batch_shingle_hashes(texts, ngram)
    if len(flat):
        bits = np.uint64(1) << np.arange(64, dtype=np.uint64)
        bm = (flat[:, None] & bits[None, :]) != 0  # (S, 64)
        nonempty = lengths > 0
        offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
        np.cumsum(lengths[nonempty][:-1], out=offsets[1:])
        ones = np.add.reduceat(bm, offsets, axis=0)  # (docs_nonempty, 64)
        votes = ones * 2 - lengths[nonempty][:, None]
        out[nonempty] = ((votes > 0) * bits[None, :]).sum(axis=1, dtype=np.uint64)
    return pa.table({"doc_id": pa.array(ids), "simhash": pa.array(out)})


def simhash_pairs(ds, *, ngram: int = 3, max_hamming: int = 3, block_bits: int = 16):
    """SimHash near-dup pairs: block on 16-bit prefixes (4 rotations) so any
    pair within hamming distance 3 shares ≥1 block key (pigeonhole over
    4 blocks), then verify the exact hamming distance per candidate."""
    sh = ds.map_batches(simhash_batch, batch_format="pyarrow", fn_kwargs={"ngram": ngram})

    def blocks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        vals = np.asarray(batch["simhash"].to_pylist(), dtype=np.uint64)
        n_blocks = 64 // block_bits
        out_id, out_block, out_key, out_val = [], [], [], []
        for b in range(n_blocks):
            key = (vals >> np.uint64(b * block_bits)) & np.uint64((1 << block_bits) - 1)
            out_id.extend(ids)
            out_block.extend([b] * len(ids))
            out_key.extend(key.tolist())
            out_val.extend(vals.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "block_id": pa.array(np.array(out_block, np.int32)),
                "block_key": pa.array(np.array(out_key, np.uint64)),
                "simhash": pa.array(np.array(out_val, np.uint64)),
            }
        )

    blocked = sh.map_batches(blocks, batch_format="pyarrow")

    def bucket(whole: pd.DataFrame) -> pd.DataFrame:
        # vectorized per hash-bucket: self-merge on the block key
        b = whole.drop_duplicates(["block_id", "block_key", "doc_id"])
        m = b.merge(b, on=["block_id", "block_key"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if m.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        x = m["simhash_a"].to_numpy().astype(np.uint64) ^ m["simhash_b"].to_numpy().astype(np.uint64)
        ham = _popcount64(x)
        keep = ham <= max_hamming
        out = pd.DataFrame(
            {
                "id_a": m["doc_id_a"].to_numpy()[keep],
                "id_b": m["doc_id_b"].to_numpy()[keep],
                "hamming": ham[keep].astype(np.int32),
            }
        )
        return out.drop_duplicates(["id_a", "id_b"])

    from ..shuffle import bucketed_aggregate, bucketed_groupby

    pairs = bucketed_groupby(blocked, ["block_id", "block_key"], bucket, whole_bucket=True)
    return bucketed_aggregate(pairs, ["id_a", "id_b"], {"hamming": ("hamming", "min")})


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


def _estimate_large(ds, limit: int = 1_000_000) -> bool:
    """True if ds has more than ``limit`` rows, probing at most limit+1.

    ``limit(n+1).count()`` stops the upstream read early instead of
    executing the full lineage like a bare ``ds.count()`` would.
    """
    try:
        return ds.limit(limit + 1).count() > limit
    except Exception:
        return True


def embedding_dup_pairs(
    ds,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "auto",
    broadcast_limit: int = 100_000,
    nlist: int = 64,
    assign_top: int = 2,
    sample_size: int = 2048,
    seed: int = 42,
):
    """Embedding near-dup pairs with cosine ≥ threshold.

    Two strategies:
    - ``"broadcast"`` (exact): the full matrix is broadcast once via
      ``ray.put`` and each batch computes block-vs-all similarities in
      one float64 matmul — O(n²) flops, O(n·d) bytes moved; right at
      ≤~100k vectors and the oracle-checkable baseline.
    - ``"blocked"`` (the 100 TB path): vectors are assigned to their
      ``assign_top`` nearest of ``nlist`` k-means centroids (multi-probe
      so near-boundary pairs still co-locate) and shuffled ONCE on the
      centroid id; all-pairs matmul runs inside each bucket only. Flops
      and shuffle bytes scale with bucket sizes, not n². Approximate:
      a pair whose probe sets don't intersect is missed.
    ``"auto"`` picks broadcast below ``broadcast_limit`` rows (exact at
    fixture scale), blocked above.
    """
    import ray

    if strategy == "auto":
        strategy = "broadcast" if not _estimate_large(ds, broadcast_limit) else "blocked"

    if strategy == "broadcast":
        tbl = ds.select_columns([id_col, vec_col])
        all_rows = tbl.take_all()  # small side: materialize + broadcast
        ids = np.array([r[id_col] for r in all_rows])
        mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in all_rows])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        ref = ray.put((ids, matn))

        def block(batch: pd.DataFrame) -> pd.DataFrame:
            gids, gmat = ray.get(ref)
            bids = batch[id_col].to_numpy()
            bmat = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            bnorm = np.linalg.norm(bmat, axis=1)
            bnorm[bnorm == 0] = 1.0
            sims = (bmat / bnorm[:, None]) @ gmat.T  # (b, n)
            ra, ca = np.nonzero(sims >= threshold)
            a, b = bids[ra], gids[ca]
            keep = a < b
            return pd.DataFrame(
                {"id_a": a[keep], "id_b": b[keep], "cosine": sims[ra, ca][keep]}
            )

        return ds.map_batches(block, batch_format="pandas")

    # blocked: centroid-bucketed all-pairs
    from ..shuffle import bucketed_aggregate, bucketed_groupby
    from .similarity import IVFIndex, _mat_from_arrow

    sample = [r[vec_col] for r in ds.take(sample_size)]
    index = IVFIndex(np.stack([np.asarray(v, np.float64) for v in sample]), nlist=nlist, seed=seed)
    cents_ref = ray.put(index.centroids)

    def assign_rows(batch: pa.Table) -> pd.DataFrame:
        cents = ray.get(cents_ref)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        mat = _mat_from_arrow(batch[vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        sims = matn @ cents.T
        top = np.argsort(-sims, axis=1)[:, :assign_top]  # (n, assign_top)
        n = len(ids)
        return pd.DataFrame(
            {
                "bucket": top.ravel().astype(np.int32),
                "vid": np.repeat(ids, assign_top),
                "vec": [matn[i].tobytes() for i in np.repeat(np.arange(n), assign_top)],
            }
        )

    assigned = ds.map_batches(assign_rows, batch_format="pyarrow")

    def bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.drop_duplicates("vid")
        if len(b) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        ids = b["vid"].to_numpy()
        mat = np.stack([np.frombuffer(v, dtype=np.float64) for v in b["vec"]])
        sims = mat @ mat.T
        ra, ca = np.nonzero(sims >= threshold)
        keep = ids[ra] < ids[ca]
        return pd.DataFrame(
            {"id_a": ids[ra][keep], "id_b": ids[ca][keep], "cosine": sims[ra, ca][keep]}
        )

    pairs = bucketed_groupby(assigned, "bucket", bucket_pairs, whole_bucket=True)
    # a pair can surface in up to assign_top shared buckets: dedupe
    return bucketed_aggregate(pairs, ["id_a", "id_b"], {"cosine": ("cosine", "max")})


# ---------------------------------------------------------------------------
# corpus-level line/sentence dedup (C4-style)


def explode_lines_batch(
    batch: pa.Table,
    *,
    col: str = "text",
    sep: str = ". ",
    window_words: int | None = None,
) -> pa.Table:
    """(doc_id, text) -> one row per line: (doc_id, line_no, line).

    Two line definitions:
    - separator mode (default): one pc.split_pattern + list_flatten;
      line numbers from the list offsets (np.repeat/arange), no
      Python loop;
    - ``window_words=k``: fixed k-word windows (for corpora without
      sentence separators). The window regroup is a ragged rewrite
      (join k words per window), done on plain lists decoded once per
      batch — same accepted shape as the span normalizer's ragged
      loop.
    """
    if window_words:
        k = int(window_words)
        ids_in = batch["doc_id"]
        out_rep: list[int] = []
        out_no: list[int] = []
        out_line: list[str] = []
        for row, text in enumerate(batch[col].to_pylist()):
            ws = (text or "").split(" ")
            for wi in range(0, len(ws), k):
                out_rep.append(row)
                out_no.append(wi // k)
                out_line.append(" ".join(ws[wi : wi + k]))
        return pa.table(
            {
                "doc_id": ids_in.take(pa.array(out_rep, pa.int64())),
                "line_no": pa.array(out_no, pa.int64()),
                "line": pa.array(out_line, pa.string()),
            }
        )
    parts = pc.split_pattern(batch[col], sep)
    flat = pc.list_flatten(parts)
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_ids = batch["doc_id"]
    rep = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    line_no = np.concatenate([np.arange(c, dtype=np.int64) for c in counts]) if len(counts) else np.zeros(0, np.int64)
    return pa.table(
        {
            "doc_id": doc_ids.take(pa.array(rep)),
            "line_no": pa.array(line_no, pa.int64()),
            "line": flat,
        }
    )


def dedup_lines(ds, *, col: str = "text", sep: str = ". ", window_words: int | None = None):
    """C4-style corpus-level line dedup (Raffel et al. 2020, C4: drop
    every occurrence of a duplicated line but the first).

    Docs explode to line rows (vectorized), then ONE bucketed shuffle
    keyed on the line's content hash; within a bucket the globally
    first occurrence per line text — min (doc_id, line_no) — is kept
    with a single vectorized sort + drop_duplicates. Same-text lines
    always share a bucket, so the winner is global; comparison is on
    the actual text (hash only routes), so collisions cannot corrupt.

    Scale shape: the exchange moves (hash, doc_id, line_no, line)
    tuples — line text, not documents; skew is bounded because a hot
    line only concentrates its own copies.
    """
    from functools import partial

    from ..shuffle import bucketed_groupby

    lines = ds.map_batches(
        partial(explode_lines_batch, col=col, sep=sep, window_words=window_words),
        batch_format="pyarrow",
    )
    hashed = lines.map_batches(
        add_content_hash, batch_format="pyarrow", fn_kwargs={"column": "line"}
    )

    def keep_first(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.sort_values(["line", "doc_id", "line_no"])
            .drop_duplicates("line", keep="first")
        )
        return out.drop(columns=["content_hash"]).reset_index(drop=True)

    return bucketed_groupby(hashed, "content_hash", keep_first, whole_bucket=True)


# ---------------------------------------------------------------------------
# RefinedWeb-style exact-substring dedup removal (Penedo et al. 2023,
# §"exact deduplication": remove duplicated spans, keep the globally
# first occurrence). The published implementation builds a corpus-wide
# suffix array (Lee et al. 2021, "Deduplicating Training Data Makes
# Language Models Better"); the Ray-Data-native equivalence class is
# fixed-order n-gram occurrences, which bound span detection at n
# words and need only ONE gram-keyed exchange instead of a global
# suffix sort.


def _gram_occurrence_batch(batch: pa.Table, *, n: int) -> pa.Table:
    """Explode docs to ALL n-gram occurrences (hash, doc_id, pos) —
    occurrences, not distinct grams (within-doc repeats count)."""
    texts = batch["text"].to_pylist()
    n_docs = len(texts)
    words_per_doc = [t.split(" ") if t else [] for t in texts]
    wc = np.array([len(ws) for ws in words_per_doc], dtype=np.int64)
    g_cnt = np.maximum(wc - n + 1, 0)
    total = int(g_cnt.sum())
    if total == 0:
        return pa.table(
            {
                "gram": pa.array([], pa.uint64()),
                "doc_id": batch["doc_id"].slice(0, 0),
                "pos": pa.array([], pa.int64()),
            }
        )
    all_words = np.asarray([w for ws in words_per_doc for w in ws], dtype=object)
    wh = pd.util.hash_array(all_words).astype(np.uint64)
    doc_off = np.concatenate([[0], np.cumsum(wc)])[:-1]
    g_off = np.concatenate([[0], np.cumsum(g_cnt)])[:-1]
    pos = np.arange(total) - np.repeat(g_off, g_cnt)
    starts = np.repeat(doc_off, g_cnt) + pos
    with np.errstate(over="ignore"):
        acc = np.zeros(total, np.uint64)
        for j in range(n):
            acc = acc * _GRAM_MULT ^ wh[starts + j]
    doc_idx = np.repeat(np.arange(n_docs), g_cnt)
    return pa.table(
        {
            "gram": pa.array(acc),
            "doc_id": batch["doc_id"].take(pa.array(doc_idx)),
            "pos": pa.array(pos),
        }
    )


def remove_dup_substrings(ds, *, n: int = 10, col: str = "text"):
    """Corpus-level exact-substring removal: every occurrence of an
    n-gram that appears >= 2 times in the corpus is deleted EXCEPT the
    globally first one (min doc_id, then min pos); overlapping deleted
    spans merge; survivors re-join with single spaces.

    Two exchanges, both tuple-weight:
    1. gram occurrences (hash, doc_id, pos) bucket by gram hash — the
       global winner per duplicated gram falls out of one vectorized
       sort inside the bucket; non-winners come back as removal marks;
    2. marks union documents bucket by doc_id — each doc meets its
       marks exactly once, a diff-array merges overlapping spans and
       the text is rebuilt row-local.

    Skew: a stop-phrase gram concentrates only its own occurrence
    rows; documents are moved once regardless of mark count. Hash
    equality stands in for gram equality (the repo's standing
    convention — the route AND the identity are the same 64-bit
    rolling hash used by jaccard/minhash shingles).
    """
    from functools import partial

    from ..shuffle import bucketed_groupby

    occ = ds.map_batches(
        partial(_gram_occurrence_batch, n=n), batch_format="pyarrow"
    )

    def removal_marks(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["gram", "doc_id", "pos"], kind="mergesort")
        dup = b.duplicated("gram", keep=False)
        winner = ~b.duplicated("gram", keep="first")
        out = b.loc[dup & ~winner, ["doc_id", "pos"]]
        return out.reset_index(drop=True)

    marks = bucketed_groupby(occ, "gram", removal_marks, whole_bucket=True)

    # one doc_id-keyed exchange: docs tagged with pos=-1, marks with
    # text=None; the bucket fn sees each doc + all its marks together
    cols = ["doc_id", col, "pos"]
    docs_tagged = ds.map_batches(
        lambda df: df.assign(pos=np.int64(-1))[cols], batch_format="pandas"
    )
    marks_tagged = marks.map_batches(
        lambda df: df.assign(**{col: None})[cols], batch_format="pandas"
    )

    def rebuild(bucket: pd.DataFrame) -> pd.DataFrame:
        is_doc = bucket["pos"].to_numpy() < 0
        docs = bucket[is_doc]
        mk = bucket[~is_doc]
        mark_map: dict = {}
        for d, p in zip(mk["doc_id"].to_numpy(), mk["pos"].to_numpy()):
            mark_map.setdefault(d, []).append(p)
        out_ids, out_text, out_rm = [], [], []
        for d, text in zip(docs["doc_id"].to_numpy(), docs[col].to_numpy()):
            ws = text.split(" ") if text else []
            starts = mark_map.get(d)
            if not starts:
                out_ids.append(d); out_text.append(text); out_rm.append(0)
                continue
            diff = np.zeros(len(ws) + 1, np.int64)
            s = np.asarray(starts, dtype=np.int64)
            np.add.at(diff, s, 1)
            np.add.at(diff, np.minimum(s + n, len(ws)), -1)
            covered = np.cumsum(diff[:-1]) > 0
            kept = [w for w, c in zip(ws, covered) if not c]
            out_ids.append(d)
            out_text.append(" ".join(kept))
            out_rm.append(int(covered.sum()))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_ids),
                "clean_text": out_text,
                "n_removed": np.asarray(out_rm, dtype=np.int64),
            }
        )

    both = docs_tagged.union(marks_tagged)
    return bucketed_groupby(both, "doc_id", rebuild, whole_bucket=True)
