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

from ..util import stable_hash64

# ---------------------------------------------------------------------------
# exact dedup


def add_content_hash(batch: pa.Table, *, column: str = "text") -> pa.Table:
    """Append a 64-bit content hash column (vectorized FNV via numpy)."""
    texts = batch[column]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    hashes = [stable_hash64(t) if t is not None else 0 for t in texts.to_pylist()]
    return batch.append_column("content_hash", pa.array(np.array(hashes, dtype=np.uint64)))


def dedup_exact(ds, *, column: str = "text", key: str = "doc_id"):
    """Exact dedup: hash-partition on content hash, keep min-key row per group.

    groupby(content_hash).map_groups(first) — SURVEY.md §2.7's
    ``doc_id``-dedup generalized to content identity. Deterministic
    winner (min key) so reruns are stable.
    """
    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow", fn_kwargs={"column": column})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(key).head(1).drop(columns=["content_hash"])

    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# word n-gram shingles (shared by jaccard / minhash)


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Distinct 64-bit hashes of word n-gram shingles of one doc."""
    words = text.split(" ") if text else []
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.unique(np.array([stable_hash64(g) for g in grams], dtype=np.uint64))


def shingle_batch(batch: pa.Table, *, n: int = 3) -> pa.Table:
    """Explode docs to (doc_id, shingle:uint64, n_shingles) rows."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_id, out_sh, out_n = [], [], []
    for did, text in zip(ids, texts):
        hs = _shingle_hashes(text or "", n)
        out_id.extend([did] * len(hs))
        out_sh.append(hs)
        out_n.extend([len(hs)] * len(hs))
    sh = np.concatenate(out_sh) if out_sh else np.zeros(0, dtype=np.uint64)
    return pa.table(
        {
            "doc_id": pa.array(out_id),
            "shingle": pa.array(sh),
            "n_shingles": pa.array(np.array(out_n, dtype=np.int64)),
        }
    )


def jaccard_pairs(ds, *, n: int = 3, threshold: float = 0.8):
    """Exact n-gram Jaccard near-dup pairs via a shingle-key shuffle.

    docs → shingle rows → groupby(shingle) emits co-occurring doc pairs
    → groupby(pair) counts shared shingles → jaccard =
    shared / (na + nb - shared) ≥ threshold. Exact (no LSH recall
    loss) — the oracle-checkable baseline for the sketch variants.
    At scale the shingle groupby is the one shuffle; hot shingles
    (stop-phrase skew) are dropped above a frequency cap, which only
    removes pairs already co-occurring on rarer shingles.
    """
    shingled = ds.map_batches(shingle_batch, batch_format="pyarrow", fn_kwargs={"n": n})

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        ns = g["n_shingles"].to_numpy()
        if len(ids) < 2 or len(ids) > 200:  # frequency cap against hot-key blowup
            return pd.DataFrame({"id_a": [], "id_b": [], "n_a": [], "n_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib], "n_a": ns[ia], "n_b": ns[ib]})

    co = shingled.groupby("shingle").map_groups(pairs_of_group, batch_format="pandas")

    def agg_pairs(g: pd.DataFrame) -> pd.DataFrame:
        shared = len(g)
        na, nb = int(g["n_a"].iloc[0]), int(g["n_b"].iloc[0])
        j = shared / (na + nb - shared) if (na + nb - shared) > 0 else 0.0
        if j < threshold:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        return pd.DataFrame({"id_a": [g["id_a"].iloc[0]], "id_b": [g["id_b"].iloc[0]], "jaccard": [j]})

    return co.groupby(["id_a", "id_b"]).map_groups(agg_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature (k permutations).

    Permutation parameters are generated once per actor in __init__
    (universal hashing a*x+b mod p over the 64-bit shingle hashes) —
    the canonical stateful-setup pattern.
    """

    def __init__(self, num_perm: int = 128, ngram: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        # multiply-shift universal hashing in the uint64 wraparound ring:
        # h_i(x) = (a_i * x + b_i) mod 2^64 with odd a_i — vectorized,
        # no big-int arithmetic, adequate permutation family for MinHash
        self.a = (rng.integers(1, np.iinfo(np.int64).max, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, np.iinfo(np.int64).max, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        hs = _shingle_hashes(text, self.ngram)
        if len(hs) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            prod = self.a[:, None] * hs[None, :] + self.b[:, None]  # (k, s) mod 2^64
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(t or "") for t in texts]) if ids else np.zeros((0, self.num_perm), np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "minhash": pa.array(list(sigs), pa.list_(pa.uint64(), self.num_perm)),
            }
        )


def band_batch(batch: pa.Table, *, bands: int = 32, rows: int = 4) -> pa.Table:
    """Signature -> (band_id, band_hash, doc_id) rows for the LSH groupby."""
    ids = batch["doc_id"].to_pylist()
    sigs = batch["minhash"].to_pylist()
    out_id, out_band, out_hash = [], [], []
    for did, sig in zip(ids, sigs):
        s = np.asarray(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = s[b * rows : (b + 1) * rows]
            out_id.append(did)
            out_band.append(b)
            out_hash.append(stable_hash64(",".join(map(str, chunk))))
    return pa.table(
        {
            "doc_id": pa.array(out_id),
            "band_id": pa.array(np.array(out_band, dtype=np.int32)),
            "band_hash": pa.array(np.array(out_hash, dtype=np.uint64)),
        }
    )


def minhash_lsh_pairs(ds, *, num_perm: int = 128, bands: int = 32, ngram: int = 3, threshold: float = 0.8, concurrency: int = 4):
    """MinHash-LSH candidate pairs with estimated Jaccard ≥ threshold.

    shingle→minhash (actor pool) → band rows → groupby(band) buckets →
    candidate pairs → dedup pairs → verify with the estimated Jaccard
    (fraction of equal signature components). The scale path for
    ``jaccard_pairs``: shuffle payload is (band_hash, doc_id), constant
    per doc (bands rows), independent of doc length.
    """
    rows = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "ngram": ngram},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    banded = sigs.map_batches(band_batch, batch_format="pyarrow", fn_kwargs={"bands": bands, "rows": rows})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2 or len(ids) > 200:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = banded.groupby(["band_id", "band_hash"]).map_groups(bucket_pairs, batch_format="pandas")

    def uniq_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    cand = cand.groupby(["id_a", "id_b"]).map_groups(uniq_pairs, batch_format="pandas")

    # verify: join candidate pairs back to signatures (broadcast if small)
    sig_map = {r["doc_id"]: np.asarray(r["minhash"], dtype=np.uint64) for r in sigs.take_all()}
    import ray

    sig_ref = ray.put(sig_map)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        smap = ray.get(sig_ref)
        est = [
            float((smap[a] == smap[b]).mean()) if a in smap and b in smap else 0.0
            for a, b in zip(batch["id_a"], batch["id_b"])
        ]
        batch = batch.assign(est_jaccard=est)
        return batch[batch["est_jaccard"] >= threshold]

    return cand.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash


def simhash_batch(batch: pa.Table, *, ngram: int = 3) -> pa.Table:
    """64-bit SimHash per doc over word-ngram hashes (vectorized bit-count)."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out = np.zeros(len(ids), dtype=np.uint64)
    bits = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    for i, t in enumerate(texts):
        hs = _shingle_hashes(t or "", ngram)
        if len(hs) == 0:
            continue
        bm = (hs[:, None] & bits) != 0  # (s, 64) bool
        votes = bm.sum(axis=0) * 2 - len(hs)
        out[i] = np.sum(bits[0][votes > 0], dtype=np.uint64)
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

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        vals = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2 or len(ids) > 500:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        x = vals[ia] ^ vals[ib]
        ham = np.array([bin(v).count("1") for v in x])
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep], "hamming": ham[keep].astype(np.int32)})

    pairs = blocked.groupby(["block_id", "block_key"]).map_groups(bucket, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


def embedding_dup_pairs(ds, *, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Embedding near-dup pairs with cosine ≥ threshold.

    Brute-force within LSH-ish buckets would lose recall; for the
    oracle-checked variant we do blocked brute force: each batch holds
    its vectors; the full (small) matrix is broadcast once via
    ``ray.put`` and each batch computes its block-vs-all similarities
    with one float64 matmul — O(n²) flops but only O(n·d) bytes moved
    (the broadcast), the right trade at ≤1M vectors. Pairs emitted with
    id_a < id_b.
    """
    import ray

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
