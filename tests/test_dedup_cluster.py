"""Near-dup clustering (min-label propagation), minhash join-verify
scale path, IVF ANN recall."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_dup_clusters_components(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.dedup import dup_clusters

    # components: {1,2,3,4} (chain), {10,11}, singleton 20 not in pairs
    pairs = rd.from_items(
        [
            {"id_a": 1, "id_b": 2},
            {"id_a": 2, "id_b": 3},
            {"id_a": 3, "id_b": 4},
            {"id_a": 10, "id_b": 11},
        ]
    )
    out = dup_clusters(pairs, num_buckets=8).to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = dict(zip(out["doc_id"], out["cluster"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dup_clusters_long_chain_pointer_doubling(ray_session):
    """A path component of diameter 64 must converge in ≤9 rounds —
    impossible for one-hop propagation (needs 64), so this pins the
    pointer-doubling shortcut. (Diameter 1000 in 15 rounds verified
    standalone; kept small here for suite runtime — per-round cost is
    fixed Ray shuffle overhead, so chain length barely changes it.)"""
    import ray.data as rd

    from ocrd_cis_ray.stages.dedup import dup_clusters

    pairs = rd.from_pandas(
        pd.DataFrame({"id_a": np.arange(64), "id_b": np.arange(1, 65)})
    )
    out = dup_clusters(pairs, num_buckets=8, max_rounds=9, small_limit=0).to_pandas()
    assert (out["cluster"] == 0).all()
    assert len(out) == 65


def test_dup_clusters_nonconvergence_raises(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.dedup import dup_clusters

    pairs = rd.from_pandas(
        pd.DataFrame({"id_a": np.arange(64), "id_b": np.arange(1, 65)})
    )
    with pytest.raises(RuntimeError, match="did not stabilize"):
        dup_clusters(pairs, num_buckets=8, max_rounds=2, strict=True, small_limit=0)


def test_minhash_join_verify_matches_broadcast(ray_session, sf_dir):
    import ray.data as rd

    from ocrd_cis_ray.stages.dedup import minhash_lsh_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    kw = dict(num_perm=128, bands=32, ngram=3, threshold=0.5, concurrency=1)
    bc = minhash_lsh_pairs(ds, verify_strategy="broadcast", **kw).to_pandas()
    jn = minhash_lsh_pairs(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        verify_strategy="join",
        **kw,
    ).to_pandas()
    key = lambda df: set(zip(df["id_a"].astype(int), df["id_b"].astype(int)))
    assert key(bc) == key(jn)


def test_ivf_recall_vs_brute(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocrd_cis_ray.stages.similarity import brute_topk, ivf_topk

    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qids = qtbl["vec_id"].to_pylist()[:5]
    qmat = np.stack([np.asarray(v, np.float64) for v in qtbl["embedding"].to_pylist()[:5]])

    def pairs(df):
        return set(zip(df["query_id"].astype(int), df["neighbor_id"].astype(int)))

    ds1 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = pairs(brute_topk(ds1, qids, qmat, k=5).to_pandas())
    ds2 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    approx = pairs(ivf_topk(ds2, qids, qmat, k=5, nlist=8, nprobe=4).to_pandas())
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall  # bucketed ANN trades recall for work


def test_embedding_blocked_strategy_recall(ray_session):
    """Blocked (centroid-bucketed) embedding dedup: precision 1 vs the
    exact broadcast path, high recall at a near-dup threshold (clones
    land in the same centroid bucket)."""
    import ray.data as rd

    from ocrd_cis_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 16)) * 3
    rows, vid = [], 0
    for b in base:
        for _ in range(rng.integers(1, 4)):  # 1-3 near-clones each
            rows.append({"vec_id": vid, "embedding": (b + rng.standard_normal(16) * 0.05).tolist()})
            vid += 1
    df = pd.DataFrame(rows)
    ex = embedding_dup_pairs(rd.from_pandas(df), threshold=0.95, strategy="broadcast").to_pandas()
    bl = embedding_dup_pairs(
        rd.from_pandas(df), threshold=0.95, strategy="blocked", nlist=8, assign_top=2,
        sample_size=len(df),
    ).to_pandas()
    pe = set(zip(ex["id_a"].astype(int), ex["id_b"].astype(int)))
    pb = set(zip(bl["id_a"].astype(int), bl["id_b"].astype(int)))
    assert pb <= pe  # no false pairs
    assert len(pe) > 10
    assert len(pe & pb) / len(pe) >= 0.9


def test_remove_dup_substrings_semantics(ray_session):
    """Winner keeps its span; every later occurrence is cut; overlaps
    merge; a fully-duplicated doc empties."""
    import ray.data as rd

    from ocrd_cis_ray.stages.dedup import remove_dup_substrings

    ten = "a b c d e f g h i j"
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                ten + " unique tail words",     # winner: untouched
                "prefix " + ten + " suffix",    # one span removed
                ten,                            # fully removed
                "clean document with no duplicated grams at all here",
            ],
        }
    )
    for nparts in (1, 3):
        got = (
            remove_dup_substrings(rd.from_pandas(df).repartition(nparts), n=10)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(got["clean_text"]) == [
            ten + " unique tail words",
            "prefix suffix",
            "",
            "clean document with no duplicated grams at all here",
        ]
        assert list(got["n_removed"]) == [0, 10, 10, 0]


def test_remove_dup_substrings_overlap_merge(ray_session):
    """Two overlapping duplicated grams in the same doc merge into one
    continuous cut (no double counting)."""
    import ray.data as rd

    from ocrd_cis_ray.stages.dedup import remove_dup_substrings

    # doc 1 contains an 11-word run whose two overlapping 10-grams both
    # duplicate doc 0's; covered words = 11, not 20
    run = "a b c d e f g h i j k"
    df = pd.DataFrame(
        {
            "doc_id": np.array([0, 1], dtype=np.int64),
            "text": [run + " end", "x " + run + " y"],
        }
    )
    got = (
        remove_dup_substrings(rd.from_pandas(df), n=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.loc[1, "clean_text"] == "x y"
    assert got.loc[1, "n_removed"] == 11
    assert got.loc[0, "n_removed"] == 0


def test_dup_clusters_small_gate_parity(ray_session):
    """Driver union-find (small-side gate) and distributed pointer
    doubling give identical (doc_id, cluster) maps — including string
    ids, where cluster is the lexicographic min of the component."""
    import ray.data as rd

    from ocrd_cis_ray.stages.dedup import dup_clusters

    pairs_df = pd.DataFrame(
        {
            "id_a": ["d07", "d03", "d99", "d42", "d11"],
            "id_b": ["d03", "d01", "d98", "d42", "d07"],
        }
    )
    small = (
        dup_clusters(rd.from_pandas(pairs_df), num_buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    dist = (
        dup_clusters(rd.from_pandas(pairs_df), num_buckets=4, small_limit=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(small, dist, check_dtype=False)
    assert dict(zip(small["doc_id"], small["cluster"]))["d11"] == "d01"


def test_pq_recall_vs_brute_and_encode_table(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocrd_cis_ray.stages.similarity import (
        PQCodebooks,
        brute_topk,
        pq_encode,
        pq_topk,
    )

    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qids = qtbl["vec_id"].to_pylist()[:5]
    qmat = np.stack([np.asarray(v, np.float64) for v in qtbl["embedding"].to_pylist()[:5]])

    def pairs(df):
        return set(zip(df["query_id"].astype(int), df["neighbor_id"].astype(int)))

    ds1 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = pairs(brute_topk(ds1, qids, qmat, k=5).to_pandas())
    ds2 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    approx = pairs(pq_topk(ds2, qids, qmat, k=5, m=16, ksub=64).to_pandas())
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall  # 16x-compressed codes trade recall for memory
    # quality under near-ties: approx neighbors should sit in exact top-20
    ds2b = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact20 = pairs(brute_topk(ds2b, qids, qmat, k=20).to_pandas())
    # pq_topk is fully deterministic (seeded codebooks, (dist, id)
    # tie-break), so the approx set already in hand is the one to bound
    assert len(exact20 & approx) / len(approx) >= 0.8

    # layout invariance of the code table + compression arithmetic
    ds3 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    sample = np.stack([np.asarray(v, np.float64) for v in qtbl["embedding"].to_pylist()[:256]])
    books = PQCodebooks(sample, m=16, ksub=32, seed=7)
    t1 = pq_encode(ds3, books).to_pandas().sort_values("vec_id").reset_index(drop=True)
    t2 = (
        pq_encode(ds3.repartition(7), books)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert t1["vec_id"].tolist() == t2["vec_id"].tolist()
    assert [list(a) for a in t1["code"]] == [list(a) for a in t2["code"]]
    assert all(len(c) == 16 for c in t1["code"])  # m bytes per vector


def test_lsh_recall_and_pruning(ray_session, sf_dir):
    """Hyperplane-LSH ANN: decent recall@5 vs brute while exact-scoring
    only bucket-collision candidates (the sub-linear regime beside
    brute/IVF/PQ)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocrd_cis_ray.stages.similarity import brute_topk, lsh_topk

    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qids = qtbl["vec_id"].to_pylist()[:5]
    qmat = np.stack([np.asarray(v, np.float64) for v in qtbl["embedding"].to_pylist()[:5]])

    def pairs(df):
        return set(zip(df["query_id"].astype(int), df["neighbor_id"].astype(int)))

    ds1 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = pairs(brute_topk(ds1, qids, qmat, k=5).to_pandas())
    ds2 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    approx = pairs(lsh_topk(ds2, qids, qmat, k=5, n_tables=16, n_bits=6).to_pandas())
    recall = len(exact & approx) / len(exact)
    # random 64-dim embeddings are the hyperplane-LSH worst case (all
    # pairs near-orthogonal); clustered real corpora recall far higher
    assert recall >= 0.6, recall
    # determinism: same seed, same result
    ds3 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    again = pairs(lsh_topk(ds3, qids, qmat, k=5, n_tables=16, n_bits=6).to_pandas())
    assert again == approx


def test_lsh_candidate_fraction_shrinks_with_bits():
    """More bits per table = finer buckets = fewer candidates (the
    pruning knob actually prunes)."""
    import numpy as np

    from ocrd_cis_ray.stages.similarity import _lsh_buckets

    rng = np.random.default_rng(0)
    mat = rng.standard_normal((2000, 32))
    q = rng.standard_normal((1, 32))
    for bits, max_frac in ((4, 0.35), (10, 0.02)):
        planes = rng.standard_normal((1, bits, 32))
        rb = _lsh_buckets(mat, planes)[0]
        qb = _lsh_buckets(q, planes)[0][0]
        frac = float((rb == qb).mean())
        assert frac <= max_frac, (bits, frac)
