"""Distributed k-means + SemDeDup: blob recovery, duplicate collapse,
and stability across block layouts on separated data."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _blobs(n_per=40, k=4, d=16, seed=3, dup_frac=0.25):
    """k well-separated unit blobs; a fraction of points are near-exact
    copies of an earlier point in the same blob."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # push them apart
    centers = np.where(np.eye(k, d, dtype=bool), np.sign(centers) * 4, centers * 0.1)
    rows, labels, dup_src = [], [], []
    vid = 0
    originals: list[tuple[int, np.ndarray]] = []
    for c in range(k):
        base = []
        for i in range(n_per):
            if i > 0 and rng.rand() < dup_frac:
                src_id, src_vec = base[rng.randint(len(base))]
                v = src_vec + rng.randn(d) * 1e-4
                dup_src.append((vid, src_id))
            else:
                v = centers[c] + rng.randn(d) * 0.05
                base.append((vid, v))
            rows.append(v)
            labels.append(c)
            vid += 1
    df = pd.DataFrame(
        {
            "vec_id": np.arange(vid, dtype=np.int64),
            "embedding": [r.astype(np.float32).tolist() for r in rows],
            "label": np.asarray(labels, dtype=np.int64),
        }
    )
    return df, dict(dup_src)


def test_kmeans_recovers_blobs(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.similarity import kmeans

    df, _ = _blobs()
    ds = rd.from_pandas(df[["vec_id", "embedding"]]).repartition(3)
    out, cent = kmeans(ds, k=4, n_iter=6)
    a = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert cent.shape == (4, 16)
    # purity: every true blob maps to exactly one k-means cluster
    merged = a.assign(label=df["label"].to_numpy())
    for lbl, g in merged.groupby("label"):
        assert g["cluster"].nunique() == 1, f"blob {lbl} split"
    assert merged["cluster"].nunique() == 4
    assert (merged["centroid_sim"] > 0.9).all()


def test_semdedup_collapses_near_dups(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.similarity import semdedup

    df, dup_src = _blobs()
    ds = rd.from_pandas(df[["vec_id", "embedding"]]).repartition(4)
    out = (
        semdedup(ds, k=4, n_iter=6, threshold=0.99999)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(df)
    by_id = out.set_index("vec_id")
    # every synthesized duplicate is dropped, pointing at a kept row
    for dup_id, src_id in dup_src.items():
        assert by_id.loc[dup_id, "keep"] == 0, dup_id
        anchor = by_id.loc[dup_id, "dup_of"]
        assert by_id.loc[anchor, "keep"] == 1
        assert anchor < dup_id  # kept row is the smallest id of its group
    # originals that nobody duplicated survive
    dropped = set(out.loc[out["keep"] == 0, "vec_id"])
    assert dropped == set(dup_src.keys())


def test_semdedup_layout_stable_on_separated_data(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.similarity import semdedup

    df, _ = _blobs(seed=11)
    ref = None
    for nparts in (1, 5):
        out = (
            semdedup(
                rd.from_pandas(df[["vec_id", "embedding"]]).repartition(nparts),
                k=4,
                n_iter=6,
                threshold=0.99999,
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        keepers = out[["vec_id", "keep", "dup_of"]]
        if ref is None:
            ref = keepers
        else:
            pd.testing.assert_frame_equal(ref, keepers)
