"""Model-based quality scoring (stages/quality_clf.py).

Pins (a) bit-exact brute-force parity of the distributed closed-form
ridge training (integer sufficient statistics make it layout-
independent), (b) exact invariance under repartitioning, and (c) that
the learned scores actually separate two synthetic vocabularies."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _docs(n=120, seed=3):
    rng = np.random.default_rng(seed)
    good_vocab = [f"edu{i}" for i in range(30)]
    bad_vocab = [f"spam{i}" for i in range(30)]
    rows = []
    for i in range(n):
        good = i % 2 == 0
        vocab = good_vocab if good else bad_vocab
        words = list(rng.choice(vocab, size=12 + i % 9))
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(words),
                "lang": "en" if good else "xx",
            }
        )
    return pd.DataFrame(rows)


def _brute_model(df, d, ridge):
    from ocrd_cis_ray.stages.quality_clf import _doc_count_matrix

    x = _doc_count_matrix(list(df["text"]), d)
    y = (df["lang"] == "en").to_numpy(np.int64)
    a = x.T @ x
    b = x.T @ y
    return np.linalg.solve(a + ridge * np.eye(d + 1), b.astype(np.float64))


def test_train_matches_brute_force_and_layout_invariant(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.quality_clf import train_quality_clf

    df = _docs()
    want = _brute_model(df, d=64, ridge=1.0)
    for parts in (1, 5):
        ds = rd.from_pandas(df).repartition(parts)
        model = train_quality_clf(ds, d=64, ridge=1.0)
        # integer sufficient statistics -> the reduced A, b are exact,
        # so the solved weights match brute force to solver precision
        np.testing.assert_allclose(model["w"], want, rtol=0, atol=1e-9)


def test_scores_separate_vocabularies(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.quality_clf import quality_pipeline

    df = _docs()
    ds = rd.from_pandas(df).repartition(4)
    out = quality_pipeline(ds, d=64).to_pandas().sort_values("doc_id")
    good = out["doc_id"] % 2 == 0
    assert out.loc[good, "quality_score"].min() > out.loc[~good, "quality_score"].max()
    assert (out.loc[good, "keep_quality"]).all()
    assert (~out.loc[~good, "keep_quality"]).all()


def test_empty_and_degenerate_docs(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.quality_clf import score_quality, train_quality_clf

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["", "alpha beta", "", "alpha alpha alpha"],
            "lang": ["xx", "en", "xx", "en"],
        }
    )
    ds = rd.from_pandas(df)
    model = train_quality_clf(ds, d=16, ridge=1.0)
    out = score_quality(ds, model).to_pandas().sort_values("doc_id")
    # empty docs score the bias weight alone and don't crash
    assert len(out) == 4 and np.isfinite(out["quality_score"]).all()
    assert out.loc[out["doc_id"] == 1, "quality_score"].iloc[0] > out.loc[
        out["doc_id"] == 0, "quality_score"
    ].iloc[0]
