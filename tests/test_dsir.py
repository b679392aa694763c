"""DSIR importance weights: brute-force parity, target-direction
sanity, and layout invariance (integer counts -> deterministic)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _brute_weights(df, buckets, alpha=0.5):
    import sys

    from ocrd_cis_ray.stages.dsir import _MULT

    def feats(text):
        ws = text.split(" ") if text else []
        h = pd.util.hash_array(np.asarray(ws, dtype=object)).astype(np.uint64)
        out = list(h)
        with np.errstate(over="ignore"):
            out += [h[i] * _MULT ^ h[i + 1] for i in range(len(h) - 1)]
        return [int(x % np.uint64(buckets)) for x in out]

    tc = np.zeros(buckets)
    rc = np.zeros(buckets)
    for r in df.itertuples():
        for f in feats(r.text):
            rc[f] += 1
            if r.lang == "en":
                tc[f] += 1
    pt = (tc + alpha) / (tc.sum() + alpha * buckets)
    pr = (rc + alpha) / (rc.sum() + alpha * buckets)
    ratio = np.log(pt / pr)
    return {
        int(r.doc_id): float(sum(ratio[f] for f in feats(r.text)))
        for r in df.itertuples()
    }


def _corpus():
    rng = np.random.RandomState(4)
    en = ["the quick brown fox", "a lazy dog sleeps", "the fox and the dog"]
    de = ["der schnelle fuchs", "ein fauler hund schlaeft", "der fuchs und der hund"]
    rows = []
    for i in range(30):
        if i % 2 == 0:
            rows.append((i, en[i % 3] + f" extra{i}", "en"))
        else:
            rows.append((i, de[i % 3] + f" extra{i}", "de"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).astype(
        {"doc_id": np.int64}
    )


def test_dsir_matches_brute_force(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.dsir import dsir_weights

    df = _corpus()
    want = _brute_weights(df, buckets=512)
    for nparts in (1, 4):
        out = (
            dsir_weights(
                rd.from_pandas(df).repartition(nparts), buckets=512
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for r in out.itertuples():
            assert abs(r.log_weight - want[int(r.doc_id)]) < 1e-9


def test_dsir_targets_score_higher(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.dsir import dsir_weights

    df = _corpus()
    out = dsir_weights(rd.from_pandas(df), buckets=512).to_pandas()
    merged = out.merge(df[["doc_id", "lang"]], on="doc_id")
    en_mean = merged.loc[merged["lang"] == "en", "log_weight"].mean()
    de_mean = merged.loc[merged["lang"] == "de", "log_weight"].mean()
    assert en_mean > 0 > de_mean


def test_dsir_trailing_empty_doc_does_not_corrupt_neighbor(ray_session):
    """Regression: a zero-feature doc at the END of a batch must not
    steal the previous doc's last feature (reduceat offset clamping)."""
    import ray.data as rd

    from ocrd_cis_ray.stages.dsir import dsir_weights

    base = pd.DataFrame(
        {
            "doc_id": np.array([0, 1], dtype=np.int64),
            "text": ["the quick brown fox", "the quick brown fox"],
            "lang": ["en", "en"],
        }
    )
    with_empty = pd.DataFrame(
        {
            "doc_id": np.array([0, 1], dtype=np.int64),
            "text": ["the quick brown fox", ""],
            "lang": ["en", "en"],
        }
    )
    a = dsir_weights(rd.from_pandas(base), buckets=64).to_pandas()
    b = dsir_weights(rd.from_pandas(with_empty), buckets=64).to_pandas()
    # doc 0 has identical features in both corpora relative to its own
    # content; the point is that scoring COMPLETES and doc 0's weight
    # reflects ALL its features (sum over 7 features, not 6)
    assert b.loc[b.doc_id == 0, "n_features"].iloc[0] == 7
    assert np.isfinite(b["log_weight"]).all()
