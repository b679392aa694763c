"""Curation compose: stage precedence, duplicate flagging, and
layout invariance of the composed decision."""

from __future__ import annotations

import numpy as np
import pandas as pd


# Long enough that no single n-gram dominates the char count (the
# A1.2 thresholds presuppose real-length documents) and carrying >= 2
# distinct Gopher stopwords.
GOOD = (
    " ".join(f"word{i:03d}" for i in range(90))
    + " the of and to be that have with more filler"
)


def test_curation_stages_and_precedence(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.curation import curate_corpus

    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                GOOD,                       # kept
                GOOD,                       # exact duplicate -> 'duplicate'
                "x " * 7,                   # too short -> 'gopher'
                ("spam ham " * 30).strip()
                + " the of and to be that have with",  # repetitive -> 'repetition'
                GOOD + " extra tail",       # kept (distinct text)
            ],
        }
    )
    out = (
        curate_corpus(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["drop_stage"]) == [
        "kept",
        "duplicate",
        "gopher",
        "repetition",
        "kept",
    ]
    assert list(out["keep"]) == [1, 0, 0, 0, 1]
    # gopher failure wins over duplicate status in precedence: a doc
    # can fail several gates but reports the FIRST
    assert out.loc[2, "pass_gopher"] == 0


def test_curation_layout_invariant(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.curation import curate_corpus

    rng = np.random.RandomState(5)
    base = GOOD.split(" ")
    texts = [
        " ".join(rng.permutation(base).tolist()) for _ in range(20)
    ] + [GOOD] * 3
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    ref = None
    for nparts in (1, 4):
        got = (
            curate_corpus(rd.from_pandas(df).repartition(nparts))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        if ref is None:
            ref = got
        else:
            pd.testing.assert_frame_equal(ref, got)
    # exactly one of the three identical docs is canonical
    dups = ref[ref["doc_id"] >= 20]
    assert list(dups["is_canonical"]) == [1, 0, 0]
