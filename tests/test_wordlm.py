"""Word-level Stupid-Backoff LM (stages/wordlm.py): brute-force dict
reference parity at 1e-9, backoff semantics, layout invariance."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from ocrd_cis_ray.stages.wordlm import (
    BACKOFF,
    score_batch,
    train_word_lm,
    word_lm_scores,
)


def _brute_model(texts, n=3):
    from collections import Counter

    counts = {k: Counter() for k in range(1, n + 1)}
    total = 0
    for t in texts:
        ws = t.split()
        total += len(ws)
        for k in range(1, n + 1):
            for i in range(len(ws) - k + 1):
                counts[k][tuple(ws[i : i + k])] += 1
    return counts, total


def _brute_score(text, counts, total, n=3):
    ws = text.split()
    if not ws:
        return 0.0
    logs = []
    for i, w in enumerate(ws):
        mult = 1.0
        s = None
        for k in range(min(n, i + 1), 1, -1):
            num = counts[k].get(tuple(ws[i - k + 1 : i + 1]), 0)
            den = counts[k - 1].get(tuple(ws[i - k + 1 : i]), 0)
            if num > 0 and den > 0:
                s = mult * num / den
                break
            mult *= BACKOFF
        if s is None:
            c1 = counts[1].get((w,), 0)
            s = mult * (c1 + 0.5) / (total + 0.5)
        logs.append(math.log10(s))
    return sum(logs) / len(logs)


TEXTS = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log",
    "the fish swam",
    "completely novel words here",
    "",
    "the",
    "the cat sat on the mat again and again",
]


def test_score_matches_brute_force():
    import ray.data as rd

    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)]
    ).repartition(3)
    got = (
        word_lm_scores(ds, n=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    counts, total = _brute_model(TEXTS)
    for i, t in enumerate(TEXTS):
        want = _brute_score(t, counts, total)
        assert got.loc[i, "logscore"] == pytest.approx(want, abs=1e-9), t
        assert got.loc[i, "n_tokens"] == len(t.split())


def test_trigram_hit_beats_backoff():
    # 'the cat sat' is a training trigram -> its third token scores
    # c(the cat sat)/c(the cat) with no backoff penalty; a novel
    # continuation pays 0.4 per level
    counts, total = _brute_model(TEXTS)
    hit = _brute_score("the cat sat", counts, total)
    miss = _brute_score("the cat swam", counts, total)
    assert hit > miss


def test_model_layout_invariance():
    import ray.data as rd

    items = [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)]
    m1 = train_word_lm(rd.from_items(items).repartition(1), n=3)
    m7 = train_word_lm(rd.from_items(items).repartition(7), n=3)
    assert m1["total"] == m7["total"]
    for k in (1, 2, 3):
        assert np.array_equal(m1[f"h{k}"], m7[f"h{k}"])
        assert np.array_equal(m1[f"c{k}"], m7[f"c{k}"])


def test_empty_doc_scores_zero_tokens():
    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": [""]})
    counts, total = _brute_model(TEXTS)
    model = {"n": 3, "total": total}
    import pandas as pd

    for k in (1, 2, 3):
        model[f"h{k}"] = np.zeros(0, np.uint64)
        model[f"c{k}"] = np.zeros(0, np.int64)
    out = score_batch(t, model=model).to_pylist()[0]
    assert out["n_tokens"] == 0 and out["logscore"] == 0.0
