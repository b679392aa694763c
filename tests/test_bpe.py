"""BPE training + encoding: merge-table parity with a brute-force
reference, encoding invariants, and layout invariance of training."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd


def _brute_bpe(texts, num_merges):
    """Readable reference: count words, loop merges on symbol seqs."""
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    words = {tuple(w) + ("</w>",): c for w, c in wc.items()}
    merges = []
    for rank in range(num_merges):
        pairs = Counter()
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs or max(pairs.values()) < 2:
            break
        bc = max(pairs.values())
        a, b = min(p for p, c in pairs.items() if c == bc)
        merges.append((rank, a, b, bc))
        nw = {}
        for sym, c in words.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nw[tuple(out)] = nw.get(tuple(out), 0) + c
        words = nw
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide wide low",
    "low newer wide lowest",
]


def test_train_bpe_matches_brute_force(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.bpe import train_bpe

    df = pd.DataFrame(
        {"doc_id": np.arange(len(TEXTS), dtype=np.int64), "text": TEXTS}
    )
    want = _brute_bpe(TEXTS, 20)
    for nparts in (1, 3):
        got = train_bpe(
            rd.from_pandas(df).repartition(nparts), num_merges=20
        )
        assert [tuple(r) for r in got.to_numpy()] == want, nparts


def test_encode_word_greedy_lowest_rank():
    from ocrd_cis_ray.stages.bpe import encode_word

    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("w", "</w>"): 2}
    assert encode_word("low", ranks) == ["low", "</w>"]
    assert encode_word("slow", ranks) == ["s", "low", "</w>"]
    assert encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_bpe_pipeline_counts(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.bpe import bpe_pipeline, encode_word, train_bpe

    df = pd.DataFrame(
        {"doc_id": np.arange(len(TEXTS), dtype=np.int64), "text": TEXTS}
    )
    ds = rd.from_pandas(df)
    merges, encoded = bpe_pipeline(ds, num_merges=20)
    out = encoded.to_pandas().sort_values("doc_id").reset_index(drop=True)
    ranks = {(r.left, r.right): int(r.rank) for r in merges.itertuples()}
    for i, t in enumerate(TEXTS):
        ws = t.split(" ")
        assert out.loc[i, "n_words"] == len(ws)
        assert out.loc[i, "n_tokens"] == sum(
            len(encode_word(w, ranks)) for w in ws
        )
    # merging strictly reduces token count vs character count
    assert (out["n_tokens"] < df["text"].str.len() + out["n_words"]).all()
