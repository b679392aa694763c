"""Benchmark decontamination + duplicate-n-gram statistics.

Hand-computable fixtures: hash-based membership/df counts must equal
string-level n-gram set arithmetic exactly (collision probability at
test scale ~1e-15)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _ds(rows):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([r[0] for r in rows], dtype=np.int64),
                "text": [r[1] for r in rows],
            }
        )
    )


def test_benchmark_ngram_hashes_distinct(ray_session):
    from ocrd_cis_ray.stages.contamination import benchmark_ngram_hashes

    # "a b c d" -> {abc, bcd}; "b c d e" -> {bcd, cde}; union = 3
    bench = _ds([(1, "a b c d"), (2, "b c d e")])
    h = benchmark_ngram_hashes(bench, n=3)
    assert h.size == 3
    assert np.array_equal(h, np.sort(h)) and h.dtype == np.uint64


def test_benchmark_ngram_hashes_cap_raises(ray_session):
    from ocrd_cis_ray.stages.contamination import benchmark_ngram_hashes

    with pytest.raises(ValueError, match="max_ngrams"):
        benchmark_ngram_hashes(_ds([(1, "a b c d e f")]), n=3, max_ngrams=2)


def test_contamination_counts(ray_session):
    from ocrd_cis_ray.stages.contamination import (
        benchmark_ngram_hashes,
        contamination_counts,
    )

    bench = _ds([(100, "a b c d e")])  # grams {abc, bcd, cde}
    corpus = _ds(
        [
            (1, "a b c d x"),  # grams {abc, bcd, cdx}: 2 hits
            (2, "p q r s"),  # grams {pqr, qrs}: 0 hits
            (3, "a b"),  # short: 0 grams, still one output row
            (4, "c d e"),  # gram {cde}: 1 hit
        ]
    ).repartition(2)
    h = benchmark_ngram_hashes(bench, n=3)
    out = (
        contamination_counts(corpus, h, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [
        [1, 3, 2],
        [2, 2, 0],
        [3, 0, 0],
        [4, 1, 1],
    ]


def test_contamination_counts_empty_benchmark(ray_session):
    from ocrd_cis_ray.stages.contamination import contamination_counts

    corpus = _ds([(1, "a b c d")])
    out = contamination_counts(corpus, np.zeros(0, np.uint64), n=3).to_pandas()
    assert out["n_contaminated"].tolist() == [0]
    assert out["n_ngrams"].tolist() == [2]


def test_dup_ngram_stats(ray_session):
    from ocrd_cis_ray.stages.contamination import dup_ngram_stats

    corpus = _ds(
        [
            (1, "a b c d"),  # {abc, bcd}
            (2, "a b c x"),  # {abc, bcx}
            (3, "q r s"),  # {qrs}
            (4, "z z"),  # <3 words: no shingles, absent from output
        ]
    ).repartition(3)
    out = (
        dup_ngram_stats(corpus, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # 'a b c' occurs in docs 1 and 2 -> duplicate; all else unique
    assert out[["doc_id", "n_ngrams", "n_dup_ngrams"]].values.tolist() == [
        [1, 2, 1],
        [2, 2, 1],
        [3, 1, 0],
    ]


def test_dup_ngram_repeated_gram_within_doc_counts_once(ray_session):
    from ocrd_cis_ray.stages.contamination import dup_ngram_stats

    # 'a b a b a b' grams: aba, bab, aba, bab -> distinct {aba, bab};
    # both also in doc 2 -> n_dup 2 (per-doc-distinct, not occurrences)
    corpus = _ds([(1, "a b a b a b"), (2, "x a b a b")])
    out = dup_ngram_stats(corpus, n=3).to_pandas().sort_values("doc_id")
    assert out[out["doc_id"] == 1]["n_ngrams"].iloc[0] == 2
    assert out[out["doc_id"] == 1]["n_dup_ngrams"].iloc[0] == 2
    assert out[out["doc_id"] == 2]["n_ngrams"].iloc[0] == 3
    assert out[out["doc_id"] == 2]["n_dup_ngrams"].iloc[0] == 2
