"""Gopher quality filter + C4-style corpus line dedup.

Pins the vectorized Gopher features against a straightforward local
recomputation (the oracle contract), each individual rule's
pass/fail behavior, and dedup_lines' global-first-winner semantics
under arbitrary block layouts (the winner must not depend on
partitioning)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _t(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_gopher_features_match_brute_force():
    from ocrd_cis_ray.stages.textops import GOPHER_STOPWORDS, gopher_quality_batch

    texts = [
        "the cat sat on the mat with all of that and more to be had here now",
        "#### ... #### zz",
        "a b c d e f g h i j k l m n o p",  # short words -> mean_word_len < 3
        "the of and to be that have with plus normal words making this pass easily today",
    ]
    out = gopher_quality_batch(_t(texts)).to_pandas()
    for i, text in enumerate(texts):
        ws = text.split(" ")
        n = len(ws)
        assert out.loc[i, "n_words"] == n
        assert out.loc[i, "mean_word_len"] == (len(text) - (n - 1)) / n
        assert out.loc[i, "symbol_ratio"] == (
            text.count("#") + text.count("...")
        ) / n
        assert out.loc[i, "frac_alpha_words"] == (
            sum(any(c.isalpha() and c.isascii() for c in w) for w in ws) / n
        )
        assert out.loc[i, "n_stop_distinct"] == len(
            set(ws) & set(GOPHER_STOPWORDS)
        )
    assert list(out["pass_filter"]) == [1, 0, 0, 1]


def test_gopher_each_rule_fails_independently():
    from ocrd_cis_ray.stages.textops import gopher_quality_batch

    base = "the cat sat on the mat with all of that and more to be had here"
    cases = {
        "too_few_words": "the of a b",
        "long_words": " ".join(["extraordinarily"] * 16) + " the of",
        "symbols": base + " " + "# " * 4,
        "no_alpha": " ".join(["123"] * 14) + " the of",
        "no_stopwords": " ".join(["alpha beta gamma delta"] * 4),
    }
    out = gopher_quality_batch(_t([base, *cases.values()])).to_pandas()
    assert out.loc[0, "pass_filter"] == 1
    assert list(out["pass_filter"][1:]) == [0] * len(cases)


def test_explode_lines_separator_and_window():
    from ocrd_cis_ray.stages.dedup import explode_lines_batch

    t = _t(["a b. c d. e", "c d. x y"])
    sep = explode_lines_batch(t).to_pandas()
    assert list(sep["line"]) == ["a b", "c d", "e", "c d", "x y"]
    assert list(sep["line_no"]) == [0, 1, 2, 0, 1]
    win = explode_lines_batch(_t(["a b c d e"]), window_words=2).to_pandas()
    assert list(win["line"]) == ["a b", "c d", "e"]


def test_dedup_lines_global_first_winner(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.dedup import dedup_lines

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "shared line. unique zero",
                "unique one. shared line",
                "shared line. unique two",
                "unique three",
                "unique one. last bit",
                "shared line",
            ],
        }
    )
    want = {
        (0, 0, "shared line"),
        (0, 1, "unique zero"),
        (1, 0, "unique one"),
        (2, 1, "unique two"),
        (3, 0, "unique three"),
        (4, 1, "last bit"),
    }
    for nparts in (1, 3, 6):
        ds = rd.from_pandas(df).repartition(nparts)
        got = dedup_lines(ds).to_pandas()
        assert {
            (int(r.doc_id), int(r.line_no), r.line) for r in got.itertuples()
        } == want


def test_dedup_lines_window_mode(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.dedup import dedup_lines

    dup = "one two three four five six seven eight nine ten"
    df = pd.DataFrame(
        {
            "doc_id": np.array([0, 1], dtype=np.int64),
            "text": [dup + " tail words here", dup],
        }
    )
    got = dedup_lines(rd.from_pandas(df), window_words=10).to_pandas()
    # doc 1's copy of the 10-word window is dropped; doc 0 keeps both
    assert set(map(tuple, got[["doc_id", "line_no"]].to_numpy())) == {
        (0, 0),
        (0, 1),
    }
