"""Corpus sampling / chunking / packing operators.

Covers the selection operators' determinism (hash filters must equal a
brute-force local computation exactly — that is the oracle contract),
the exactness of per-group top-k under arbitrary block layouts, and
pack_sequences' conservation invariants (layout is block-dependent by
design, so invariants — not layouts — are what's pinned)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _docs(n=200, seed=7):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "fr", "zh", "xx"])
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": langs[rng.integers(0, len(langs), n)],
            "text": [
                " ".join(f"w{rng.integers(0, 50)}" for _ in range(rng.integers(1, 40)))
                for _ in range(n)
            ],
        }
    )


def test_sample_fraction_matches_brute_force(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import knuth_hash32, sample_fraction

    df = _docs()
    ds = rd.from_pandas(df).repartition(5)
    got = sample_fraction(ds, 0.3).to_pandas()["doc_id"].sort_values().to_numpy()
    h = knuth_hash32(df["doc_id"].to_numpy())
    want = df["doc_id"][h < int(0.3 * (1 << 32))].sort_values().to_numpy()
    assert np.array_equal(got, want)
    assert 0 < len(got) < len(df)
    # boundary rates
    assert sample_fraction(rd.from_pandas(df), 0.0).count() == 0
    assert sample_fraction(rd.from_pandas(df), 1.0).count() == len(df)


def test_stratified_sample_rates_and_default(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import knuth_hash32, stratified_sample

    df = _docs()
    rates = {"en": 1.0, "de": 0.5, "zh": 0.0}
    ds = rd.from_pandas(df).repartition(4)
    got = (
        stratified_sample(ds, rates, default_rate=0.25)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    h = knuth_hash32(df["doc_id"].to_numpy())
    thr = np.array(
        [int(rates.get(l, 0.25) * (1 << 32)) for l in df["lang"]], dtype=np.int64
    )
    want = df[h < thr].sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    # every 'en' kept, no 'zh' kept
    assert set(df[df["lang"] == "en"]["doc_id"]) <= set(got["doc_id"])
    assert not set(df[df["lang"] == "zh"]["doc_id"]) & set(got["doc_id"])


def test_sample_per_group_exact_and_layout_invariant(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import knuth_hash32, sample_per_group

    df = _docs()
    k = 7

    def brute(df):
        d = df.assign(__h=knuth_hash32(df["doc_id"].to_numpy()))
        d = d.sort_values(["__h", "doc_id"], kind="mergesort")
        return d.groupby("lang", sort=False).head(k)

    want = set(brute(df)["doc_id"])
    for nparts in (1, 6):
        ds = rd.from_pandas(df).repartition(nparts)
        got = sample_per_group(ds, k, group="lang").to_pandas()
        assert set(got["doc_id"]) == want, nparts
        assert (got.groupby("lang").size() <= k).all()
    # k above the smallest group size keeps that whole group
    small = df[df["lang"] == "xx"]
    got = sample_per_group(rd.from_pandas(df), 10_000, group="lang").to_pandas()
    assert len(got) == len(df)
    assert set(got.columns) == set(df.columns)
    assert set(small["doc_id"]) <= set(got["doc_id"])


def test_chunk_documents_windows(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import chunk_documents

    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": ["a b c d e", "x", ""],  # 5, 1, 1 tokens ("" = one empty token)
        }
    )
    out = (
        chunk_documents(rd.from_pandas(df), chunk_tokens=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_no"])
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [
        [1, 0, 2],
        [1, 1, 2],
        [1, 2, 1],
        [2, 0, 1],
        [3, 0, 1],
    ]


def test_chunk_documents_conserves_tokens(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import chunk_documents

    df = _docs()
    total = int(sum(len(t.split(" ")) for t in df["text"]))
    out = chunk_documents(rd.from_pandas(df).repartition(3), chunk_tokens=8).to_pandas()
    assert int(out["n_tokens"].sum()) == total
    assert out["n_tokens"].between(1, 8).all()


def test_pack_sequences_invariants(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import pack_sequences

    df = _docs()
    total = int(sum(len(t.split(" ")) for t in df["text"]))
    out = pack_sequences(rd.from_pandas(df).repartition(4), seq_len=64).to_pandas()
    assert int(out["n_tokens"].sum()) == total  # conservation across blocks
    assert (out["n_tokens"] <= 64).all()
    assert (out["fill"] <= 1.0).all() and (out["fill"] > 0).all()
    assert (out["n_pieces"] >= 1).all()
    assert out["seq_id"].is_unique


def test_pack_sequences_greedy_layout_single_block(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import pack_sequences

    # one block: doc 1 has 20 tokens (L=8 -> chunks 8,8,4), doc 2 has 3,
    # doc 3 has 2. Greedy: [8] [8] [4,3] [2] -> wait: 4+3=7<=8, then 2
    # overflows (7+2>8) -> seqs (8),(8),(7),(2)
    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [
                " ".join(["t"] * 20),
                " ".join(["u"] * 3),
                " ".join(["v"] * 2),
            ],
        }
    )
    out = pack_sequences(rd.from_pandas(df), seq_len=8).to_pandas()
    assert sorted(out["n_tokens"]) == [2, 7, 8, 8]
    row = out[out["n_tokens"] == 7].iloc[0]
    assert row["n_pieces"] == 2 and row["n_docs"] == 2
    assert row["fill"] == pytest.approx(7 / 8)


def _brute_ntile(df: pd.DataFrame, k: int, group="lang", score="score", idc="doc_id"):
    """ANSI NTILE(k) OVER (PARTITION BY group ORDER BY score, id)."""
    ref = df.sort_values([group, score, idc], kind="mergesort").copy()
    tiers = []
    for _, sub in ref.groupby(group, sort=False):
        n = len(sub)
        base, extra = divmod(n, k)
        t = np.repeat(np.arange(1, k + 1), [base + 1] * extra + [base] * (k - extra))
        tiers.append(pd.Series(t[:n], index=sub.index))
    ref["tier"] = pd.concat(tiers)
    return ref.sort_values(idc).reset_index(drop=True)


@pytest.mark.parametrize("k", [1, 2, 3, 7])
def test_grouped_ntile_matches_window_semantics(ray_session, k):
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import grouped_ntile

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["de", "en", "fr", "la"], n, p=[0.5, 0.3, 0.15, 0.05]),
            # heavy ties: every tile boundary lands inside a tied score
            "score": rng.integers(0, 25, n).astype(np.int64),
        }
    )
    got = (
        grouped_ntile(
            rd.from_pandas(df).repartition(13),
            n_tiles=k,
            group="lang",
            score_col="score",
            id_col="doc_id",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _brute_ntile(df, k)
    assert (got["tier"].to_numpy() == ref["tier"].to_numpy()).all()


def test_grouped_ntile_small_groups_and_string_ids(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import grouped_ntile

    # fewer rows than tiles: NTILE gives each row its own tile
    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], dtype=np.int64),
            "lang": ["xx", "xx"],
            "score": np.array([5, 5], dtype=np.int64),
        }
    )
    got = (
        grouped_ntile(rd.from_pandas(df), n_tiles=3, group="lang",
                      score_col="score", id_col="doc_id")
        .to_pandas().sort_values("doc_id")
    )
    assert got["tier"].tolist() == [1, 2]

    # string ids order the all-tied group lexicographically
    df2 = pd.DataFrame(
        {
            "doc_id": [f"d{i:03d}" for i in range(9)],
            "lang": ["en"] * 9,
            "score": np.zeros(9, dtype=np.int64),
        }
    )
    got2 = (
        grouped_ntile(rd.from_pandas(df2).repartition(3), n_tiles=3, group="lang",
                      score_col="score", id_col="doc_id")
        .to_pandas().sort_values("doc_id")
    )
    assert got2["tier"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_mixture_sample_matches_brute_force_and_respects_budget(ray_session):
    import math

    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import KNUTH, mixture_sample

    rng = np.random.default_rng(5)
    n = 1200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1]),
            "text": [
                " ".join(["w"] * int(k)) for k in rng.integers(1, 60, n)
            ],
        }
    )
    weights = {"a": 1.0, "b": 3.0, "c": 10.0}
    got = (
        mixture_sample(rd.from_pandas(df).repartition(7), weights=weights,
                       budget_fraction=0.5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # brute force with the identical float op order
    ntok = df["text"].str.count(" ") + 1
    tok = ntok.groupby(df["source"]).sum().astype(float)
    budget = math.floor(0.5 * float(tok.sum()))
    sumw = sum(weights.values())
    thr = {
        s: math.floor(min(1.0, ((budget * weights[s]) / sumw) / float(tok[s]))
                      * 4294967296.0)
        for s in tok.index
    }
    h = (df["doc_id"].to_numpy().astype(np.int64) * KNUTH) % (1 << 32)
    keep = h < np.array([thr[s] for s in df["source"]])
    ref = df.loc[keep].copy()
    ref["n_tokens"] = ntok[keep]
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["n_tokens"].tolist() == ref["n_tokens"].tolist()
    # the scarce high-weight source is rate-capped at 1.0 (all kept)
    assert (got["source"] == "c").sum() == (df["source"] == "c").sum()
    # abundant low-weight source is subsampled
    assert (got["source"] == "a").sum() < (df["source"] == "a").sum()


def test_grouped_ntile_property(ray_session):
    """Randomized parity sweep: many (group count, tie density, k)
    shapes against the brute NTILE, one ray session."""
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import grouped_ntile

    rng = np.random.default_rng(23)
    for trial in range(6):
        n = int(rng.integers(1, 400))
        n_groups = int(rng.integers(1, 6))
        score_range = int(rng.integers(1, 8))  # brutal tie density
        k = int(rng.integers(1, 6))
        df = pd.DataFrame(
            {
                "doc_id": rng.permutation(np.arange(n, dtype=np.int64) * 7 + 3),
                "lang": rng.choice([f"g{i}" for i in range(n_groups)], n),
                "score": rng.integers(0, score_range, n).astype(np.int64),
            }
        )
        got = (
            grouped_ntile(
                rd.from_pandas(df).repartition(int(rng.integers(1, 9))),
                n_tiles=k, group="lang", score_col="score", id_col="doc_id",
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        ref = _brute_ntile(df, k)
        assert (got["tier"].to_numpy() == ref["tier"].to_numpy()).all(), (
            trial, n, n_groups, score_range, k,
        )


def test_grouped_percentiles_matches_brute_force(ray_session):
    import math

    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import grouped_percentiles

    rng = np.random.default_rng(31)
    n = 2500
    df = pd.DataFrame(
        {
            "lang": rng.choice(["de", "en", "fr"], n, p=[0.6, 0.3, 0.1]),
            "score": rng.integers(0, 200, n).astype(np.int64),
        }
    )
    got = (
        grouped_percentiles(
            rd.from_pandas(df).repartition(11),
            ps=(0.5, 0.9, 0.99),
            group="lang",
            score_col="score",
        )
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        s = np.sort(df.loc[df["lang"] == row["lang"], "score"].to_numpy())
        assert row["n_docs"] == len(s)
        for p in (0.5, 0.9, 0.99):
            # discrete lower quantile: value at rank ceil(p*n), 1-based
            assert row[f"p{int(p * 100)}"] == s[math.ceil(p * len(s)) - 1]


def test_grouped_percentiles_validates_ps(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import grouped_percentiles

    df = pd.DataFrame({"lang": ["en"], "score": np.array([1], dtype=np.int64)})
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="must be in"):
        grouped_percentiles(ds, ps=(1.01,), group="lang", score_col="score")
    with pytest.raises(ValueError, match="collide"):
        grouped_percentiles(ds, ps=(0.9, 0.904), group="lang", score_col="score")


def test_grouped_ntile_snapshot_tolerates_nondeterministic_upstream(ray_session, tmp_path):
    """ADVICE r4: a plan whose output differs across executions must not
    desync the CDF pass from the tie pass. snapshot=True pins one
    execution; snapshot=False detects the desync with a clear error
    instead of a deep IndexError."""
    import ray.data as rd

    from ocrd_cis_ray.stages.sampling import grouped_ntile

    marker = tmp_path / "executed_once"

    def flaky(df: pd.DataFrame) -> pd.DataFrame:
        # first execution: all scores tied at 7 (every boundary lands
        # inside the tie); later executions: distinct scores, so the
        # tie pass would find nothing at score 7
        df = df.copy()
        if marker.exists():
            df["score"] = np.arange(len(df), dtype=np.int64)
        else:
            marker.write_text("x")
            df["score"] = np.full(len(df), 7, dtype=np.int64)
        return df

    df = pd.DataFrame(
        {
            "doc_id": np.arange(9, dtype=np.int64),
            "lang": ["en"] * 9,
            "score": np.zeros(9, dtype=np.int64),
        }
    )

    ds = rd.from_pandas(df).repartition(1).map_batches(flaky, batch_format="pandas")
    got = grouped_ntile(
        ds, n_tiles=3, group="lang", score_col="score", id_col="doc_id",
        snapshot=True,
    ).to_pandas().sort_values("doc_id")
    # snapshot pinned the tied view for cutoff derivation; the scoring
    # pass re-executed (now-distinct scores) but assignment stays VALID
    # (no IndexError): tiers within 1..k and monotone in the scored
    # pass's own (score, id) order
    assert got["tier"].between(1, 3).all()
    ordered = got.sort_values(["score", "doc_id"])
    assert (np.diff(ordered["tier"].to_numpy()) >= 0).all()

    marker.unlink()
    ds2 = rd.from_pandas(df).repartition(1).map_batches(flaky, batch_format="pandas")
    with pytest.raises(ValueError, match="nondeterministic"):
        grouped_ntile(
            ds2, n_tiles=3, group="lang", score_col="score", id_col="doc_id",
            snapshot=False,
        ).to_pandas()


def test_build_pipeline_defers_eager_stages(ray_session, tmp_path):
    """VERDICT r4 item 6: composing gate-style transforms with the
    quantile/percentile reduction stages runs NOTHING at build time —
    execution happens when the result is consumed."""
    import ray.data as rd

    from ocrd_cis_ray.registry import LazyPipeline, build_pipeline

    sentinel = tmp_path / "upstream_ran"

    def traced(df: pd.DataFrame) -> pd.DataFrame:
        sentinel.write_text("x")
        return df

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "lang": rng.choice(["de", "en"], 400),
            "score": rng.integers(0, 50, 400).astype(np.int64),
        }
    )
    base = rd.from_pandas(df).repartition(4).map_batches(traced, batch_format="pandas")

    tiers = build_pipeline(
        base, [{"stage": "quantile_tiers", "params": {"n_tiles": 3}}]
    )
    assert isinstance(tiers, LazyPipeline)
    assert not sentinel.exists(), "quantile_tiers executed at compose time"

    # a downstream lazy transform composes WITHOUT forcing
    projected = tiers.select_columns(["doc_id", "tier"])
    assert isinstance(projected, LazyPipeline)
    assert not sentinel.exists()

    out = projected.to_pandas().sort_values("doc_id")
    assert sentinel.exists()
    assert sorted(out["tier"].unique().tolist()) == [1, 2, 3]
    assert list(out.columns) == ["doc_id", "tier"]

    # percentiles: also deferred; consuming yields the per-group summary
    sentinel.unlink()
    pct = build_pipeline(
        base,
        [{"stage": "grouped_percentiles", "params": {"ps": (0.5, 0.9)}}],
    )
    assert not sentinel.exists()
    summary = pct.to_pandas()
    assert sentinel.exists()
    assert set(summary.columns) == {"lang", "n_docs", "p50", "p90"}
    assert len(summary) == 2


def test_lazy_pipeline_defers_through_groupby(ray_session, tmp_path):
    """An eager stage followed by a SHUFFLE-based consumer (groupby →
    map_groups/aggregate, the bucketed-stage shape) must still compose
    without executing — the review gap: groupby was missing from the
    deferral surface, so any bucketed stage after quantile_tiers forced
    the chain at build time."""
    import ray.data as rd

    from ocrd_cis_ray.registry import LazyPipeline, build_pipeline

    sentinel = tmp_path / "upstream_ran_gb"

    def traced(df: pd.DataFrame) -> pd.DataFrame:
        sentinel.write_text("x")
        return df

    rng = np.random.default_rng(6)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "lang": rng.choice(["de", "en"], 300),
            "score": rng.integers(0, 50, 300).astype(np.int64),
        }
    )
    base = rd.from_pandas(df).repartition(4).map_batches(traced, batch_format="pandas")
    tiers = build_pipeline(base, [{"stage": "quantile_tiers", "params": {"n_tiles": 3}}])

    def per_tier(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"tier": [g["tier"].iloc[0]], "n": [len(g)]})

    counted = tiers.groupby("tier").map_groups(per_tier, batch_format="pandas")
    assert isinstance(counted, LazyPipeline)
    assert not sentinel.exists(), "groupby after an eager stage forced the chain at compose time"
    out = counted.to_pandas().sort_values("tier").reset_index(drop=True)
    assert sentinel.exists()
    assert out["n"].sum() == 300 and len(out) == 3
