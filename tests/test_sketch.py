"""HyperLogLog approximate distinct: mergeable per-batch sketch pattern."""

from __future__ import annotations

import pytest

from ocrd_cis_ray.stages.sketch import approx_distinct


def test_hll_small_cardinality_exactish(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    exact = len(set(r["user_id"] for r in ds.take_all()))
    est = approx_distinct(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"]), "user_id"
    )
    assert abs(est - exact) / exact < 0.02  # linear-counting regime


def test_hll_string_column(ray_session, sf_dir):
    import ray.data as rd

    est = approx_distinct(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]), "text"
    )
    assert abs(est - 500) / 500 < 0.06


def test_hll_large_cardinality(ray_session):
    import ray.data as rd

    n = 200_000
    ds = rd.range(n)  # column "id": 0..n-1, many blocks → many partials merged
    est = approx_distinct(ds, "id")
    assert abs(est - n) / n < 0.05  # ~1.6% stderr at p=12


def test_bloom_no_false_negatives_and_low_fpr(ray_session):
    import pandas as pd
    import ray.data as rd

    from ocrd_cis_ray.stages.sketch import bloom_build, bloom_probe

    ref = pd.DataFrame({"text": [f"member-{i}" for i in range(2000)]})
    probe_df = pd.DataFrame(
        {"text": [f"member-{i}" for i in range(1000)]
         + [f"absent-{i}" for i in range(5000)]}
    )
    bits = bloom_build(rd.from_pandas(ref).repartition(4), "text", m=1 << 16, k=7)
    out = (
        bloom_probe(rd.from_pandas(probe_df), bits, "text", k=7)
        .to_pandas()
    )
    members = out[out["text"].str.startswith("member")]["maybe_member"]
    absents = out[out["text"].str.startswith("absent")]["maybe_member"]
    assert (members == 1).all()  # bloom guarantee: no false negatives
    # m=64Ki, n=2000, k=7 -> FPR ~ 2e-9; allow slack
    assert absents.mean() < 0.01


def test_bloom_build_layout_invariant(ray_session):
    import pandas as pd
    import ray.data as rd

    from ocrd_cis_ray.stages.sketch import bloom_build

    df = pd.DataFrame({"text": [f"k{i}" for i in range(500)]})
    a = bloom_build(rd.from_pandas(df).repartition(1), "text", m=1 << 14)
    b = bloom_build(rd.from_pandas(df).repartition(7), "text", m=1 << 14)
    assert (a == b).all()
