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
