"""Shuffle helpers: bucketed groupby/aggregate parity, hash join, and
media-heavy skew rebalancing (north_rule: explicit groupby-shuffle
rebalancing of media-heavy skewed partitions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ocrd_cis_ray.shuffle import (
    bucketed_aggregate,
    bucketed_groupby,
    hash_join,
    key_buckets,
    partition_by_ranges,
    weighted_ranges,
)


def test_key_buckets_deterministic():
    a = key_buckets(np.array(["x", "y", "z"], dtype=object), 16)
    b = key_buckets(np.array(["x", "y", "z"], dtype=object), 16)
    assert (a == b).all()
    ints = key_buckets(np.arange(100), 8)
    assert ints.min() >= 0 and ints.max() < 8


def test_bucketed_aggregate_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"k": rng.integers(0, 500, 5000), "v": rng.integers(0, 100, 5000)}
    )
    got = (
        bucketed_aggregate(rd.from_pandas(df), "k", {"s": ("v", "sum"), "m": ("v", "max")})
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k").agg(s=("v", "sum"), m=("v", "max")).reset_index().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"s": "int64", "m": "int64"}), want.astype({"s": "int64", "m": "int64"}))


def test_hash_join_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(4)
    left = pd.DataFrame({"k": rng.integers(0, 50, 300), "lv": np.arange(300)})
    right = pd.DataFrame({"k": np.arange(50), "rv": np.arange(50) * 10})
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k")
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    want = left.merge(right, on="k").sort_values(["k", "lv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns].astype("int64"), want.astype("int64"))


def test_weighted_rebalance_beats_count_partitioning(ray_session):
    """Docs where 1-in-4 carries a huge media payload: byte-weighted
    range partitioning balances bytes much better than equal-count."""
    import ray.data as rd

    n, parts = 2000, 8
    ids = [f"d{i:06d}" for i in range(n)]
    weights = np.where(np.arange(n) % 4 == 0, 100_000, 100)  # media-heavy skew
    # make the skew positional too: heavy docs clustered at the front
    weights[: n // 4] = 100_000
    weights[n // 4 :] = 100
    df = pd.DataFrame({"doc_id": ids, "media_bytes": weights})
    ds = rd.from_pandas(df)

    bounds = weighted_ranges(ds, "doc_id", "media_bytes", parts)
    assert len(bounds) == parts - 1
    assigned = partition_by_ranges(ds, "doc_id", bounds).to_pandas()
    by_part = assigned.groupby("__part")["media_bytes"].sum()
    total = weights.sum()
    # weighted: every partition within 2x of ideal share
    assert by_part.max() <= 2.0 * total / parts
    # naive equal-count partitioning puts all heavy docs in the first
    # quarter of partitions: worst partition carries ~4x the ideal share
    naive = df.assign(p=np.arange(n) * parts // n).groupby("p")["media_bytes"].sum()
    assert naive.max() > 3.0 * total / parts


def test_bucketed_groupby_group_integrity(ray_session):
    """Every key's rows meet exactly one fn invocation (no split groups)."""
    import ray.data as rd

    df = pd.DataFrame({"k": np.repeat(np.arange(100), 7), "v": np.arange(700)})

    def whole(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [g["k"].iloc[0]], "n": [len(g)]})

    out = bucketed_groupby(rd.from_pandas(df), "k", whole).to_pandas()
    assert len(out) == 100
    assert (out["n"] == 7).all()


def test_bucketed_aggregate_combiner(ray_session):
    """combine=True pre-aggregates per batch (map-side combiner): same
    results as the plain path for sum/min/max/size specs."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocrd_cis_ray.shuffle import bucketed_aggregate

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 5000),
            "v": rng.integers(-100, 100, 5000),
        }
    )
    spec = {"total": ("v", "sum"), "lo": ("v", "min"), "hi": ("v", "max"), "n": ("v", "size")}
    plain = (
        bucketed_aggregate(rd.from_pandas(df).repartition(8), "k", spec, num_buckets=8)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    combined = (
        bucketed_aggregate(rd.from_pandas(df).repartition(8), "k", spec, num_buckets=8, combine=True)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, combined, check_like=True)
    ref = df.groupby("k").agg(total=("v", "sum"), lo=("v", "min"), hi=("v", "max"), n=("v", "size")).reset_index()
    pd.testing.assert_frame_equal(
        plain.astype({"n": "int64"}), ref.astype({"n": "int64"}), check_like=True
    )


class TestSaltedGroupby:
    def test_matches_brute_on_skewed_keys(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from ocrd_cis_ray.shuffle import salted_groupby

        rng = np.random.default_rng(11)
        # one viral key with 20k rows + 100 cold keys with ~10 rows
        keys = ["hot"] * 20_000 + [f"k{i % 100}" for i in range(1_000)]
        vals = rng.integers(0, 1000, len(keys))
        df = pd.DataFrame({"url": keys, "v": vals})

        def partial_fn(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"url": [g["url"].iloc[0]], "n": [len(g)], "s": [int(g["v"].sum())]}
            )

        def merge_fn(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"url": [g["url"].iloc[0]], "n": [int(g["n"].sum())], "s": [int(g["s"].sum())]}
            )

        got = (
            salted_groupby(rd.from_pandas(df).repartition(8), "url", partial_fn, merge_fn)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        want = (
            df.groupby("url", as_index=False)
            .agg(n=("v", "size"), s=("v", "sum"))
            .astype({"n": "int64", "s": "int64"})
            .sort_values("url")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["url", "n", "s"]], want[["url", "n", "s"]])

    def test_hot_key_spreads_across_buckets(self):
        import pandas as pd

        from ocrd_cis_ray.shuffle import _add_salted_bucket

        df = pd.DataFrame({"url": ["hot"] * 5000, "v": range(5000)})
        out = _add_salted_bucket(df, "url", num_buckets=32, salts=16)
        # the single hot key must land on many buckets, not one
        assert out["__bucket"].nunique() >= 8
        # and each (key, salt) slice is bounded by ~1/salts of the rows
        per_salt = out.groupby("__salt").size()
        assert per_salt.max() <= len(df) // 16 + 16
