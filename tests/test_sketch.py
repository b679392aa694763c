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


class TestKLLQuantileSketch:
    def test_rank_error_bound(self):
        import numpy as np

        from ocrd_cis_ray.stages.sketch import KLLSketch

        rng = np.random.default_rng(1)
        data = rng.lognormal(0, 2, 200_000)
        sk = KLLSketch(200)
        for chunk in np.array_split(data, 37):
            sk.update_many(chunk)
        exact = np.sort(data)
        for q in (0.01, 0.25, 0.5, 0.9, 0.99):
            est = sk.quantile(q)
            rank = np.searchsorted(exact, est) / len(exact)
            assert abs(rank - q) < 0.02, (q, est, rank)
        # fixed memory: stored items ~O(k log(n/k)), far below n
        assert sum(len(c) for c in sk.compactors) < 3_000

    def test_merge_equivalent_accuracy(self):
        """Merging per-partition sketches stays inside the error bound
        regardless of how the data was split."""
        import numpy as np

        from ocrd_cis_ray.stages.sketch import KLLSketch

        rng = np.random.default_rng(2)
        data = rng.standard_normal(100_000) * 100
        exact = np.sort(data)
        for n_parts in (1, 7, 64):
            parts = np.array_split(data, n_parts)
            sk = KLLSketch(200)
            for p in parts:
                other = KLLSketch(200)
                other.update_many(p)
                sk.merge(other)
            assert sk.n == len(data)
            for q in (0.1, 0.5, 0.9):
                rank = np.searchsorted(exact, sk.quantile(q)) / len(exact)
                assert abs(rank - q) < 0.02, (n_parts, q)

    def test_small_and_empty(self):
        import math

        import numpy as np

        from ocrd_cis_ray.stages.sketch import KLLSketch

        sk = KLLSketch(50)
        assert math.isnan(sk.quantile(0.5))
        sk.update_many(np.array([3.0]))
        assert sk.quantile(0.0) == 3.0 and sk.quantile(1.0) == 3.0
        # exact below capacity
        sk2 = KLLSketch(200)
        sk2.update_many(np.arange(100, dtype=np.float64))
        assert sk2.quantile(0.5) == 49.0  # rank ceil(0.5*100)=50 -> value 49

    def test_grouped_sketch_close_to_exact(self, ray_session, sf_dir):
        """The distributed grouped sketch lands within the rank bound of
        the exact grouped_percentiles on the same input."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from ocrd_cis_ray.stages.sampling import grouped_percentiles
        from ocrd_cis_ray.stages.sketch import grouped_quantile_sketch

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"]).map_batches(
            lambda t: pa.table(
                {
                    "lang": t["lang"],
                    "n_tokens": pc.cast(pc.add(pc.count_substring(t["text"], " "), 1), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).repartition(6)
        approx = grouped_quantile_sketch(ds, group="lang", score_col="n_tokens", ps=(0.5, 0.9), k=200)
        exact = grouped_percentiles(ds, group="lang", score_col="n_tokens", ps=(0.5, 0.9))
        a = approx.set_index("lang")
        e = exact.set_index("lang")
        assert set(a.index) == set(e.index)
        for lang in e.index:
            for col in ("p50", "p90"):
                # token lengths are small-range ints: sketch must land
                # within a tight value neighborhood of exact
                assert abs(float(a.loc[lang, col]) - float(e.loc[lang, col])) <= max(
                    2.0, 0.05 * float(e.loc[lang, col])
                ), (lang, col)

    def test_registry_stage(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from ocrd_cis_ray.registry import build_pipeline

        rng = np.random.default_rng(3)
        df = pd.DataFrame({"lang": rng.choice(["a", "b"], 5000), "score": rng.integers(0, 1000, 5000)})
        out = build_pipeline(
            rd.from_pandas(df).repartition(4),
            [{"stage": "quantile_sketch", "params": {"ps": (0.5,), "k": 100}}],
        ).to_pandas()
        assert set(out["lang"]) == {"a", "b"} and "p50" in out.columns


class TestCountMinHeavyHitters:
    def test_one_sided_error_bound(self):
        import numpy as np
        import pandas as pd

        from ocrd_cis_ray.stages.sketch import CountMinSketch

        rng = np.random.default_rng(4)
        keys = rng.zipf(1.5, 100_000).astype(str)
        exact = pd.Series(keys).value_counts()
        cms = CountMinSketch(4096, 4)
        for chunk in np.array_split(keys, 23):
            vc = pd.Series(chunk).value_counts()
            cms.update_hashed(pd.util.hash_array(vc.index.to_numpy(object)), vc.to_numpy(np.int64))
        est = cms.estimate_hashed(pd.util.hash_array(exact.index.to_numpy(object)))
        err = est - exact.to_numpy()
        assert (err >= 0).all()  # CM never undercounts
        assert err.max() <= int(np.e / 4096 * cms.n)  # eps*N bound

    def test_merge_dimension_check(self):
        import pytest as _pytest

        from ocrd_cis_ray.stages.sketch import CountMinSketch

        with _pytest.raises(ValueError, match="identical dimensions"):
            CountMinSketch(1024, 4).merge(CountMinSketch(2048, 4))

    def test_heavy_hitters_recovers_exact_top_k(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from ocrd_cis_ray.stages.sketch import heavy_hitters

        rng = np.random.default_rng(5)
        keys = [f"k{z}" for z in rng.zipf(1.4, 50_000)]
        exact = pd.Series(keys).value_counts()
        ds = rd.from_pandas(pd.DataFrame({"token": keys})).repartition(8)
        got = heavy_hitters(ds, "token", k=10)
        want = set(exact.head(10).index)
        assert set(got["value"]) == want
        # estimates are upper bounds on the exact counts
        for _, row in got.iterrows():
            assert row["est_count"] >= exact[row["value"]]
        # ranking respects (est desc, value asc)
        assert list(got["est_count"]) == sorted(got["est_count"], reverse=True)
