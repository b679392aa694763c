"""Link-graph PageRank (stages/linkgraph.py).

Pins exact integer fixed-point parity against a brute-force numpy
recurrence (bit-equality — the point of the integer formulation),
layout invariance under repartitioning, and the no-in-link base case."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ocrd_cis_ray.stages.linkgraph import SCALE, synthesize_edges_batch


def _brute_pagerank(edges: pd.DataFrame, nodes: np.ndarray, iters: int):
    r = {int(v): SCALE for v in nodes}
    base = 15 * SCALE // 100
    for _ in range(iters):
        s = dict.fromkeys(r, 0)
        for src, dst, deg in edges.itertuples(index=False):
            s[int(dst)] += r[int(src)] // int(deg)
        r = {v: base + 85 * s[v] // 100 for v in r}
    return r


def test_synthesize_edges_shape():
    t = pa.table({"doc_id": pa.array(np.arange(20, dtype=np.int64))})
    e = synthesize_edges_batch(t, n_docs=20).to_pandas()
    # outdeg = 1 + d%4, targets distinct, never self
    for d, g in e.groupby("src"):
        assert len(g) == d % 4 + 1
        assert g["outdeg"].nunique() == 1 and g["outdeg"].iloc[0] == len(g)
        assert g["dst"].nunique() == len(g) and (g["dst"] != d).all()


def test_pagerank_matches_brute_force_bitwise(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.linkgraph import pagerank, synthesize_edges

    n = 60
    ids = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    edges_pd = synthesize_edges_batch(
        pa.table({"doc_id": pa.array(ids["doc_id"])}), n_docs=n
    ).to_pandas()
    want = _brute_pagerank(edges_pd, np.arange(n), iters=2)
    for parts, strategy in ((1, "broadcast"), (4, "broadcast"), (4, "join")):
        ds = rd.from_pandas(ids).repartition(parts)
        nodes = ds.map_batches(
            lambda t: pa.table({"node": t["doc_id"]}), batch_format="pyarrow"
        )
        out = (
            pagerank(synthesize_edges(ds, n), nodes, iters=2, strategy=strategy)
            .to_pandas()
            .sort_values("node")
        )
        got = dict(zip(out["node"].astype(int), out["rank_q"].astype(int)))
        assert got == want  # bit-exact: any layout, BOTH strategies


def test_no_inlink_node_gets_base_rank(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.linkgraph import pagerank

    # star: 1,2,3 -> 0; node 4 isolated (no in-links, no out-links row
    # needed for it beyond membership in the node set)
    edges = rd.from_pandas(
        pd.DataFrame({"src": [1, 2, 3], "dst": [0, 0, 0], "outdeg": [1, 1, 1]})
    )
    nodes = rd.from_pandas(pd.DataFrame({"node": np.arange(5, dtype=np.int64)}))
    out = pagerank(edges, nodes, iters=1).to_pandas().set_index("node")["rank_q"]
    base = 15 * SCALE // 100
    assert int(out.loc[4]) == base
    assert int(out.loc[0]) == base + 85 * (3 * SCALE) // 100
    assert int(out.loc[1]) == base


def test_synthesize_edges_empty_batch():
    t = pa.table({"doc_id": pa.array(np.array([], dtype=np.int64))})
    e = synthesize_edges_batch(t, n_docs=100)
    assert e.num_rows == 0
    assert e.column_names == ["src", "dst", "outdeg"]


def test_join_path_is_exact_above_2_to_53(ray_session):
    # hash_join columns transit a null-bearing Arrow->pandas conversion
    # (float64); rank values above 2^53 must still come through exactly
    # via the hi/lo split. scale=10^17 makes every rank > 2^53.
    import ray.data as rd

    from ocrd_cis_ray.stages.linkgraph import pagerank, synthesize_edges

    n, scale = 40, 10**17
    ids = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    edges_pd = synthesize_edges_batch(
        pa.table({"doc_id": pa.array(ids["doc_id"])}), n_docs=n
    ).to_pandas()

    r = {v: scale for v in range(n)}
    base = 15 * scale // 100
    for _ in range(2):
        s = dict.fromkeys(r, 0)
        for src, dst, deg in edges_pd.itertuples(index=False):
            s[int(dst)] += r[int(src)] // int(deg)
        r = {v: base + 85 * s[v] // 100 for v in r}
    assert min(r.values()) > 2**53  # the test is vacuous otherwise

    ds = rd.from_pandas(ids).repartition(4)
    nodes = ds.map_batches(
        lambda t: pa.table({"node": t["doc_id"]}), batch_format="pyarrow"
    )
    out = (
        pagerank(
            synthesize_edges(ds, n), nodes, iters=2, scale=scale, strategy="join"
        )
        .to_pandas()
        .sort_values("node")
    )
    got = dict(zip(out["node"].astype(int), out["rank_q"].astype(int)))
    assert got == r
