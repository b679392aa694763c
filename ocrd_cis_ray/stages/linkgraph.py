"""Link-graph construction + distributed PageRank (exact fixed-point).

Web-corpus curation uses link-graph centrality as a quality prior
(Common Crawl ranks hosts with harmonic centrality / PageRank; OPIC and
its descendants gate crawl frontiers the same way). This module
implements the iterative wide op Ray-Data-first:

- ``synthesize_edges``: a deterministic out-link set per document
  (structurally mirrored by the q87 oracle), built vectorized and
  batch-local.
- ``pagerank``: power iteration in EXACT integer fixed-point so the
  result is bit-reproducible regardless of block arrival order (float
  contributions would sum in nondeterministic order across blocks):

      R_0(v)     = SCALE                    (10^12 micro-units)
      S_t(v)     = Σ_{u→v} R_t(u) // outdeg(u)
      R_{t+1}(v) = (15·SCALE)//100 + (85 · S_t(v)) // 100

  Each iteration: ONE partitioned hash join (ranks ⋈ edges on src),
  ONE bucketed contribution aggregate keyed on dst (map-side combined),
  and ONE left join back onto the node set for dangling-in-link nodes —
  all bounded-partition exchanges from ``shuffle.py``; no driver-side
  graph state, no per-node Python.

Scale notes: ranks and edges both stream; hot pages (huge in-degree)
only skew their own bucket. int64 headroom: 85·Σ contribs ≤ 85·n·SCALE
— at SCALE=10^12 that bounds n ≲ 10^5 per connected sink, so
trillion-doc runs drop SCALE to 10^6 (still 6 significant digits of
rank). A production deployment would co-partition ranks and edges once
and iterate partition-aligned instead of re-joining; the join form
keeps the semantics obvious and the exchanges bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100


def synthesize_edges_batch(batch: pa.Table, *, n_docs: int) -> pa.Table:
    """(doc_id) -> (src, dst, outdeg): doc d links to
    (d + 1 + 3j) % n for j = 0..d%4 (outdeg = 1 + d%4, all targets
    distinct and != d for n > 13). Vectorized."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    deg = ids % 4 + 1
    src = np.repeat(ids, deg)
    starts = np.concatenate([[0], np.cumsum(deg[:-1])])
    j = np.arange(len(src), dtype=np.int64) - np.repeat(starts, deg)
    dst = (src + 1 + 3 * j) % n_docs
    return pa.table(
        {
            "src": pa.array(src),
            "dst": pa.array(dst),
            "outdeg": pa.array(np.repeat(deg, deg)),
        }
    )


def synthesize_edges(ds, n_docs: int):
    from functools import partial

    return ds.map_batches(
        partial(synthesize_edges_batch, n_docs=n_docs), batch_format="pyarrow"
    )


def pagerank(
    edges,
    nodes,
    *,
    iters: int = 2,
    scale: int = SCALE,
    strategy: str = "auto",
    small_limit: int = 2_000_000,
):
    """edges(src, dst, outdeg) × nodes(node) -> (node, rank_q) after
    ``iters`` exact fixed-point power iterations. All arithmetic is
    int64; see module docstring for the recurrence and headroom.

    Size-aware (the repo's dedup/join convention): when the node set
    fits comfortably in a worker heap (``n <= small_limit``, 8 B/node —
    16 MB at the default limit), ``broadcast`` iterates with a dense
    rank vector shipped once per iteration via ``ray.put`` and ONE
    streamed edge pass emitting pre-reduced integer partials — zero
    shuffle. Above the limit, ``join`` runs the fully distributed
    3-exchange iteration. Both paths produce bit-identical ranks."""
    if strategy == "auto":
        strategy = "broadcast" if nodes.count() <= small_limit else "join"
    if strategy == "broadcast":
        return _pagerank_broadcast(edges, nodes, iters=iters, scale=scale)
    return _pagerank_join(edges, nodes, iters=iters, scale=scale)


def _pagerank_broadcast(edges, nodes, *, iters: int, scale: int):
    """Broadcast-vector iteration: rank state lives in one dense int64
    array (node ids sorted, positions via searchsorted); each iteration
    is one streamed ``map_batches`` over the edges producing per-block
    (position, contribution) integer partials, reduced driver-side.
    Driver memory is O(n); exact integer arithmetic throughout."""
    import ray

    base = (DAMP_DEN - DAMP_NUM) * scale // DAMP_DEN

    def node_col(df: pd.DataFrame) -> pd.DataFrame:
        return df[["node"]]

    ids = np.sort(
        nodes.map_batches(node_col, batch_format="pandas")
        .to_pandas()["node"]
        .to_numpy(np.int64)
    )
    n = len(ids)
    ranks = np.full(n, np.int64(scale))

    for _ in range(iters):
        state_ref = ray.put((ids, ranks))

        def contribs(df: pd.DataFrame, state_ref=state_ref) -> pd.DataFrame:
            ids_, r_ = ray.get(state_ref)
            m = len(ids_)
            src = df["src"].to_numpy(np.int64)
            dst = df["dst"].to_numpy(np.int64)
            src_pos = np.searchsorted(ids_, src)
            dst_pos = np.searchsorted(ids_, dst)
            # drop edges referencing unknown nodes (join-path parity:
            # unknown src = inner-join miss, unknown dst = left-join drop)
            ok = (
                (src_pos < m) & (dst_pos < m)
                & (ids_[np.minimum(src_pos, m - 1)] == src)
                & (ids_[np.minimum(dst_pos, m - 1)] == dst)
            )
            c = r_[src_pos[ok]] // df["outdeg"].to_numpy(np.int64)[ok]
            # pre-reduce inside the block: int64-exact (np.add.at)
            part = np.zeros(m, np.int64)
            np.add.at(part, dst_pos[ok], c)
            nz = np.flatnonzero(part)
            return pd.DataFrame({"pos": nz, "c": part[nz]})

        parts = edges.map_batches(contribs, batch_format="pandas").to_pandas()
        sums = np.zeros(n, np.int64)
        if len(parts):
            np.add.at(
                sums, parts["pos"].to_numpy(np.int64), parts["c"].to_numpy(np.int64)
            )
        ranks = base + DAMP_NUM * sums // DAMP_DEN

    import ray.data as rd

    return rd.from_arrow(pa.table({"node": pa.array(ids), "rank_q": pa.array(ranks)}))


def _pagerank_join(edges, nodes, *, iters: int, scale: int):
    """Fully distributed iteration for graphs whose rank vector cannot
    be broadcast: per iteration one partitioned rank⋈edge hash join,
    one map-side-combined contribution aggregate keyed on dst, and one
    left join back onto the node set."""
    from ..shuffle import bucketed_aggregate, hash_join

    base = (DAMP_DEN - DAMP_NUM) * scale // DAMP_DEN

    def init_ranks(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": df["node"], "rank_q": np.int64(scale)})

    ranks = nodes.map_batches(init_ranks, batch_format="pandas")

    for _ in range(iters):
        joined = hash_join(edges, ranks, on="src")

        def contribs(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "dst": df["dst"].to_numpy(np.int64),
                    "c": df["rank_q"].to_numpy(np.int64)
                    // df["outdeg"].to_numpy(np.int64),
                }
            )

        sums = bucketed_aggregate(
            joined.map_batches(contribs, batch_format="pandas"),
            "dst",
            {"c": ("c", "sum")},
            combine=True,
        )

        def renamed(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns={"node": "src"})

        def update(df: pd.DataFrame) -> pd.DataFrame:
            s = df["c"].fillna(0).to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "src": df["src"].to_numpy(np.int64),
                    "rank_q": base + DAMP_NUM * s // DAMP_DEN,
                }
            )

        ranks = hash_join(
            nodes.map_batches(renamed, batch_format="pandas"),
            sums.map_batches(
                lambda df: df.rename(columns={"dst": "src"}),
                batch_format="pandas",
            ),
            on="src",
            how="left",
        ).map_batches(update, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"src": "node"})

    return ranks.map_batches(finish, batch_format="pandas")
