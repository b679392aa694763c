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
only skew their own bucket. int64 headroom: the damped product is
computed via the exact split ``_damp`` (no 85·s intermediate), so the
binding constraint is Σ contribs ≤ n·SCALE fitting int64 — n ≲ 9·10^6
per connected sink at SCALE=10^12; trillion-doc runs drop SCALE to
10^6 (still 6 significant digits of rank). A production deployment would co-partition ranks and edges once
and iterate partition-aligned instead of re-joining; the join form
keeps the semantics obvious and the exchanges bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100


def _damp(s: np.ndarray) -> np.ndarray:
    """Exact ``DAMP_NUM * s // DAMP_DEN`` without int64 overflow: the
    naive product overflows for s > 2^63/85 ≈ 1.08e17, well inside the
    representable rank range. Split s = 100·a + b: 85·s//100 =
    85·a + 85·b//100 exactly, and 85·a ≤ 0.85·s never overflows when
    the result fits int64."""
    return DAMP_NUM * (s // DAMP_DEN) + DAMP_NUM * (s % DAMP_DEN) // DAMP_DEN


def synthesize_edges_batch(batch: pa.Table, *, n_docs: int) -> pa.Table:
    """(doc_id) -> (src, dst, outdeg): doc d links to
    (d + 1 + 3j) % n for j = 0..d%4 (outdeg = 1 + d%4, all targets
    distinct and != d for n > 13). Vectorized."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) == 0:
        empty = pa.array(np.empty(0, np.int64))
        return pa.table({"src": empty, "dst": empty, "outdeg": empty})
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
    3-exchange iteration. Both paths produce bit-identical ranks.

    ``nodes`` is materialized up front: every path consumes it at least
    twice (the auto count + the iteration state, or one left join per
    iteration), and callers commonly derive it via a distinct-endpoint
    shuffle that must not re-run per consumption. ``edges`` stays lazy —
    it is re-executed once per iteration, which streams; callers with an
    expensive edge derivation can pass ``edges.materialize()``."""
    nodes = nodes.materialize()
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
        ranks = base + _damp(sums)

    import ray.data as rd

    return rd.from_arrow(pa.table({"node": pa.array(ids), "rank_q": pa.array(ranks)}))


_LO_BITS = 31
_LO_MASK = (1 << _LO_BITS) - 1


def _split64(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split non-negative int64s into (hi, lo) halves that each fit a
    float64 exactly (hi < 2^33 for v < 2^64, lo < 2^31 < 2^53).

    Why: ``hash_join`` unions both sides to a superset schema, so a
    joined int column transits a NULL-bearing Arrow→pandas conversion
    and arrives float64 — values above 2^53 would silently round and
    break the module's bit-exactness contract. The halves survive the
    float64 transit losslessly for the full int64 range."""
    return v >> _LO_BITS, v & _LO_MASK


def _join64(hi: pd.Series, lo: pd.Series) -> np.ndarray:
    h = hi.fillna(0).to_numpy(np.int64)
    l = lo.fillna(0).to_numpy(np.int64)
    return (h << _LO_BITS) | l


def _pagerank_join(edges, nodes, *, iters: int, scale: int):
    """Fully distributed iteration for graphs whose rank vector cannot
    be broadcast: per iteration one partitioned rank⋈edge hash join,
    one map-side-combined contribution aggregate keyed on dst, and one
    left join back onto the node set. int64 values cross each join as
    exact (hi, lo) halves — see ``_split64``."""
    from ..shuffle import bucketed_aggregate, hash_join

    base = (DAMP_DEN - DAMP_NUM) * scale // DAMP_DEN

    def init_ranks(df: pd.DataFrame) -> pd.DataFrame:
        hi, lo = _split64(np.full(len(df), np.int64(scale)))
        return pd.DataFrame({"src": df["node"], "rank_hi": hi, "rank_lo": lo})

    ranks = nodes.map_batches(init_ranks, batch_format="pandas")

    for _ in range(iters):
        # hints: after iteration 1 `ranks` is shuffle-rooted, and
        # schema() would re-run the previous iteration's exchanges
        joined = hash_join(
            edges, ranks, on="src",
            left_cols=["src", "dst", "outdeg"],
            right_cols=["src", "rank_hi", "rank_lo"],
        )

        def contribs(df: pd.DataFrame) -> pd.DataFrame:
            r = _join64(df["rank_hi"], df["rank_lo"])
            return pd.DataFrame(
                {
                    "dst": df["dst"].to_numpy(np.int64),
                    "c": r // df["outdeg"].to_numpy(np.int64),
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

        def split_sums(df: pd.DataFrame) -> pd.DataFrame:
            hi, lo = _split64(df["c"].to_numpy(np.int64))
            return pd.DataFrame({"src": df["dst"], "c_hi": hi, "c_lo": lo})

        def update(df: pd.DataFrame) -> pd.DataFrame:
            s = _join64(df["c_hi"], df["c_lo"])
            hi, lo = _split64(base + _damp(s))
            return pd.DataFrame(
                {
                    "src": df["src"].to_numpy(np.int64),
                    "rank_hi": hi,
                    "rank_lo": lo,
                }
            )

        ranks = hash_join(
            nodes.map_batches(renamed, batch_format="pandas"),
            sums.map_batches(split_sums, batch_format="pandas"),
            on="src",
            how="left",
            left_cols=["src"],
            right_cols=["src", "c_hi", "c_lo"],
        ).map_batches(update, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["src"].to_numpy(np.int64),
                "rank_q": _join64(df["rank_hi"], df["rank_lo"]),
            }
        )

    return ranks.map_batches(finish, batch_format="pandas")
