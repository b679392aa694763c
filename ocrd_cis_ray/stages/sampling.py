"""Corpus sampling / chunking / packing operators.

The reference's only sampling is the randomized per-iteration training
draw (`/root/reference/README.md:184`, ocropus_rtrain) already modeled
in `stages/lstm.py`; these are the corpus-level selection operators a
large-scale training-data pipeline needs on top, expressed
Ray-Data-first:

- `stratified_sample` / `sample_fraction`: deterministic-hash filters —
  pure `map_batches`, ZERO shuffle, reproducible across runs and
  engines (the hash is plain modular arithmetic, so the DuckDB oracle
  computes the identical selection).
- `sample_per_group`: exact smallest-k-hash-per-group via a two-level
  tree top-k — per-block partial top-k, then ONE tiny reduce over
  k x groups x blocks rows. No global sort, no groupby shuffle.
- `chunk_documents`: fixed-token-window splitting (doc -> chunk rows),
  one vectorized kernel per batch.
- `pack_sequences`: greedy block-local sequence packing for LLM
  training (concat-and-bound, never splitting a chunk across
  sequences). Packing is BLOCK-LOCAL by design: each block packs
  independently, so the stage stays shuffle-free and streams; the
  cost is at most one underfull trailing sequence per block, which at
  128 MB blocks is noise in the fill ratio (reported per batch).
- `grouped_ntile`: EXACT per-group quantile bucketing (the CCNet
  head/middle/tail split: bucket every document into one of k tiers
  by a score, per language) with ANSI ``NTILE(k) OVER (PARTITION BY
  group ORDER BY score, id)`` semantics — computed in three streaming
  passes and ZERO data shuffle: only (group, score, count) partials
  and boundary-tie ids ever leave the workers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Knuth's multiplicative hash over a 32-bit ring. Chosen over a "real"
# hash (siphash etc.) because the selection rule must be expressible
# EXACTLY in ANSI SQL for the oracle: (id * 2654435761) % 2^32 is one
# multiply and one modulo on both sides. Products stay < 2^63 for ids
# up to ~3.4e9; beyond that (full 100-TB id space) callers should
# pre-fold ids into 32 bits the same way on both sides.
KNUTH = 2654435761
_RING = 1 << 32


def knuth_hash32(ids: np.ndarray) -> np.ndarray:
    """(id * KNUTH) mod 2^32 as int64 — the shared engine/oracle hash."""
    return (ids.astype(np.int64) * KNUTH) % _RING


def sample_fraction(ds, rate: float, *, id_col: str = "doc_id"):
    """Keep a deterministic `rate` fraction of rows by id hash."""
    thr = int(rate * _RING)

    def keep(t: pa.Table) -> pa.Table:
        h = knuth_hash32(t[id_col].to_numpy())
        return t.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds,
    rates: dict[str, float],
    *,
    key: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
):
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 20% of English, 100% of low-resource languages).

    A row survives iff hash32(id) < rate[stratum] * 2^32. One stateless
    `map_batches` filter — no shuffle, no state, trivially resumable.
    The rates dict is tiny and ships inside the task closure.
    """
    keys = pa.array(list(rates.keys()), pa.string())
    thrs = np.array(
        [int(v * _RING) for v in rates.values()] + [int(default_rate * _RING)],
        dtype=np.int64,
    )

    def keep(t: pa.Table) -> pa.Table:
        h = knuth_hash32(t[id_col].to_numpy())
        idx = (
            pc.fill_null(pc.index_in(t[key], keys), len(thrs) - 1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return t.filter(pa.array(h < thrs[idx]))

    return ds.map_batches(keep, batch_format="pyarrow")


def _topk_per_group(df: pd.DataFrame, group: str, k: int) -> pd.DataFrame:
    df = df.sort_values(["__h", "__id"], kind="mergesort")
    return df.groupby(group, sort=False).head(k)


def sample_per_group(ds, k: int, *, group: str = "lang", id_col: str = "doc_id"):
    """EXACT k rows per group: the k smallest hash32(id) values (ties
    broken by id) in each group — a deterministic reservoir sample.

    Tree top-k: each block keeps its own per-group top-k (vectorized
    sort + groupby-head), then one reduce over the tiny partials
    (k x groups x blocks rows) repeats the same kernel. The reduce input
    is bounded by block COUNT, not data size, so the stage scales to
    any corpus; only the selected rows ever move.
    """
    import functools

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(__h=knuth_hash32(df[id_col].to_numpy()), __id=df[id_col])
        return _topk_per_group(df, group, k)

    part = ds.map_batches(partial, batch_format="pandas")
    final = part.repartition(1).map_batches(
        functools.partial(_final_topk, group=group, k=k), batch_format="pandas"
    )
    return final


def _final_topk(df: pd.DataFrame, *, group: str, k: int) -> pd.DataFrame:
    return _topk_per_group(df, group, k).drop(columns=["__h", "__id"])


def _ntile_boundary_ranks(n: int, k: int) -> np.ndarray:
    """1-based cumulative boundary ranks B_1..B_{k-1} of NTILE(k) over
    n rows: the first n % k tiles hold ceil(n/k) rows (ANSI window
    semantics). A row of rank r sits in tile 1 + #{t : B_t < r}."""
    base, extra = divmod(n, k)
    sizes = np.full(k, base, dtype=np.int64)
    sizes[:extra] += 1
    return np.cumsum(sizes)[:-1]


def grouped_score_counts(
    ds,
    *,
    group: str,
    score_col: str,
    pairs_ceiling: int = 5_000_000,
) -> pd.DataFrame:
    """ONE map-side-combined exchange reducing the corpus to a sorted
    (group, score, n) CDF table on the driver — the shared substrate of
    ``grouped_ntile`` and ``grouped_percentiles``. combine=True
    pre-reduces each batch to its distinct pairs so the exchange moves
    partials, not rows; 32 buckets keeps per-bucket frames bounded at
    the ceiling; the collect is LIMIT-bounded BEFORE it reaches the
    driver (raise, never OOM). Scores must be integers so cardinality
    is bounded by the score range, not the corpus."""
    from ocrd_cis_ray.shuffle import bucketed_aggregate

    counts = (
        bucketed_aggregate(
            ds.map_batches(
                lambda df: df[[group, score_col]], batch_format="pandas"
            ),
            [group, score_col],
            {"n": (score_col, "size")},
            combine=True,
            num_buckets=32,
        )
        .limit(pairs_ceiling + 1)
        .to_pandas()
    )
    if len(counts) > pairs_ceiling:
        raise ValueError(
            f"grouped_score_counts: over {pairs_ceiling} distinct "
            f"(group, score) pairs (pairs_ceiling); quantize the score"
        )
    return counts.sort_values([group, score_col], kind="mergesort")


def grouped_percentiles(
    ds,
    *,
    ps=(0.5, 0.9, 0.99),
    group: str = "lang",
    score_col: str = "score",
    pairs_ceiling: int = 5_000_000,
):
    """EXACT per-group percentiles without sorting the data — the
    corpus-profiling primitive (per-source length/quality distribution
    dashboards): percentile p = the score at rank ceil(p·n) in
    (PARTITION BY group ORDER BY score) — discrete/lower quantile
    semantics, reproducible in ANSI SQL as
    ``MIN(CASE WHEN rn >= ceil(p*n) THEN score END)``.

    One ``grouped_score_counts`` exchange; the answer falls out of the
    per-group CDF on the driver. Returns a pandas DataFrame (one row
    per group: n_docs + one int64 column per requested percentile)."""
    import math

    names = [f"p{int(round(p * 100))}" for p in ps]
    if any(not (0.0 < p <= 1.0) for p in ps):
        raise ValueError(f"grouped_percentiles: ps must be in (0, 1], got {ps}")
    if len(set(names)) != len(names):
        raise ValueError(
            f"grouped_percentiles: percentiles {ps} collide on column "
            f"names {names}; use values that differ by >= 0.01"
        )

    counts = grouped_score_counts(
        ds, group=group, score_col=score_col, pairs_ceiling=pairs_ceiling
    )
    rows = []
    for g, sub in counts.groupby(group, sort=True):
        scores = sub[score_col].to_numpy()
        cum = np.cumsum(sub["n"].to_numpy())
        n = int(cum[-1])
        rec = {group: g, "n_docs": np.int64(n)}
        for p, name in zip(ps, names):
            rank = math.ceil(p * n)
            i = int(np.searchsorted(cum, rank, side="left"))
            rec[name] = np.int64(scores[i])
        rows.append(rec)
    return pd.DataFrame(rows)


def grouped_ntile(
    ds,
    *,
    n_tiles: int,
    group: str = "lang",
    score_col: str = "score",
    id_col: str = "doc_id",
    out_col: str = "tier",
    pairs_ceiling: int = 5_000_000,
    ties_ceiling: int = 1_000_000,
    snapshot: bool = True,
):
    """Exact per-group quantile tiers — ``NTILE(n_tiles) OVER
    (PARTITION BY group ORDER BY score, id)`` — without sorting or
    shuffling the data.

    The CCNet recipe buckets every document into head/middle/tail by
    per-language LM perplexity; FineWeb-style curation uses the same
    shape for score-tier sampling. At corpus scale a window function
    over a global sort is an all-to-all exchange of every row; this
    computes the identical assignment from aggregates:

    1. ONE combined pass reduces the corpus to (group, score, count)
       partials — a map-side combiner per batch, one bucketed exchange
       of the tiny partials (`bucketed_aggregate(combine=True)`), and a
       bounded driver collect (raises past ``pairs_ceiling`` distinct
       pairs; scores must be integers, so cardinality is bounded by
       the score range, not the corpus).
    2. The driver locates each tile boundary inside the per-group score
       CDF. Boundaries that fall BETWEEN score values are done; a
       boundary inside a tied score needs the id order of just that
       (group, score) — one filtered pass collects those ids (bounded
       by boundary ties, raises past ``ties_ceiling``) and the sorted
       position yields an exact id cutoff.
    3. A stateless scoring pass assigns ``tier = 1 + #boundaries below
       the row`` from the broadcast cutoff table — vectorized per
       batch, zero shuffle, trivially resumable.

    With ``snapshot=True`` (default) the CDF pass and the boundary-tie
    pass read ONE materialized projection of just (group, score, id) —
    tuple-weight, so pinning it is scale-safe even when the documents
    are not — which executes the upstream plan exactly once for the
    cutoff derivation and makes the two passes consistent under a
    nondeterministic upstream (a sampled or wall-clock-dependent stage
    can otherwise make the tie collect disagree with the CDF). The
    scoring pass streams over the ORIGINAL lazy ``ds`` (full rows, one
    more upstream execution at consumption time). ``snapshot=False``
    skips the materialization for inputs that are bare column-pruned
    reads (re-reading parquet twice is cheaper than pinning).

    Scores must be int64; ids must be totally ordered (ints or
    strings).
    """
    k = int(n_tiles)
    if k < 1:
        raise ValueError("n_tiles must be >= 1")

    if snapshot:
        tuples = ds.map_batches(
            lambda df: df[[group, score_col, id_col]], batch_format="pandas"
        ).materialize()
    else:
        tuples = ds

    counts = grouped_score_counts(
        tuples, group=group, score_col=score_col, pairs_ceiling=pairs_ceiling
    )

    # Per-group boundary resolution against the score CDF. A boundary
    # record is (group, tile_index, score_cut, need_m): rows strictly
    # above the cut are in later tiles; need_m > 0 means the cut splits
    # the tied score and the first need_m ids (ascending) stay below.
    bounds: list[tuple] = []  # (group, score_cut, need_m) per boundary
    dirty: dict[tuple, list] = {}  # (group, score) -> [(bound_idx, m)]
    for g, sub in counts.groupby(group, sort=False):
        scores = sub[score_col].to_numpy()
        cum = np.cumsum(sub["n"].to_numpy())
        total = int(cum[-1])
        for b_rank in _ntile_boundary_ranks(total, k):
            i = int(np.searchsorted(cum, b_rank, side="left"))
            prev = int(cum[i - 1]) if i > 0 else 0
            m = int(b_rank) - prev
            idx = len(bounds)
            if cum[i] == b_rank:  # clean cut: whole score below
                bounds.append((g, scores[i], 0))
            else:
                bounds.append((g, scores[i], m))
                dirty.setdefault((g, int(scores[i])), []).append((idx, m))

    id_cuts: dict[int, object] = {}
    if dirty:
        dirty_df = pd.DataFrame(
            {group: [g for g, _ in dirty], score_col: [s for _, s in dirty]}
        ).assign(__d=True)

        def tie_ids(df: pd.DataFrame) -> pd.DataFrame:
            # vectorized membership: left merge preserves row order
            m = (
                df[[group, score_col]]
                .merge(dirty_df, on=[group, score_col], how="left")["__d"]
                .notna()
                .to_numpy()
            )
            return df.loc[m, [group, score_col, id_col]]

        ties = (
            tuples.map_batches(tie_ids, batch_format="pandas")
            .limit(ties_ceiling + 1)
            .to_pandas()
        )
        if len(ties) > ties_ceiling:
            raise ValueError(
                f"grouped_ntile: over {ties_ceiling} boundary-tied rows "
                f"(ties_ceiling)"
            )
        for (g, s), recs in dirty.items():
            ids = np.sort(
                ties.loc[
                    (ties[group] == g) & (ties[score_col] == s), id_col
                ].to_numpy()
            )
            for idx, m in recs:
                if not (1 <= m <= len(ids)):
                    # impossible with snapshot=True (both passes read the
                    # same pinned blocks); without it, a nondeterministic
                    # upstream re-execution can shift the CDF under us
                    raise ValueError(
                        f"grouped_ntile: boundary expects >= {m} rows tied at "
                        f"({g!r}, {s}) but the tie pass saw {len(ids)} — the "
                        "input plan is nondeterministic across executions; "
                        "use snapshot=True or materialize upstream"
                    )
                id_cuts[idx] = ids[m - 1]

    # Broadcastable cutoff table: one row per (group, boundary).
    bt = pd.DataFrame(
        {
            group: [b[0] for b in bounds],
            "__t": 0,
            "__score_cut": np.asarray([b[1] for b in bounds], dtype=np.int64),
            "__has_id": [i in id_cuts for i in range(len(bounds))],
            # object dtype: None + int64 would coerce to float64 and
            # round id cutoffs >= 2^53, corrupting the tie-break
            "__id_cut": pd.Series(
                [id_cuts.get(i) for i in range(len(bounds))], dtype=object
            ),
        }
    )
    bt["__t"] = bt.groupby(group, sort=False).cumcount()
    per_t = [
        {
            "score": sub.set_index(group)["__score_cut"],
            "has_id": sub.set_index(group)["__has_id"],
            "id": sub.set_index(group)["__id_cut"],
        }
        for _, sub in bt.groupby("__t", sort=True)
    ]

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        tier = np.ones(len(df), dtype=np.int64)
        s = df[score_col].to_numpy()
        ids = df[id_col].to_numpy()
        gvals = df[group]
        for cut in per_t:
            sc = gvals.map(cut["score"]).to_numpy()
            present = ~pd.isna(sc)
            above = np.zeros(len(df), dtype=bool)
            above[present] = s[present] > sc[present]
            tied = present & (s == sc)
            if tied.any():
                has = gvals.map(cut["has_id"]).to_numpy(dtype=object)
                icut = gvals.map(cut["id"]).to_numpy(dtype=object)
                tw = np.where(tied)[0]
                hw = np.array([bool(has[j]) for j in tw])
                if hw.any():
                    jj = tw[hw]
                    above[jj] = ids[jj] > np.array([icut[j] for j in jj], dtype=object)
            tier += above.astype(np.int64)
        out = df.copy()
        out[out_col] = tier
        return out

    return ds.map_batches(assign, batch_format="pandas")


def _token_counts(text_col) -> np.ndarray:
    """Tokens = single-space-separated words (corpus convention shared
    with dedup shingles and q20's token counter)."""
    n = pc.add(pc.count_substring(text_col, " "), 1)
    return n.to_numpy(zero_copy_only=False).astype(np.int64)


def chunk_documents(
    ds, *, chunk_tokens: int = 128, id_col: str = "doc_id", text_col: str = "text"
):
    """Split each document's token stream into fixed windows: one row
    per (doc, chunk) with the chunk's token count (the last chunk holds
    the remainder). Pure per-batch expansion — no shuffle."""
    L = int(chunk_tokens)

    def expand(t: pa.Table) -> pa.Table:
        n = _token_counts(t[text_col])
        n_chunks = -(-n // L)  # ceil; n >= 1 always (empty text -> 1 token "")
        idx = np.repeat(np.arange(len(n)), n_chunks)
        total = int(n_chunks.sum())
        chunk_no = np.arange(total) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        size = np.minimum(np.repeat(n, n_chunks) - chunk_no * L, L)
        return pa.table(
            {
                id_col: t[id_col].take(pa.array(idx)),
                "chunk_no": pa.array(chunk_no.astype(np.int64)),
                "n_tokens": pa.array(size.astype(np.int64)),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow")


def _greedy_boundaries(sizes: np.ndarray, cap: int) -> np.ndarray:
    """Start index of each packed sequence under greedy order-preserving
    packing (each piece <= cap). O(n_sequences) searchsorted steps on
    one prefix-sum — no per-piece Python loop."""
    cs = np.cumsum(sizes)
    starts = [0]
    base = 0
    while True:
        j = int(np.searchsorted(cs, base + cap, side="right"))
        if j >= len(sizes):
            break
        starts.append(j)
        base = cs[j - 1]
    return np.array(starts, dtype=np.int64)


def pack_sequences(
    ds, *, seq_len: int = 1024, id_col: str = "doc_id", text_col: str = "text"
):
    """Greedy block-local packing of documents into fixed-length
    training sequences. Documents longer than `seq_len` are first split
    into chunks (never crossing a sequence boundary), then chunks are
    packed in order until the next one would overflow.

    Output: one row per packed sequence — (seq_id, n_pieces, n_docs,
    n_tokens, fill). seq_id is `firstdoc:firstchunk`, deterministic
    given the block layout. Conservation invariants (sum of n_tokens ==
    sum of doc tokens; every fill <= 1) are tested, the layout itself
    is block-dependent by design (see module docstring).
    """
    L = int(seq_len)

    def pack(t: pa.Table) -> pa.Table:
        n = _token_counts(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n_chunks = -(-n // L)
        doc_idx = np.repeat(np.arange(len(n)), n_chunks)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table(
                {
                    "seq_id": pa.array([], pa.string()),
                    "n_pieces": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "fill": pa.array([], pa.float64()),
                }
            )
        chunk_no = np.arange(total) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        sizes = np.minimum(np.repeat(n, n_chunks) - chunk_no * L, L)
        starts = _greedy_boundaries(sizes, L)
        ends = np.append(starts[1:], total)
        cs0 = np.concatenate([[0], np.cumsum(sizes)])
        seq_tokens = cs0[ends] - cs0[starts]
        n_docs = np.array(
            [len(np.unique(doc_idx[s:e])) for s, e in zip(starts, ends)], np.int64
        )
        seq_ids = [
            f"{ids[doc_idx[s]]}:{chunk_no[s]}" for s in starts
        ]
        return pa.table(
            {
                "seq_id": pa.array(seq_ids, pa.string()),
                "n_pieces": pa.array(ends - starts),
                "n_docs": pa.array(n_docs),
                "n_tokens": pa.array(seq_tokens.astype(np.int64)),
                "fill": pa.array(seq_tokens / L),
            }
        )

    return ds.map_batches(pack, batch_format="pyarrow")


def mixture_sample(
    ds,
    *,
    weights=None,
    budget_fraction: float = 0.5,
    budget_tokens: int | None = None,
    default_weight: float = 0.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Mixture balancing to a token budget (the Pile/Dolma source
    reweighting step): give each source a share of ``budget_tokens``
    (default ``budget_fraction`` of the corpus) proportional to its
    weight, convert the share into a deterministic per-source keep
    RATE against the source's actual token mass (capped at 1 — an
    undersized source under-delivers rather than oversamples), and
    select documents with the shared engine/oracle hash filter.

    Two streaming passes: ONE map-side-combined (source, token-sum)
    aggregate (source cardinality is the mixture arity — tiny), then a
    stateless hash-threshold filter; no shuffle of document rows.
    ``weights``: {source: weight}, a callable source -> weight, or
    None for a uniform mixture; dict sources absent from the data are
    ignored, data sources absent from the dict get ``default_weight``
    (0 = dropped, the ``stratified_sample`` default_rate convention).
    Rates are computed in IEEE double with a fixed operation order —
    ``((budget * w) / sum_w) / tokens`` with the weight sum taken in
    SOURCE-SORTED order (the observed counts frame is canonicalized
    before any float leaves it, so run-to-run aggregate ordering can
    never perturb a rate) — so an ANSI-SQL oracle reproduces the
    selection bit-exactly PROVIDED the oracle also sums weights in
    source order, weights are exactly representable doubles (integers
    or dyadic rationals), and per-source token mass stays below 2^53
    (exact int64 -> double conversion). Outside that envelope a 1-ulp
    rate difference can flip a document whose hash equals
    floor(rate * 2^32) — acceptable for sampling, fatal for a hash
    oracle.
    """
    import math

    from ocrd_cis_ray.shuffle import bucketed_aggregate

    def tok_partial(t: pa.Table) -> pd.DataFrame:
        n = _token_counts(t[text_col])
        return pd.DataFrame(
            {source_col: t[source_col].to_pandas(), "tok": n}
        ).groupby(source_col, sort=False, as_index=False)["tok"].sum()

    # the partial stream is blocks x mixture-arity rows — tiny; 8
    # buckets is plenty at any corpus scale. The collect is bounded
    # BEFORE it reaches the driver (limit, then raise): a mixture over
    # a high-cardinality column is a misuse, not an OOM.
    arity_ceiling = 100_000
    counts = (
        bucketed_aggregate(
            ds.map_batches(tok_partial, batch_format="pyarrow"),
            source_col,
            {"tok": ("tok", "sum")},
            combine=True,
            num_buckets=8,
        )
        .limit(arity_ceiling + 1)
        .to_pandas()
    )
    if len(counts) > arity_ceiling:
        raise ValueError(
            f"mixture_sample: over {arity_ceiling} distinct sources — "
            f"'{source_col}' is not a mixture key"
        )
    # canonical summation order: aggregate output order varies run to
    # run; sort by source BEFORE any float is derived so sum_w (and the
    # rates) are bit-identical across runs and vs the oracle
    counts = counts.sort_values(source_col, kind="mergesort").reset_index(drop=True)

    total = float(counts["tok"].sum())
    budget = (
        float(budget_tokens)
        if budget_tokens is not None
        else math.floor(budget_fraction * total)
    )
    def _weight(s) -> float:
        if weights is None:
            return 1.0
        if callable(weights):
            return float(weights(s))
        return float(weights.get(s, default_weight))

    wt = {s: _weight(s) for s in counts[source_col]}
    sum_w = sum(wt.values())
    if sum_w <= 0:
        raise ValueError(
            "mixture_sample: total weight over the observed sources is "
            f"{sum_w}; every document would be dropped — pass weights "
            "covering the data's sources (or weights=None for uniform)"
        )
    thr: dict[str, int] = {}
    for s, tok in zip(counts[source_col], counts["tok"]):
        rate = min(1.0, ((budget * wt[s]) / sum_w) / float(tok))
        thr[s] = math.floor(rate * 4294967296.0)

    keys = pa.array(list(thr.keys()), pa.string())
    thrs = np.array(list(thr.values()) + [0], dtype=np.int64)

    def keep(t: pa.Table) -> pa.Table:
        h = knuth_hash32(t[id_col].to_numpy())
        idx = (
            pc.fill_null(pc.index_in(t[source_col], keys), len(thrs) - 1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # filter FIRST, tokenize survivors: at budget_fraction=0.5 the
        # string scan halves
        t = t.filter(pa.array(h < thrs[idx]))
        n = pc.cast(pc.add(pc.count_substring(t[text_col], " "), 1), pa.int64())
        return pa.table(
            {id_col: t[id_col], source_col: t[source_col], "n_tokens": n}
        )

    return ds.map_batches(keep, batch_format="pyarrow")
