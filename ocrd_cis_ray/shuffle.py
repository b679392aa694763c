"""Shuffle helpers: bucketed groupby and deterministic key hashing.

Ray Data's ``groupby(key).map_groups(fn)`` feeds every group to ``fn``
individually; with millions of tiny groups (one per document, shingle,
or band bucket) the per-group dispatch overhead dominates. The engine's
pattern: hash the key into a bounded number of BUCKETS, shuffle once on
the bucket id, and run a vectorized pandas groupby *inside* each bucket
— same results, per-group cost paid at C speed, and the number of
shuffle partitions is independent of key cardinality (skew in one key
only affects its bucket).

Bucket count defaults to 4 × CPUs: large enough for balance, small
enough that per-bucket overhead is negligible. Hashing is
``pandas.util.hash_array`` (siphash, fixed key) — deterministic across
processes and nodes, unlike Python's salted ``hash``.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd


def n_default_buckets() -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, 4 * cpus)


def key_buckets(values, num_buckets: int) -> np.ndarray:
    """Deterministic bucket ids for a key column (any dtype).

    Integer-valued keys hash identically whether they arrive as int64
    or as an object column (e.g. after a null-filling union) — the
    same key MUST land in the same bucket regardless of block dtype.
    """
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        h = arr.astype(np.uint64)
    else:
        try:  # object column of ints → canonical integer hashing
            h = arr.astype(np.int64).astype(np.uint64)
        except (ValueError, TypeError):
            h = pd.util.hash_array(arr.astype(object))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _add_bucket(df: pd.DataFrame, key, num_buckets: int) -> pd.DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    if len(keys) == 1:
        h = key_buckets(df[keys[0]].to_numpy(), num_buckets)
    else:
        acc = pd.util.hash_array(df[keys[0]].to_numpy().astype(object))
        for k in keys[1:]:
            acc = acc * np.uint64(1099511628211) ^ pd.util.hash_array(df[k].to_numpy().astype(object))
        h = (acc % np.uint64(num_buckets)).astype(np.int32)
    return df.assign(__bucket=h)


def _apply_bucket(bucket_df: pd.DataFrame, key, fn) -> pd.DataFrame:
    bucket_df = bucket_df.drop(columns="__bucket")
    if bucket_df.empty:
        return fn(bucket_df)
    outs = [fn(g) for _, g in bucket_df.groupby(key, sort=False)]
    outs = [o for o in outs if o is not None and len(o)]
    if not outs:
        # preserve schema: call fn on the empty frame
        return fn(bucket_df.iloc[0:0])
    return pd.concat(outs, ignore_index=True)


def bucketed_groupby(ds, key, fn, *, num_buckets: int | None = None, whole_bucket: bool = False):
    """groupby(key).map_groups(fn) with bounded shuffle partitions.

    ``fn`` receives one pandas group (all rows of one key) — or, with
    ``whole_bucket=True``, the entire bucket frame at once (for fns that
    do their own vectorized groupby; fastest).
    """
    nb = num_buckets or n_default_buckets()
    bucketed = ds.map_batches(
        partial(_add_bucket, key=key, num_buckets=nb), batch_format="pandas"
    )
    if whole_bucket:
        apply = partial(_apply_whole, fn=fn)
    else:
        apply = partial(_apply_bucket, key=key, fn=fn)
    return bucketed.groupby("__bucket").map_groups(apply, batch_format="pandas")


def _apply_whole(bucket_df: pd.DataFrame, fn) -> pd.DataFrame:
    return fn(bucket_df.drop(columns="__bucket"))


def hash_join(left, right, *, on: str, how: str = "inner", num_buckets: int | None = None, suffixes=("_l", "_r"), left_cols=None, right_cols=None):
    """Partitioned hash join of two LARGE datasets (both sides shuffle).

    The portable pattern from the Ray guide: tag each side, align both
    to the superset schema (missing columns null), union, ONE bucketed
    shuffle on the key, then a vectorized pandas merge inside each
    bucket. Hot keys only affect their own bucket. For a SMALL side,
    don't use this — broadcast it (ray.put + lookup in map_batches).

    ``left_cols``/``right_cols``: pass the column names when a side is
    SHUFFLE-ROOTED (its plan contains a groupby/sort): ``.schema()`` on
    such a dataset executes the entire upstream exchange just to learn
    the names, and the join pass then re-executes it — the side runs
    TWICE. With the hints the join runs each side exactly once
    (measured: q88's flag join dropped ~40% wall).
    """
    import ray

    lcols = [str(c) for c in (left_cols or left.schema().names)]
    rcols = [str(c) for c in (right_cols or right.schema().names)]
    shared = (set(lcols) & set(rcols)) - {on}

    def tag(side: str, own: list[str], other: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = side
            for c in other:
                if c not in df.columns:
                    df[c] = None
            return df

        return fn

    all_cols = [on] + sorted((set(lcols) | set(rcols)) - {on})
    lt = left.map_batches(tag("l", lcols, rcols), batch_format="pandas").select_columns(all_cols + ["__side"])
    rt = right.map_batches(tag("r", rcols, lcols), batch_format="pandas").select_columns(all_cols + ["__side"])
    both = lt.union(rt)

    def join_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        l = bucket[bucket["__side"] == "l"][[on] + [c for c in lcols if c != on]].infer_objects()
        r = bucket[bucket["__side"] == "r"][[on] + [c for c in rcols if c != on]].infer_objects()
        if l[on].dtype != r[on].dtype and l[on].dtype.kind in "iu" and r[on].dtype.kind in "iu":
            r = r.astype({on: l[on].dtype})
        return l.merge(r, on=on, how=how, suffixes=suffixes)

    return bucketed_groupby(both, on, join_bucket, num_buckets=num_buckets, whole_bucket=True)


def weighted_ranges(ds, key: str, weight_col: str, n_partitions: int, *, sample_limit: int = 200_000):
    """Range boundaries over ``key`` such that each range carries ~equal
    total ``weight_col`` — the north_rule's media-heavy skew rebalance.

    Boundaries are estimated from a bounded sample of (key, weight)
    pairs (weighted quantiles), so driver memory is O(sample), not
    O(rows). Block order is randomized before limiting so the sample
    spans the keyspace even when the input is key-sorted (a plain
    limit() of a sorted corpus would sample only the first key range).
    Returns a sorted list of n-1 split keys.
    """
    import numpy as np

    pairs = (
        ds.select_columns([key, weight_col])
        .randomize_block_order(seed=42)
        .limit(sample_limit)
        .to_pandas()
    )
    pairs = pairs.sort_values(key)
    w = pairs[weight_col].to_numpy(dtype=np.float64)
    cum = np.cumsum(w)
    total = cum[-1] if len(cum) else 0.0
    if total <= 0 or n_partitions <= 1:
        return []
    targets = [total * i / n_partitions for i in range(1, n_partitions)]
    idx = np.searchsorted(cum, targets)
    keys = pairs[key].to_numpy()
    return sorted(set(keys[np.clip(idx, 0, len(keys) - 1)]))


def partition_by_ranges(ds, key: str, bounds: list):
    """Add a ``__part`` column assigning each row to its key range
    (searchsorted — vectorized), then group ranges for downstream
    per-partition work. Rows stream; only the groupby moves them."""
    import numpy as np

    bounds_arr = list(bounds)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = np.searchsorted(bounds_arr, df[key].to_numpy(), side="right").astype(np.int32)
        return df

    return ds.map_batches(assign, batch_format="pandas")


def _agg_bucket(bucket_df: pd.DataFrame, key, spec: dict) -> pd.DataFrame:
    bucket_df = bucket_df.drop(columns="__bucket")
    kwargs = {out: (col, how) for out, (col, how) in spec.items()}
    return bucket_df.groupby(key, sort=False).agg(**kwargs).reset_index()


def _combine_batch(df: pd.DataFrame, key, spec: dict) -> pd.DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    kwargs = {out: (col, how) for out, (col, how) in spec.items()}
    return df.groupby(keys, sort=False).agg(**kwargs).reset_index()


def bucketed_aggregate(ds, key, spec: dict, *, num_buckets: int | None = None, combine: bool = False):
    """High-cardinality grouped aggregation.

    Ray's native ``groupby().aggregate()`` is sort-based and degrades
    badly when the number of groups approaches the number of rows
    (measured: 1.1M groups over 1.26M rows = 280 s at 32 cpus). This
    runs ONE bucketed hash shuffle and a vectorized pandas groupby-agg
    per bucket instead (same 1.1M groups: ~2 s).

    ``spec`` maps output column -> (input column, how), how being any
    pandas agg name ('sum', 'max', 'min', 'size', 'first', ...).

    ``combine=True`` adds a MAP-SIDE COMBINER: each input batch
    pre-aggregates before the shuffle, so the exchange moves at most
    (#batches × distinct keys per batch) rows instead of every row —
    the decisive lever when key cardinality ≪ row count. Valid for
    algebraic aggs only: sum/min/max/first are closed under
    re-aggregation; 'size' partials re-aggregate with 'sum'
    (rewritten automatically). Do NOT combine non-algebraic aggs
    (mean, median, nunique).

    NOTE: assumes one pass (rows for a key meet in exactly one bucket),
    which the bucket shuffle guarantees. For algebraic re-aggregation of
    pre-partials, apply the matching combine op in ``how``.
    """
    nb = num_buckets or n_default_buckets()
    if combine:
        ds = ds.map_batches(
            partial(_combine_batch, key=key, spec=spec), batch_format="pandas"
        )
        # partials land in columns named by OUTPUT; re-aggregate them
        spec = {
            out: (out, "sum" if how == "size" else how) for out, (_, how) in spec.items()
        }
    bucketed = ds.map_batches(
        partial(_add_bucket, key=key, num_buckets=nb), batch_format="pandas"
    )
    return bucketed.groupby("__bucket").map_groups(
        partial(_agg_bucket, key=key, spec=spec), batch_format="pandas"
    )


def _add_salted_bucket(df: pd.DataFrame, key, num_buckets: int, salts: int) -> pd.DataFrame:
    import pandas.util as pdu

    kh = pdu.hash_array(df[key].to_numpy())
    salt = np.arange(len(df), dtype=np.uint64) % np.uint64(salts)
    df = df.copy()
    df["__salt"] = salt
    df["__bucket"] = ((kh ^ (salt * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(num_buckets)).astype(np.int64)
    return df


def salted_groupby(ds, key, partial_fn, merge_fn, *, salts: int = 16, num_buckets: int | None = None):
    """Two-phase groupby for HOT keys (the design brief's "salt hot
    keys"): when one key holds a disproportionate share of the rows —
    one viral URL's anchors, one boilerplate line's occurrences, one
    mega-document's spans — a plain key-partitioned groupby lands that
    key's entire row mass on a single task and the stage runs at the
    straggler's speed. Salting splits every key into ``salts``
    sub-groups spread across buckets:

      phase 1: shuffle on hash(key, salt) — each (key, salt) slice is
               ≤ 1/salts of the hot key's rows; ``partial_fn(group)``
               reduces one slice to one (or few) partial row(s).
      phase 2: the partials (≤ salts rows per key, tuple-weight)
               re-group by the bare key; ``merge_fn(group)`` combines
               them into the final per-key row(s).

    Correct whenever the per-key computation decomposes into a
    partial/merge pair (count/sum/min/max/top-k/HLL/any monoid).
    Non-decomposable fns (a median over raw values) cannot be salted —
    use ``bucketed_groupby`` and accept the hot-key straggler, or
    restate the fn over a mergeable sketch.

    Phase-2 input is `salts × n_keys` tuple-weight rows, so its
    exchange is negligible; the heavy exchange (phase 1) is balanced
    by construction. Deterministic: the salt is a row-position-free
    function only within a batch — partial_fn/merge_fn must therefore
    be order-insensitive over their group (true of any monoid reduce).
    """
    nb = num_buckets or n_default_buckets()

    def apply_partial(bucket_df: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket_df.drop(columns="__bucket")
            .groupby([key, "__salt"], sort=False, group_keys=False)[
                [c for c in bucket_df.columns if c not in ("__bucket",)]
            ]
            .apply(lambda g: partial_fn(g.drop(columns=["__salt"])))
            .reset_index(drop=True)
        )
        return out

    salted = ds.map_batches(
        partial(_add_salted_bucket, key=key, num_buckets=nb, salts=salts),
        batch_format="pandas",
    )
    partials = salted.groupby("__bucket").map_groups(apply_partial, batch_format="pandas")
    return bucketed_groupby(partials, key, merge_fn, num_buckets=nb)
