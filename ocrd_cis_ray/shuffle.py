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
    """Deterministic bucket ids for a key column (any dtype)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        h = arr.astype(np.uint64)
    else:
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


def _agg_bucket(bucket_df: pd.DataFrame, key, spec: dict) -> pd.DataFrame:
    bucket_df = bucket_df.drop(columns="__bucket")
    kwargs = {out: (col, how) for out, (col, how) in spec.items()}
    return bucket_df.groupby(key, sort=False).agg(**kwargs).reset_index()


def bucketed_aggregate(ds, key, spec: dict, *, num_buckets: int | None = None):
    """High-cardinality grouped aggregation.

    Ray's native ``groupby().aggregate()`` is sort-based and degrades
    badly when the number of groups approaches the number of rows
    (measured: 1.1M groups over 1.26M rows = 280 s at 32 cpus). This
    runs ONE bucketed hash shuffle and a vectorized pandas groupby-agg
    per bucket instead (same 1.1M groups: ~2 s).

    ``spec`` maps output column -> (input column, how), how being any
    pandas agg name ('sum', 'max', 'min', 'size', 'first', ...).

    NOTE: assumes one pass (rows for a key meet in exactly one bucket),
    which the bucket shuffle guarantees. For algebraic re-aggregation of
    pre-partials, apply the matching combine op in ``how``.
    """
    nb = num_buckets or n_default_buckets()
    bucketed = ds.map_batches(
        partial(_add_bucket, key=key, num_buckets=nb), batch_format="pandas"
    )
    return bucketed.groupby("__bucket").map_groups(
        partial(_agg_bucket, key=key, spec=spec), batch_format="pandas"
    )
