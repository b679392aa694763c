"""Incremental crawl-snapshot diff (recrawl delta processing).

A web-scale corpus is not rebuilt from scratch every crawl: each new
snapshot is diffed against the previous one so downstream stages only
reprocess what changed (Common Crawl's monthly snapshots, incremental
index updates, Dolma-style cross-snapshot dedup all start here). The
primitive is a keyed two-dataset diff by content digest:

    status(key) = 'new'        key only in the new snapshot
                  'gone'       key only in the old snapshot
                  'changed'    in both, digests differ
                  'unchanged'  in both, digests equal

Scale design: ONE bucketed exchange. Both snapshots are tagged with
their side batch-locally and unioned; the bucket shuffle co-locates
all rows of a key, and a vectorized pandas merge per bucket computes
the status — the same one-exchange pattern as ``shuffle.hash_join``.
Only (key, digest, side) tuples move, never page payloads; compute
digests upstream next to the data (``sha256_digests`` below, the same
digest the CDX index records) and diff the fingerprints.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def sha256_digests(texts: list) -> list[str]:
    """Real content digests (hex sha256 — the WARC-Payload-Digest
    convention, minus the base32 dressing)."""
    return [
        hashlib.sha256((t or "").encode("utf-8")).hexdigest() for t in texts
    ]


def snapshot_diff(old_ds, new_ds, *, key: str = "urlkey",
                  digest: str = "digest", num_buckets: int | None = None):
    """(old, new) -> (key, status) via ONE bucketed exchange.

    Both inputs need (key, digest) columns; duplicate keys within a
    snapshot are collapsed to their first digest (a recrawl dedups by
    key before diffing — assert upstream if that matters)."""
    from ..shuffle import bucketed_groupby

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key: t[key],
                    digest: t[digest],
                    "__side": pa.array([side] * len(t), pa.string()),
                }
            )
        return fn

    both = old_ds.map_batches(tag("old"), batch_format="pyarrow").union(
        new_ds.map_batches(tag("new"), batch_format="pyarrow")
    )

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        old = df[df["__side"] == "old"].drop_duplicates(key)
        new = df[df["__side"] == "new"].drop_duplicates(key)
        m = old[[key, digest]].merge(
            new[[key, digest]], on=key, how="outer",
            suffixes=("_old", "_new"),
        )
        d_old = m[digest + "_old"]
        d_new = m[digest + "_new"]
        status = np.where(
            d_old.isna(), "new",
            np.where(
                d_new.isna(), "gone",
                np.where(d_old.to_numpy() == d_new.to_numpy(),
                         "unchanged", "changed"),
            ),
        )
        return pd.DataFrame({key: m[key], "status": status})

    return bucketed_groupby(
        both, key, diff, num_buckets=num_buckets, whole_bucket=True
    )
