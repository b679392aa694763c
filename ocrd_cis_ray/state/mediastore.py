"""Content-addressed media sidecar store — the scale-correct layout for
multi-stage media pipelines (SURVEY.md §1.2's proposed alternative to
inline ``pixels: large_binary``).

Why: at 100 TB with multimodal rows, inline media payloads inflate
EVERY exchange that touches a media row (a repartition / groupby over
page rows moves the pixels even when the consumer only needs the key),
and they cap block sizes — a block of 1000 inline pages is hundreds of
MB, so `target_max_block_size` forces tiny row counts and the per-block
overhead dominates. With a sidecar, the Dataset row carries only a
``media_ref`` string (``cas://<blake2b-128-hex>/<nbytes>``); the bytes
live once in a content-addressed blob store (locally a sharded
directory tree; in production an object store bucket with the same key
layout) and are fetched lazily INSIDE the consuming stage, after all
exchanges.

Properties that matter at scale, all load-bearing here:

- **Content addressing** — the key is a 128-bit BLAKE2b of the payload,
  so identical media (re-crawled pages, duplicated scans) stores ONCE
  regardless of how many rows reference it, and a re-run of the writing
  stage is naturally idempotent (put of an existing key is a metadata
  stat, not a write).
- **Write-once via tmp + atomic rename** — concurrent writers of the
  same content race benignly: both write a tmp file, both rename to the
  same final path, the second rename is a no-op overwrite of identical
  bytes. No locks.
- **Prefix sharding** — blobs land under ``root/ab/cd/<hash>.bin`` (two
  byte-prefix levels, 65536 leaf dirs) so no directory ever holds an
  unbounded file count.
- **Lazy, batch-deduplicated fetch** — the consuming stage resolves the
  UNIQUE refs of its batch (duplicated media rows in a batch fetch
  once), keeping the read amplification at one blob read per distinct
  asset per consuming task.

Reference parity note: the reference workspace stores media as files on
disk referenced by METS ``FLocat`` hrefs and loads them lazily per page
(ocrd_cis/ocropy/common.py pil loaders over workspace paths); the
sidecar is that same file-by-reference design made content-addressed
and exchange-safe for Ray Data.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

_SCHEME = "cas://"


def content_ref(payload: bytes) -> str:
    """The content address of a payload: ``cas://<blake2b128>/<nbytes>``.

    The byte length rides in the ref so consumers can budget fetch
    batches (and sanity-check truncated reads) without a stat call.
    """
    h = hashlib.blake2b(payload, digest_size=16).hexdigest()
    return f"{_SCHEME}{h}/{len(payload)}"


def _parse_ref(ref: str) -> tuple[str, int]:
    if not ref.startswith(_SCHEME):
        raise ValueError(f"not a cas ref: {ref!r}")
    h, _, n = ref[len(_SCHEME) :].partition("/")
    return h, int(n)


class MediaStore:
    """A content-addressed blob store rooted at a directory.

    Locally this is a sharded directory tree; the key layout
    (``<2-hex>/<2-hex>/<hash>.bin``) maps 1:1 onto an object-store
    prefix scheme, so swapping the filesystem for a bucket client
    changes only ``_path``/``put``/``get``.
    """

    def __init__(self, root: str):
        self.root = str(root)
        os.makedirs(self.root, exist_ok=True)

    def _path(self, hex_hash: str) -> str:
        return os.path.join(self.root, hex_hash[:2], hex_hash[2:4], hex_hash + ".bin")

    def put(self, payload: bytes) -> str:
        """Store a payload, return its ref. Idempotent: an existing key
        is not rewritten (one ``stat`` instead of a write)."""
        ref = content_ref(payload)
        h, _ = _parse_ref(ref)
        path = self._path(h)
        if not os.path.exists(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)  # atomic; concurrent same-content races are benign
        return ref

    def get(self, ref: str) -> bytes:
        h, n = _parse_ref(ref)
        with open(self._path(h), "rb") as f:
            data = f.read()
        if len(data) != n:
            raise IOError(f"sidecar blob {ref} truncated: {len(data)} != {n}")
        return data

    def get_many(self, refs: list[str]) -> dict[str, bytes]:
        """Batch fetch with per-batch dedup: each DISTINCT ref reads once."""
        out: dict[str, bytes] = {}
        for r in refs:
            if r not in out:
                out[r] = self.get(r)
        return out

    def n_blobs(self) -> int:
        """Blob count (test/diagnostic; walks the tree)."""
        n = 0
        for _, _, files in os.walk(self.root):
            n += sum(1 for f in files if f.endswith(".bin"))
        return n

    def sweep(self, live_refs, *, dry_run: bool = False) -> dict:
        """Garbage-collect blobs not in ``live_refs`` (mark-and-sweep:
        datasets hold refs, the store holds blobs — dropped rows leave
        orphans only a sweep can reclaim). Returns {kept, deleted,
        bytes_freed}. ``dry_run`` reports without deleting. The live
        set is hashes, so it costs ~48 B/ref on the driver — pair with
        ``live_refs_of`` (bounded distinct-ref collection) upstream."""
        live = {_parse_ref(r)[0] for r in live_refs}
        kept = deleted = freed = 0
        for dirpath, _, files in os.walk(self.root):
            for f in files:
                if not f.endswith(".bin"):
                    continue
                if f[:-4] in live:
                    kept += 1
                    continue
                path = os.path.join(dirpath, f)
                freed += os.path.getsize(path)
                deleted += 1
                if not dry_run:
                    os.remove(path)
        return {"kept": kept, "deleted": deleted, "bytes_freed": freed}


# ---------------------------------------------------------------------------
# Dataset stages


def externalize_media(ds, root: str, *, payload_col: str = "pixels", ref_col: str = "media_ref"):
    """Replace an inline payload column with content-addressed sidecar
    refs: each batch's payloads are written to the store (content-dedup
    makes repeated payloads one blob and re-runs idempotent) and the
    payload column is DROPPED — downstream exchanges move O(refs).

    Task stage (stateless; the store handle is cheap to construct), so
    it composes with any upstream without actor-pool spawn cost.
    """

    def write(t: pa.Table) -> pa.Table:
        store = _store_for(root)
        refs = [store.put(p) for p in t[payload_col].to_pylist()]
        cols = {n: t[n] for n in t.column_names if n != payload_col}
        cols[ref_col] = pa.array(refs, pa.string())
        return pa.table(cols)

    return ds.map_batches(write, batch_format="pyarrow")


def fetch_media(ds, root: str, *, ref_col: str = "media_ref", payload_col: str = "pixels",
                batch_size: int | None = 64):
    """Re-attach payloads from the sidecar: the LAZY fetch a consuming
    stage runs AFTER all exchanges. Distinct refs in a batch fetch once.
    Small default batch (media rows are wide once hydrated)."""

    def read(t: pa.Table) -> pa.Table:
        store = _store_for(root)
        refs = t[ref_col].to_pylist()
        blobs = store.get_many(refs)
        cols = {n: t[n] for n in t.column_names}
        cols[payload_col] = pa.array([blobs[r] for r in refs], pa.large_binary())
        return pa.table(cols)

    return ds.map_batches(read, batch_format="pyarrow", batch_size=batch_size)


def live_refs_of(ds, *, ref_col: str = "media_ref", ceiling: int = 5_000_000) -> set[str]:
    """Distinct refs of a dataset, collected via per-batch unique
    partials (each batch contributes its DISTINCT refs only, so the
    exchange and the driver set are bounded by distinct-asset count,
    not row count). Raises past ``ceiling`` instead of OOMing the
    driver — shard the sweep by hash prefix beyond that."""

    def uniq(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({ref_col: pc.unique(t[ref_col])})

    out: set[str] = set()
    for batch in ds.map_batches(uniq, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        out.update(batch[ref_col].to_pylist())
        if len(out) > ceiling:
            raise ValueError(
                f"live_refs_of: over {ceiling} distinct refs — shard the sweep by hash prefix"
            )
    return out


_STORES: dict[str, MediaStore] = {}


def _store_for(root: str) -> MediaStore:
    """Process-global store handles (one makedirs per worker per root)."""
    s = _STORES.get(root)
    if s is None:
        s = _STORES[root] = MediaStore(root)
    return s
