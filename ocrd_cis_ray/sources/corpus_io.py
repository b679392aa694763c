"""Corpus table I/O: Lance-first, parquet fallback.

The production input (north_rule / input_hint) is a LANCE table of
interleaved text + media documents
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
at 10^12-document scale, read as a streaming ``ray.data.Dataset``.
``ray.data.read_lance`` exists in Ray 2.49 but needs the ``lance``
package, which this sandbox does not ship — so the reader dispatches:

- a ``.lance`` dataset directory → ``ray.data.read_lance`` (column
  projection + filter pushdown supported by the Lance fragment reader);
- otherwise → ``ray.data.read_parquet`` over the same schema (the
  driver's testdata layout; identical downstream pipeline).

Everything downstream is format-agnostic: stages consume Arrow batches,
so swapping the storage layer never touches operator code. Writes mirror
the same dispatch (Lance when available, partitioned parquet fallback —
see state/manifest.write_resumable for the checkpointed sink).
"""

from __future__ import annotations

import os


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_corpus(path: str, *, columns: list[str] | None = None, **kwargs):
    """Streaming Dataset over a corpus table (Lance dir or parquet).

    ``columns`` prunes at the read on BOTH paths — only the projected
    columns leave storage (Lance fragment reader / parquet row groups).
    """
    import ray.data as rd

    if path.rstrip("/").endswith(".lance") or os.path.isdir(os.path.join(path, "data")):
        if not lance_available():
            raise RuntimeError(
                f"{path} looks like a Lance dataset but the 'lance' package "
                "is not installed; install pylance or convert to parquet"
            )
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_corpus(ds, path: str, **kwargs):
    """Write a corpus Dataset: Lance when the package is present,
    partitioned parquet otherwise (never one giant file — resumable
    layout per north_rule; for checkpointed writes use
    state/manifest.write_resumable)."""
    if path.rstrip("/").endswith(".lance"):
        if not lance_available():
            raise RuntimeError("Lance output requested but 'lance' is not installed")
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)
