"""Sitemap XML container (sitemaps.org protocol 0.9).

Sitemaps are the crawl-discovery side of the robots contract
(``Sitemap:`` records in robots.txt point at them): a host publishes
``<urlset>`` documents listing its canonical URLs with ``<lastmod>``
and ``<priority>`` hints, and a crawler merges them into its frontier.
This module implements both directions stdlib-only:

- ``write_sitemap``: url entries -> spec-shaped XML bytes (UTF-8
  declaration, sitemaps.org namespace, XML-escaped locs).
- ``parse_sitemap``: XML bytes -> entries, via ``xml.etree`` with the
  namespace honored (a parser that ignores namespaces breaks on real
  sitemaps that alias the default ns).

Distributed plumbing mirrors warc.py/wet.py: one sitemap per batch on
the write side, batch-local explosion on the read side, ``read_
sitemaps`` for file ingestion — zero shuffle, shard count = read
parallelism.
"""

from __future__ import annotations

import re
from xml.etree import ElementTree
from xml.sax.saxutils import escape

import pyarrow as pa

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def write_sitemap(entries: list[dict]) -> bytes:
    """entries [{loc, lastmod?, priority?}] -> sitemap XML bytes."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<urlset xmlns="{SITEMAP_NS}">',
    ]
    for e in entries:
        parts.append("<url>")
        parts.append(f"<loc>{escape(e['loc'])}</loc>")
        if e.get("lastmod"):
            parts.append(f"<lastmod>{escape(e['lastmod'])}</lastmod>")
        if e.get("priority") is not None:
            parts.append(f"<priority>{e['priority']}</priority>")
        parts.append("</url>")
    parts.append("</urlset>")
    return "\n".join(parts).encode("utf-8")


def parse_sitemap(buf: bytes) -> list[dict]:
    """sitemap XML -> [{loc, lastmod, priority}] in document order.
    Namespace-aware; missing fields -> '' / None."""
    root = ElementTree.fromstring(buf)
    ns = {"sm": SITEMAP_NS}
    out = []
    for url in root.findall("sm:url", ns):
        loc = url.findtext("sm:loc", default="", namespaces=ns)
        lastmod = url.findtext("sm:lastmod", default="", namespaces=ns)
        prio = url.findtext("sm:priority", default=None, namespaces=ns)
        out.append(
            {
                "loc": loc.strip(),
                "lastmod": lastmod.strip(),
                "priority": float(prio) if prio is not None else None,
            }
        )
    return out


# ---------------------------------------------------------------------------
# distributed plumbing


def sitemap_shards_from_urls(batch: pa.Table) -> pa.Table:
    """(doc_id, loc, lastmod, priority) -> ONE sitemap shard per batch
    (the per-50k-URL file split real sitemaps use maps to the block
    size). Emits (shard_key, sitemap, n_urls)."""
    ids = batch["doc_id"].to_pylist()
    entries = [
        {"loc": l, "lastmod": m, "priority": p}
        for l, m, p in zip(
            batch["loc"].to_pylist(),
            batch["lastmod"].to_pylist(),
            batch["priority"].to_pylist(),
        )
    ]
    return pa.table(
        {
            "shard_key": pa.array([ids[0] if ids else -1], pa.int64()),
            "sitemap": pa.array([write_sitemap(entries)], pa.large_binary()),
            "n_urls": pa.array([len(entries)], pa.int64()),
        }
    )


_ID_TAIL = re.compile(r"/(\d+)(?:[?#]|$)")


def urls_from_sitemaps(batch: pa.Table) -> pa.Table:
    """(sitemap|bytes, ...) -> one row per <url> entry:
    (doc_id, loc, lastmod, priority). doc_id from the loc's trailing
    path integer when present (our writer's scheme), else -1."""
    col = "sitemap" if "sitemap" in batch.column_names else "bytes"
    ids, locs, mods, prios = [], [], [], []
    for payload in batch[col].to_pylist():
        for e in parse_sitemap(payload):
            m = _ID_TAIL.search(e["loc"])
            ids.append(int(m.group(1)) if m else -1)
            locs.append(e["loc"])
            mods.append(e["lastmod"])
            prios.append(e["priority"])
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "loc": pa.array(locs, pa.string()),
            "lastmod": pa.array(mods, pa.string()),
            "priority": pa.array(prios, pa.float64()),
        }
    )


def read_sitemaps(paths):
    """sitemap file(s)/dir -> Dataset of (doc_id, loc, lastmod,
    priority): one binary read task per file, entries exploded
    batch-locally."""
    import ray.data as rd

    return rd.read_binary_files(paths).map_batches(
        urls_from_sitemaps, batch_format="pyarrow"
    )
