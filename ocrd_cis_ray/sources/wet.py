"""WET extracted-text container (Common Crawl's text artifact tier).

Common Crawl publishes three artifacts per crawl segment: WARC (raw
captures — ``sources/warc.py``), WAT (link/metadata records —
``stages/weblinks.py``) and WET: a WARC file whose records are
``conversion`` records carrying the extracted plain text of each page
(Content-Type text/plain, WARC-Refers-To pointing at the source
response record). This module completes the triple, so the engine can
both CONSUME the public WET tier directly (skip HTML extraction when
someone else already paid for it) and PRODUCE spec-shaped WET output
from its own extraction stage.

Distributed plumbing mirrors ``warc.py``: one shard per batch on the
write side (``wet_shards_from_text``), batch-local record explosion on
the read side (``texts_from_wet``), file-level ingestion via
``read_wet`` — all plain ``map_batches`` over Arrow batches, zero
shuffle, shard count = read parallelism.
"""

from __future__ import annotations

import pyarrow as pa

from .warc import _record_doc_id, parse_warc, write_warc


def wet_shards_from_text(batch: pa.Table) -> pa.Table:
    """(doc_id, url, content_text|text) -> ONE WET shard per batch:
    a warcinfo record followed by one gzipped conversion record per
    page. Deterministic (ids/dates derive from doc_id); each
    conversion record carries WARC-Refers-To naming the source
    response record id (the Common Crawl convention)."""
    col = "content_text" if "content_text" in batch.column_names else "text"
    ids = batch["doc_id"].to_pylist()
    urls = batch["url"].to_pylist()
    texts = batch[col].to_pylist()
    records = [
        {
            "warc_type": "warcinfo",
            "record_id": "urn:graft:wetinfo",
            "payload": (
                "software: ocrd_cis_ray\r\n"
                "format: WARC File Format 1.0\r\n"
                "conformsTo: WET extraction\r\n"
            ),
        }
    ]
    for did, url, text in zip(ids, urls, texts):
        records.append(
            {
                "warc_type": "conversion",
                "url": url or "",
                "date": "2026-01-01T00:00:00Z",
                "record_id": f"urn:graft:wet:{did}",
                "refers_to": f"urn:graft:doc:{did}",
                "content_type": "text/plain; charset=utf-8",
                "payload": text or "",
            }
        )
    shard = write_warc(records, gzip_per_record=True)
    return pa.table(
        {
            "shard_key": pa.array([ids[0] if ids else -1], pa.int64()),
            "wet": pa.array([shard], pa.large_binary()),
            "n_pages": pa.array([len(ids)], pa.int64()),
        }
    )


def texts_from_wet(batch: pa.Table) -> pa.Table:
    """(wet|bytes, ...) -> one row per conversion record:
    (doc_id, url, text). doc_id from the Target-URI integer tail when
    present (our writer's scheme), else a stable hash — the same
    recovery rule as WARC response ingestion."""
    col = "wet" if "wet" in batch.column_names else "bytes"
    out_ids, out_urls, out_text = [], [], []
    for payload in batch[col].to_pylist():
        for rec in parse_warc(payload):
            if rec["warc_type"] != "conversion":
                continue
            out_ids.append(_record_doc_id(rec))
            out_urls.append(rec.get("url") or "")
            out_text.append(rec["body"])
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "url": pa.array(out_urls, pa.string()),
            "text": pa.array(out_text, pa.string()),
        }
    )


def read_wet(paths):
    """WET file(s)/dir -> Dataset of (doc_id, url, text): one binary
    read task per shard, conversion records exploded batch-locally."""
    import ray.data as rd

    return rd.read_binary_files(paths).map_batches(
        texts_from_wet, batch_format="pyarrow"
    )
