"""WARC/1.0 web-archive container codec — stdlib only.

Common Crawl ships the web as WARC files (ISO 28500): a sequence of
records, each a CRLF-framed header block plus a Content-Length-framed
payload, with each record individually gzip-compressed and the members
concatenated (so a reader can seek to a record and decompress just it).
A web-scale extraction pipeline's first stage is splitting these
containers into per-page records; this module implements both
directions from the published spec:

- ``write_warc``: records -> WARC bytes (optionally one gzip member per
  record, the Common Crawl layout; deterministic — gzip mtime=0).
  Response records wrap the payload in a real HTTP/1.1 response.
- ``parse_warc``: WARC bytes (gzipped-member or plain) -> records, with
  the HTTP envelope of response records parsed off (status, headers,
  body) using the HTTP Content-Length framing.

Distributed plumbing lives in the same file: ``warc_shards_from_html``
packs (doc_id, html) rows into WARC shard payloads batch-locally, and
``records_from_warc`` explodes WARC payload columns back into one row
per contained page — both plain ``map_batches`` over Arrow batches, so
container splitting streams and scales with the block count, exactly
like production WARC ingestion over an object store.
"""

from __future__ import annotations

import gzip
import io
import zlib

import pyarrow as pa

_CRLF = b"\r\n"


def _gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (mtime=0, no filename)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(data)
    return buf.getvalue()


def write_warc(records: list[dict], *, gzip_per_record: bool = True) -> bytes:
    """records -> WARC/1.0 bytes.

    Each record dict: ``warc_type`` ('response'|'warcinfo'|...),
    ``url`` (WARC-Target-URI, response records), ``date`` (ISO 8601 Z),
    ``record_id``, ``payload`` (str|bytes). Response payloads are
    wrapped in an HTTP/1.1 200 envelope with ``content_type``
    (default text/html)."""
    out = bytearray()
    for rec in records:
        payload = rec.get("payload", b"")
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        wtype = rec.get("warc_type", "response")
        if wtype == "response":
            http = (
                b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: "
                + rec.get("content_type", "text/html; charset=utf-8").encode()
                + _CRLF
                + b"Content-Length: %d" % len(payload) + _CRLF
                + _CRLF
                + payload
            )
            block = http
            ctype = b"application/http; msgtype=response"
        else:
            block = payload
            ctype = rec.get("content_type", "application/warc-fields").encode()
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + wtype.encode(),
            b"WARC-Record-ID: <" + rec.get("record_id", "urn:x:0").encode() + b">",
            b"WARC-Date: " + rec.get("date", "2026-01-01T00:00:00Z").encode(),
        ]
        if rec.get("url"):
            headers.append(b"WARC-Target-URI: " + rec["url"].encode())
        if rec.get("refers_to"):
            headers.append(
                b"WARC-Refers-To: <" + rec["refers_to"].encode() + b">"
            )
        headers += [
            b"Content-Type: " + ctype,
            b"Content-Length: %d" % len(block),
        ]
        record = _CRLF.join(headers) + _CRLF + _CRLF + block + _CRLF + _CRLF
        out += _gzip_member(record) if gzip_per_record else record
    return bytes(out)


def _gunzip_members(buf: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plaintext."""
    out = bytearray()
    rest = buf
    while rest:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(rest)
        out += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        rest = d.unused_data
    return bytes(out)


def _parse_http_response(block: bytes) -> tuple[int, dict, bytes]:
    """HTTP/1.1 response bytes -> (status, headers, body). Body framing
    by the HTTP Content-Length when present."""
    head, _, rest = block.partition(_CRLF + _CRLF)
    lines = head.split(_CRLF)
    status = int(lines[0].split()[1]) if len(lines[0].split()) > 1 else 0
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        headers[k.decode("latin-1").strip().lower()] = v.decode(
            "latin-1"
        ).strip()
    clen = headers.get("content-length")
    body = rest[: int(clen)] if clen is not None else rest
    return status, headers, body


def parse_warc(buf: bytes) -> list[dict]:
    """WARC bytes (per-record-gzipped or plain) -> list of record dicts
    (warc_type, url, date, record_id, content_type; response records
    add http_status and body as str)."""
    if buf[:2] == b"\x1f\x8b":
        buf = _gunzip_members(buf)
    if not buf.startswith(b"WARC/"):
        raise ValueError("not a WARC payload")
    records = []
    i = 0
    n = len(buf)
    while i < n:
        # skip inter-record CRLFs
        while i < n and buf[i : i + 2] == _CRLF:
            i += 2
        if i >= n:
            break
        if not buf.startswith(b"WARC/", i):
            raise ValueError(f"malformed WARC record at byte {i}")
        head_end = buf.index(_CRLF + _CRLF, i)
        headers: dict[str, str] = {}
        for ln in buf[i:head_end].split(_CRLF)[1:]:
            k, _, v = ln.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = v.decode(
                "latin-1"
            ).strip()
        length = int(headers["content-length"])
        block_start = head_end + 4
        block = buf[block_start : block_start + length]
        i = block_start + length
        rec: dict = {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id", "").strip("<>"),
            "refers_to": headers.get("warc-refers-to", "").strip("<>"),
            "content_type": headers.get("content-type", ""),
        }
        if rec["warc_type"] == "response" and rec["content_type"].startswith(
            "application/http"
        ):
            status, http_headers, body = _parse_http_response(block)
            rec["http_status"] = status
            rec["body"] = body.decode("utf-8", "replace")
        else:
            rec["body"] = block.decode("utf-8", "replace")
        records.append(rec)
    return records


# ---------------------------------------------------------------------------
# distributed plumbing (map_batches UDFs)


def warc_shards_from_html(batch: pa.Table) -> pa.Table:
    """(doc_id, html) -> ONE WARC shard per batch: a warcinfo record
    followed by one gzipped response record per page (the Common Crawl
    shard layout). Deterministic: record ids/dates derive from doc_id.
    Emits (shard_key, warc, n_pages); shard_key = first doc_id."""
    ids = batch["doc_id"].to_pylist()
    pages = batch["html"].to_pylist()
    records = [
        {
            "warc_type": "warcinfo",
            "record_id": "urn:graft:warcinfo",
            "payload": "software: ocrd_cis_ray\r\nformat: WARC File Format 1.0\r\n",
        }
    ]
    for did, html in zip(ids, pages):
        records.append(
            {
                "warc_type": "response",
                "url": f"https://corpus.example/doc/{did}",
                "date": "2026-01-01T00:00:00Z",
                "record_id": f"urn:graft:doc:{did}",
                "payload": html or "",
            }
        )
    shard = write_warc(records, gzip_per_record=True)
    return pa.table(
        {
            "shard_key": pa.array([ids[0] if ids else -1], pa.int64()),
            "warc": pa.array([shard], pa.large_binary()),
            "n_pages": pa.array([len(ids)], pa.int64()),
        }
    )


def _record_doc_id(rec: dict) -> int:
    """Stable int64 doc_id for a response record. Shards written by
    ``warc_shards_from_html`` end the Target-URI in the original doc_id
    — recover it exactly (round-trip parity). Any other WARC (real
    Common Crawl URLs, missing Target-URI) gets a deterministic 63-bit
    hash of the record id / URL instead of a ValueError."""
    import hashlib

    url = rec.get("url")
    if url:
        tail = url.rsplit("/", 1)[-1]
        if tail.isdigit():
            return int(tail)
    key = rec.get("record_id") or url or ""
    return int.from_bytes(
        hashlib.blake2b(key.encode("utf-8"), digest_size=8).digest(), "big"
    ) >> 1


def records_from_warc(batch: pa.Table) -> pa.Table:
    """(warc, ...) -> one row per contained response record:
    (doc_id, url, html). doc_id comes from the record URL when it ends
    in an integer (our shard writer's scheme), else a stable hash — see
    ``_record_doc_id``. The container split is batch-local; downstream
    extraction streams per page."""
    col = "warc" if "warc" in batch.column_names else "bytes"
    out_ids, out_urls, out_html = [], [], []
    for payload in batch[col].to_pylist():
        for rec in parse_warc(payload):
            if rec["warc_type"] != "response":
                continue
            out_ids.append(_record_doc_id(rec))
            out_urls.append(rec.get("url") or "")
            out_html.append(rec["body"])
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "url": pa.array(out_urls, pa.string()),
            "html": pa.array(out_html, pa.string()),
        }
    )


def read_warc(paths):
    """WARC file(s)/dir -> Dataset of (doc_id, url, html): one binary
    read task per shard, records exploded batch-locally. The streaming
    ingestion entry for web-archive corpora (shard count = read
    parallelism, same as the parquet corpus layout)."""
    import ray.data as rd

    return rd.read_binary_files(paths).map_batches(
        records_from_warc, batch_format="pyarrow"
    )
