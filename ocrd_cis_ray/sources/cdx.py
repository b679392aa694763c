"""CDX capture index over WARC shards — the web archive's random-access tier.

Common Crawl publishes, next to every WARC file, a CDX(J) index: one
entry per capture carrying the SURT-canonicalized URL key and the
(offset, length) of that record's own gzip member inside the WARC, plus
a payload digest and HTTP metadata. Readers fetch single pages out of
petabytes of archive by range-request + one-member gunzip — no scan.
This module implements that tier from the published formats (ISO 28500
member framing; SURT and CDXJ as documented by the pywb/OpenWayback
projects), Ray-Data-first:

- ``surt``: Sort-friendly URI Reordering Transform of a URL —
  lowercased, scheme/userinfo/default-port/``www.`` stripped, host
  labels reversed and comma-joined, query parameters sorted:
  ``https://www.Example.COM:443/A/b?z=1&a=2`` -> ``com,example)/a/b?a=2&z=1``.
- ``iter_gzip_members``: walk concatenated gzip members tracking exact
  byte (offset, length) per member — the values a CDX line records.
- ``index_warc``: WARC shard bytes -> one index entry per record:
  (urlkey, offset, length, digest sha256-of-payload, http status, mime).
- ``seek_record``: (shard, offset, length) -> the single record, by
  decompressing ONLY that member — the CDX consumer's access path.
- ``cdx_index_batch``: the map_batches UDF over (shard_key, warc) rows;
  each shard indexes batch-locally with a built-in seek round-trip
  (``seek_ok``): the record re-read through its own (offset, length)
  must hash to the sequential parse's digest. Indexing streams and
  scales with shard count, exactly like production CDX generation.

Reference parity note: the reference engine has no archive-index
analog; this operator exists for the 100-TB curation story (find /
re-fetch any document by URL without rescanning shards).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pyarrow as pa

from .warc import _parse_http_response

_CRLF = b"\r\n"
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def surt(url: str) -> str:
    """SURT canonical key for a URL (pywb-style canonicalization):
    lowercase; scheme dropped; userinfo dropped; default port and any
    leading ``www.`` stripped; host labels reversed + comma-joined;
    query params sorted bytewise; fragment dropped; empty path -> '/'.
    Unparseable inputs (no ``://`` authority) return the lowercased
    input unchanged so the key is still total and deterministic."""
    u = url.strip().lower()
    scheme, sep, rest = u.partition("://")
    if not sep or not rest:
        return u
    authority, slash, pathq = rest.partition("/")
    pathq = slash + pathq if slash else "/"
    # userinfo, then port
    authority = authority.rpartition("@")[2]
    host, colon, port = authority.partition(":")
    if colon and port == _DEFAULT_PORTS.get(scheme, ""):
        port = ""
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split(".")))
    if port:
        key += ":" + port
    path, q, query = pathq.partition("?")
    query = query.partition("#")[0] if q else ""
    path = path.partition("#")[0]
    out = key + ")" + (path or "/")
    if query:
        out += "?" + "&".join(sorted(query.split("&")))
    return out


def iter_gzip_members(buf: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Concatenated gzip members -> (offset, length, plaintext) per
    member, with byte-exact member boundaries. Chunked feeding keeps
    the per-member ``unused_data`` copy bounded (no O(n^2) tail
    slicing on many-member shards)."""
    mv = memoryview(buf)
    pos, n = 0, len(mv)
    chunk_size = 1 << 18
    while pos < n:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = bytearray()
        start = pos
        while True:
            chunk = bytes(mv[pos : pos + chunk_size])
            out += d.decompress(chunk)
            if d.eof:
                pos += len(chunk) - len(d.unused_data)
                out += d.flush()
                yield start, pos - start, bytes(out)
                break
            pos += len(chunk)
            if pos >= n:
                raise ValueError("truncated gzip member in WARC")


def _record_meta(rec_bytes: bytes) -> dict:
    """One plaintext WARC record -> CDX-relevant fields."""
    head_end = rec_bytes.index(_CRLF + _CRLF)
    headers: dict[str, str] = {}
    for ln in rec_bytes[:head_end].split(_CRLF)[1:]:
        k, _, v = ln.partition(b":")
        headers[k.decode("latin-1").strip().lower()] = v.decode("latin-1").strip()
    length = int(headers["content-length"])
    block = rec_bytes[head_end + 4 : head_end + 4 + length]
    meta = {
        "warc_type": headers.get("warc-type", ""),
        "url": headers.get("warc-target-uri"),
        "timestamp": (headers.get("warc-date") or "").replace("-", "")
        .replace(":", "").replace("T", "").rstrip("Z"),
    }
    if meta["warc_type"] == "response" and headers.get("content-type", "").startswith(
        "application/http"
    ):
        status, http_headers, body = _parse_http_response(block)
        meta["status"] = status
        meta["mime"] = http_headers.get("content-type", "").partition(";")[0].strip()
        payload = body
    else:
        meta["status"] = 0
        meta["mime"] = headers.get("content-type", "").partition(";")[0].strip()
        payload = block
    meta["digest"] = hashlib.sha256(payload).hexdigest()
    return meta


def index_warc(shard: bytes) -> list[dict]:
    """WARC shard bytes (per-record gzip members, the Common Crawl
    layout, or plain) -> one CDX entry dict per record:
    (urlkey, timestamp, offset, length, digest, status, mime,
    warc_type). Offsets/lengths address the shard byte range whose
    lone gunzip (or plain slice) reproduces the record — the
    contract ``seek_record`` consumes."""
    entries = []
    if shard[:2] == b"\x1f\x8b":
        members = iter_gzip_members(shard)
    else:
        members = _iter_plain_records(shard)
    for off, length, rec_bytes in members:
        meta = _record_meta(rec_bytes)
        meta["offset"] = off
        meta["length"] = length
        meta["urlkey"] = surt(meta["url"]) if meta["url"] else ""
        entries.append(meta)
    return entries


def _iter_plain_records(buf: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Record-framed walk of an UNcompressed WARC: offset/length are
    plain byte ranges (Content-Length framing + the two inter-record
    CRLFs)."""
    i, n = 0, len(buf)
    while i < n:
        while i < n and buf[i : i + 2] == _CRLF:
            i += 2
        if i >= n:
            break
        if not buf.startswith(b"WARC/", i):
            raise ValueError(f"malformed WARC record at byte {i}")
        head_end = buf.index(_CRLF + _CRLF, i)
        headers_blob = buf[i:head_end].lower()
        marker = b"content-length:"
        j = headers_blob.index(marker) + len(marker)
        length = int(headers_blob[j:].split(_CRLF, 1)[0])
        end = head_end + 4 + length + 4  # payload + trailing CRLFCRLF
        yield i, min(end, n) - i, buf[i : min(end, n)]
        i = end


def seek_record(shard: bytes, offset: int, length: int) -> dict:
    """Random access: decompress/slice ONLY the (offset, length) member
    of a shard and parse the single record inside — the CDX consumer
    path (range request + one-member gunzip). Returns the record dict
    of ``warc.parse_warc`` for that record."""
    from .warc import parse_warc

    member = shard[offset : offset + length]
    if member[:2] == b"\x1f\x8b":
        rec_bytes = zlib.decompress(member, 16 + zlib.MAX_WBITS)
    else:
        rec_bytes = member
    recs = parse_warc(rec_bytes)
    if len(recs) != 1:
        raise ValueError(f"seek did not isolate one record (got {len(recs)})")
    return recs[0]


def cdx_index_batch(batch: pa.Table) -> pa.Table:
    """(shard_key, warc) rows -> CDX entries for every RESPONSE record,
    with the seek contract proven per entry: ``seek_ok`` is true iff
    re-reading the record through its own (offset, length) yields a
    payload hashing to the sequential parse's digest. doc_id recovery
    follows ``warc._record_doc_id`` semantics (integer URL tail)."""
    col = "warc" if "warc" in batch.column_names else "bytes"
    out = {k: [] for k in (
        "doc_id", "urlkey", "offset", "length", "digest", "status", "mime",
        "seek_ok",
    )}
    for key, shard in zip(batch["shard_key"].to_pylist(), batch[col].to_pylist()):
        for e in index_warc(shard):
            if e["warc_type"] != "response":
                continue
            rec = seek_record(shard, e["offset"], e["length"])
            body = rec.get("body", "")
            ok = (
                hashlib.sha256(body.encode("utf-8")).hexdigest() == e["digest"]
                and rec.get("url") == e["url"]
            )
            tail = (e["url"] or "").rsplit("/", 1)[-1]
            out["doc_id"].append(int(tail) if tail.isdigit() else -1)
            out["urlkey"].append(e["urlkey"])
            out["offset"].append(e["offset"])
            out["length"].append(e["length"])
            out["digest"].append(e["digest"])
            out["status"].append(e["status"])
            out["mime"].append(e["mime"])
            out["seek_ok"].append(ok)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "urlkey": pa.array(out["urlkey"], pa.string()),
            "offset": pa.array(out["offset"], pa.int64()),
            "length": pa.array(out["length"], pa.int64()),
            "digest": pa.array(out["digest"], pa.string()),
            "status": pa.array(out["status"], pa.int32()),
            "mime": pa.array(out["mime"], pa.string()),
            "seek_ok": pa.array(out["seek_ok"], pa.bool_()),
        }
    )


def cdx_lines_batch(batch: pa.Table) -> pa.Table:
    """CDX entry rows -> classic space-separated CDX text lines
    (urlkey, timestamp placeholder-free subset: offset length digest
    status mime) for a plain-text index sink."""
    import pyarrow.compute as pc

    line = pc.binary_join_element_wise(
        batch["urlkey"].cast(pa.string()),
        batch["status"].cast(pa.string()),
        batch["mime"].cast(pa.string()),
        batch["digest"].cast(pa.string()),
        batch["offset"].cast(pa.string()),
        batch["length"].cast(pa.string()),
        " ",
    )
    return pa.table({"doc_id": batch["doc_id"], "cdx": line})
