"""Charset sniffing + decode for raw text payloads.

A web crawl delivers BYTES, not strings: CCNet (Wenzek et al. 2020)
and every production extraction pipeline sniff the encoding before any
text stage runs (HTTP headers lie, and ~10% of the web is not UTF-8).
This stage implements the deterministic part of that sniff — BOM
detection plus strict-UTF-8 validation with a Latin-1 fallback, the
exact precedence WHATWG's encoding sniff applies before content
heuristics — as a batch-local ``map_batches`` operator over a binary
payload column. Zero shuffle; codec work is per-payload, the same cost
model as the container codecs in ``sources/``.

Sniff precedence (``sniff_charset``):
  1. UTF-8 BOM            -> 'utf-8-sig'
  2. UTF-16 BOM (LE/BE)   -> 'utf-16'
  3. bytes decode as strict UTF-8 -> 'utf-8' (pure ASCII included)
  4. otherwise            -> 'latin-1' (never fails; the web fallback)

The deterministic synthesizer encodes each document's text (plus a
non-ASCII marker so Latin-1 is distinguishable from UTF-8 on the byte
level) in a doc_id-derived charset, so the q96 oracle can recompute
both the detected charset and the decoded text structurally while the
engine genuinely sniffs bytes it has never seen labeled.
"""

from __future__ import annotations

import pyarrow as pa

_BOM_UTF8 = b"\xef\xbb\xbf"
_BOM_UTF16_LE = b"\xff\xfe"
_BOM_UTF16_BE = b"\xfe\xff"

#: marker appended by the synthesizer: U+00E9 is one byte 0xE9 in
#: Latin-1 (invalid UTF-8 before an ASCII byte) and two bytes in UTF-8
MARKER = " é"

_CHARSETS = ("utf-8-sig", "utf-16", "latin-1", "utf-8")


def sniff_charset(b: bytes) -> str:
    """BOM + strict-UTF-8 sniff (see module docstring for precedence)."""
    if b.startswith(_BOM_UTF8):
        return "utf-8-sig"
    if b.startswith(_BOM_UTF16_LE) or b.startswith(_BOM_UTF16_BE):
        return "utf-16"
    try:
        b.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def synthesize_encoded_batch(t: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, payload): text + MARKER encoded in
    the doc_id-derived charset (doc_id%4 indexes _CHARSETS). A text the
    Latin-1 slot cannot carry (any codepoint > U+00FF — em dashes,
    curly quotes, CJK) falls back to UTF-8, exactly as a real encoder
    would pick a charset that fits; the q96 oracle mirrors the
    fallback with a codepoint-range regex."""
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    payloads = []
    for did, txt in zip(ids, texts):
        cs = _CHARSETS[int(did) % 4]
        s = (txt or "") + MARKER
        if cs == "latin-1" and any(ord(c) > 0xFF for c in s):
            cs = "utf-8"
        payloads.append(s.encode(cs))
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


def detect_decode_batch(t: pa.Table) -> pa.Table:
    """(doc_id, payload) -> (doc_id, charset, text): sniff each
    payload's encoding and decode with it. Batch-local."""
    ids = t["doc_id"]
    out_cs, out_text = [], []
    for payload in t["payload"].to_pylist():
        cs = sniff_charset(payload)
        out_cs.append(cs)
        # errors='replace': a BOM can lie (truncated or mislabeled
        # content after a valid BOM) — real crawl decoding never
        # crashes the pipeline on one bad payload. Valid payloads are
        # unaffected (the strict-UTF-8 branch was already validated by
        # the sniff, latin-1 cannot fail).
        out_text.append(payload.decode(cs, errors="replace"))
    return pa.table(
        {
            "doc_id": ids,
            "charset": pa.array(out_cs, pa.string()),
            "text": pa.array(out_text, pa.string()),
        }
    )


def detect_and_decode(ds):
    """(doc_id, payload) -> (doc_id, charset, text); task stage, zero
    shuffle."""
    return ds.map_batches(detect_decode_batch, batch_format="pyarrow")
