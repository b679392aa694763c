"""PAGE-XML ingestion: PcGts trees → interleaved span rows.

The reference's real input format is PAGE-XML loaded via
``page_from_file`` and traversed Page → TextRegion → TextLine → Word →
TextEquiv/Unicode (ocrd_cis/align/cli.py:63-79,302-304). This module
reimplements that traversal with stdlib ElementTree as a vectorizable
batch parser over raw XML payloads, producing the engine's interleaved
document schema (doc_id, spans: list<struct<kind,text,media_ref,
offset>>):

- one ``region`` span per TextRegion, text = its TextEquiv Unicode if
  present else the newline-join of its lines (recognize.py:195-199
  region-text update semantics), media_ref = ``imageFilename#regionId``;
- one ``line`` span per TextLine (TextEquiv[0] Unicode, NFKC-normalized
  like the extract stage);
- ``word`` spans from explicit Word elements when present, else the
  line text split on spaces (recognize.py:237 fallback);
- region order honors Page/ReadingOrder/OrderedGroup/RegionRefIndexed
  when present (index attribute), else document order — the same
  ordering PAGE consumers apply before alignment.

Namespace-agnostic: PAGE content namespaces vary by schema year, so all
lookups use the ``{*}`` wildcard.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import pyarrow as pa

from ..corpus import _build_spans
from ..util import nfkc


def _text_equiv(el) -> str | None:
    """First TextEquiv/Unicode of an element, or None."""
    te = el.find("{*}TextEquiv/{*}Unicode")
    if te is None:
        return None
    return te.text or ""


def _reading_order(page) -> dict[str, int]:
    """regionId -> index from ReadingOrder/OrderedGroup/RegionRefIndexed."""
    order: dict[str, int] = {}
    for rri in page.iterfind(".//{*}RegionRefIndexed"):
        ref = rri.get("regionRef")
        try:
            idx = int(rri.get("index", ""))
        except ValueError:
            continue
        if ref:
            order[ref] = idx
    return order


def parse_page_xml(doc_id: str, payload: bytes) -> tuple[list, list, list, list]:
    """One PcGts document -> parallel span lists (kind, text, media, off)."""
    root = ET.fromstring(payload)
    page = root.find("{*}Page")
    if page is None:
        raise ValueError(f"{doc_id}: no Page element")
    image = page.get("imageFilename", "") or ""
    regions = list(page.iterfind("{*}TextRegion"))
    ro = _reading_order(page)
    if ro:
        # stable: indexed regions in ReadingOrder position, the rest after
        regions.sort(
            key=lambda r: (0, ro[r.get("id")]) if r.get("id") in ro else (1, 0)
        )
    kinds: list[str] = []
    texts: list[str] = []
    media: list[str] = []

    for region in regions:
        rid = region.get("id", "")
        r_at = len(kinds)
        kinds.append("region")
        texts.append("")  # patched below
        media.append(f"{image}#{rid}" if image or rid else "")
        line_texts: list[str] = []
        for line in region.iterfind("{*}TextLine"):
            lid = line.get("id", "")
            raw = _text_equiv(line)
            if raw is None:
                # no line-level TextEquiv: join word texts (cli.py's
                # Word traversal is the fallback source of truth)
                words = [
                    _text_equiv(w) or "" for w in line.iterfind("{*}Word")
                ]
                raw = " ".join(w for w in words if w)
            ltext = nfkc(raw)
            if not ltext.strip():
                continue
            line_texts.append(ltext)
            kinds.append("line")
            texts.append(ltext)
            media.append(f"{image}#{lid}" if image or lid else "")
            word_els = list(line.iterfind("{*}Word"))
            if word_els:
                for w in word_els:
                    kinds.append("word")
                    texts.append(nfkc(_text_equiv(w) or ""))
                    media.append("")
            else:
                for w in ltext.split(" "):
                    kinds.append("word")
                    texts.append(w)
                    media.append("")
        r_text = _text_equiv(region)
        texts[r_at] = nfkc(r_text) if r_text is not None else "\n".join(line_texts)
    return kinds, texts, media, list(range(len(kinds)))


def parse_page_xml_batch(batch: pa.Table) -> pa.Table:
    """(bytes, path) rows -> interleaved (doc_id, spans) rows."""
    paths = batch["path"].to_pylist()
    payloads = batch["bytes"].to_pylist()
    doc_ids, kinds, texts, media, offs = [], [], [], [], []
    for path, payload in zip(paths, payloads):
        doc_id = os.path.splitext(os.path.basename(path))[0]
        try:
            k, t, m, o = parse_page_xml(doc_id, payload)
        except (ET.ParseError, ValueError):
            continue  # log-and-skip a malformed page, like the reference
        doc_ids.append(doc_id)
        kinds.append(k)
        texts.append(t)
        media.append(m)
        offs.append(o)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": _build_spans(kinds, texts, media, offs),
        }
    )
