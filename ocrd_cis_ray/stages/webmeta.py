"""HTML head-metadata extraction (title / author / canonical / og).

The metadata tier of web extraction: alongside the main content
(``webextract``) and the link graph (``weblinks``), a corpus pipeline
records each page's declared metadata — ``<title>``, ``<meta
name=author>``, ``<link rel=canonical>``, OpenGraph properties — for
provenance, canonical-URL reconciliation (the declared canonical wins
over the fetch URL in dedup, the Google/CC convention) and document
headers in the training corpus. Real DOM parsing, batch-local, zero
shuffle; one parser instance reused per batch (same cost model as the
content extractor).

Output schema: (doc_id, title, author, canonical, og_type) — missing
fields are empty strings, first occurrence wins (the browser rule for
duplicated metadata).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa


class _MetaParser(HTMLParser):
    """Collect head metadata; body parsing stops nothing (meta/link in
    the body are legal and honored, as browsers do)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._init_doc()

    def _init_doc(self):
        self.title_parts: list[str] = []
        self._in_title = False
        self._title_done = False  # first <title> element wins (SVG
        # <title>s later in the body must not append, the browser rule)
        self.meta: dict[str, str] = {}

    def feed_doc(self, html_text: str) -> dict[str, str]:
        self.reset()
        self._init_doc()
        self.feed(html_text)
        self.close()
        out = {"title": " ".join("".join(self.title_parts).split())}
        out.update(self.meta)
        return out

    def _first(self, key: str, value: str):
        if value and key not in self.meta:
            self.meta[key] = value

    def handle_starttag(self, tag, attrs):
        if tag == "title":
            if not self._title_done:
                self._in_title = True
            return
        a = dict(attrs)
        if tag == "meta":
            name = (a.get("name") or a.get("property") or "").lower()
            content = a.get("content") or ""
            if name == "author":
                self._first("author", content)
            elif name == "og:type":
                self._first("og_type", content)
        elif tag == "link" and (a.get("rel") or "").lower() == "canonical":
            self._first("canonical", a.get("href") or "")

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag == "title":
            self._in_title = False
            self._title_done = True

    def handle_endtag(self, tag):
        if tag == "title" and self._in_title:
            self._in_title = False
            self._title_done = True

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)


_FIELDS = ("title", "author", "canonical", "og_type")


def extract_metadata_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF: (doc_id, html) -> one metadata row per page."""
    parser = _MetaParser()
    ids = batch["doc_id"].to_pylist()
    pages = batch["html"].to_pylist()
    cols: dict[str, list] = {f: [] for f in _FIELDS}
    for page in pages:
        meta = parser.feed_doc(page or "")
        for f in _FIELDS:
            cols[f].append(meta.get(f, ""))
    out = {"doc_id": batch["doc_id"]}
    out.update({f: pa.array(cols[f], pa.string()) for f in _FIELDS})
    return pa.table(out)


def extract_metadata(ds):
    """(doc_id, html) -> (doc_id, title, author, canonical, og_type);
    task stage, zero shuffle."""
    return ds.map_batches(extract_metadata_batch, batch_format="pyarrow")
