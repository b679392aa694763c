"""Outlink + anchor-text extraction (the WAT tier of a web crawl).

Common Crawl ships three artifact tiers per capture: WARC (raw), WET
(extracted text) and WAT (metadata — most importantly the outgoing
links of every page with their anchor text). The link tier is what
feeds host-level quality priors (PageRank over the host graph, see
``stages/linkgraph.py``) and crawl frontier expansion, so a
data-engine for web corpora needs it as a first-class operator, not a
by-product of content extraction (which deliberately DROPS link-dense
boilerplate — nav/related links are exactly what WAT must keep).

Scale design: link extraction is embarrassingly row-local — one
``map_batches`` task stage (the HTML parser costs ~1 µs to construct,
so tasks beat actor spawn; same measurement as ``webextract``), zero
shuffle, rows expand in place. Relative hrefs are resolved against the
page URL batch-locally (RFC 3986 merge + dot-segment removal); no
lookup side exists, nothing is broadcast.

Output schema (one row per link, document order preserved):
  (doc_id, link_no:int32, kind:'a'|'img', href:string  — raw attribute,
   url_target:string — resolved absolute URL, fragment dropped,
   anchor:string — whitespace-normalized anchor text / img alt)

Reference parity: the reference engine has no web tier; this operator
extends the span-extraction model (kind, text, media_ref, order — cf.
``/root/reference/ocrd_cis/ocropy/recognize.py`` span emission) to
link records, keeping (doc_id, link_no) the stable order key the same
way (doc_id, offset) orders content spans.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

_SKIP_TAGS = {"script", "style", "noscript", "template"}

# RFC 3986 scheme prefix ("mailto:", "media://", "https://", ...)
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")
_BASE_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<auth>[^/?#]*)(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 over '/'-separated segments."""
    segs = path.split("/")
    out: list[str] = []
    for i, seg in enumerate(segs):
        last = i == len(segs) - 1
        if seg == ".":
            pass
        elif seg == "..":
            if len(out) > 1:
                out.pop()
        else:
            out.append(seg)
            continue
        # a trailing "." / ".." still ends the path with a slash
        if last and (len(out) < 2 or out[-1] != ""):
            out.append("")
    return "/".join(out)


def resolve_href(base: str, href: str) -> str:
    """Resolve ``href`` against page URL ``base`` (RFC 3986 §5 merge,
    fragment dropped from the TARGET — WAT records link targets
    fragment-free; the raw href column keeps the original bytes)."""
    href = href.strip()
    frag = href.find("#")
    ref = href[:frag] if frag >= 0 else href
    if _SCHEME_RE.match(ref):
        return ref  # absolute (any scheme, incl. media://, mailto:)
    m = _BASE_RE.match(base)
    if m is None:
        return ref  # unparseable base: best effort, keep the href
    scheme, auth, bpath = m.group("scheme"), m.group("auth"), m.group("path")
    origin = f"{scheme}://{auth}"
    if ref.startswith("//"):
        return f"{scheme}:{ref}"
    if ref == "":
        # same-document reference (§5.3): base URI incl. its query
        bq = m.group("query")
        return f"{origin}{bpath}" + (f"?{bq}" if bq is not None else "")
    # dot-segment removal applies to the PATH component only (§5.2.4)
    # — split the reference's query off before merging
    qpos = ref.find("?")
    rpath, rquery = (ref[:qpos], ref[qpos:]) if qpos >= 0 else (ref, "")
    if rpath == "":
        return f"{origin}{bpath}{rquery}"  # query-only reference
    if rpath.startswith("/"):
        return origin + _remove_dot_segments(rpath) + rquery
    # relative path: merge with the base path's directory (§5.3)
    bdir = bpath[: bpath.rfind("/") + 1] if "/" in bpath else "/"
    return origin + _remove_dot_segments(bdir + rpath) + rquery


class _LinkParser(HTMLParser):
    """Collect (kind, href, anchor) in document order.

    ``link_no`` is assigned at the anchor's START tag so nesting (an
    ``<img>`` inside an ``<a>``) keeps the enclosing link first — the
    order a reader encounters them. One instance is reused across a
    batch (``feed_doc`` resets per document)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._init_doc()

    def _init_doc(self):
        # each link: [kind, href, list-of-text-parts]
        self.links: list[list] = []
        self._open: list[int] = []  # stack of indices of open <a> links
        self._skip = 0

    def feed_doc(self, html_text: str) -> list[tuple[str, str, str]]:
        self.reset()
        self._init_doc()
        self.feed(html_text)
        self.close()
        return [
            (kind, href, " ".join("".join(parts).split()))
            for kind, href, parts in self.links
        ]

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "a":
            href = dict(attrs).get("href")
            if href:
                self._open.append(len(self.links))
                self.links.append(["a", href, []])
            else:
                self._open.append(-1)  # anchor without target: no link row
        elif tag == "img":
            a = dict(attrs)
            src = a.get("src") or ""
            if src:
                self.links.append(["img", src, [a.get("alt") or ""]])

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag in _SKIP_TAGS:
            self._skip -= 1
        elif tag == "a" and not self._skip:
            self._open.pop()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "a" and self._open:
            self._open.pop()

    def handle_data(self, data):
        if self._skip or not self._open:
            return
        idx = self._open[-1]
        if idx >= 0:
            self.links[idx][2].append(data)


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF: (doc_id, url, html) -> link rows. Row-local,
    rows expand in place; no shuffle, no broadcast side."""
    parser = _LinkParser()
    ids = batch["doc_id"].to_pylist()
    urls = batch["url"].to_pylist()
    pages = batch["html"].to_pylist()
    out_ids, nos, kinds, hrefs, targets, anchors = [], [], [], [], [], []
    for doc_id, base, page in zip(ids, urls, pages):
        for no, (kind, href, anchor) in enumerate(parser.feed_doc(page or "")):
            out_ids.append(doc_id)
            nos.append(no)
            kinds.append(kind)
            hrefs.append(href)
            targets.append(resolve_href(base or "", href))
            anchors.append(anchor)
    return pa.table(
        {
            "doc_id": pa.array(out_ids, batch["doc_id"].type),
            "link_no": pa.array(nos, pa.int32()),
            "kind": pa.array(kinds, pa.string()),
            "href": pa.array(hrefs, pa.string()),
            "url_target": pa.array(targets, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
        }
    )


def extract_links(ds):
    """(doc_id, url, html) -> one row per outlink, document order via
    (doc_id, link_no). Task stage: parser construction is ~1 µs, so
    plain tasks beat an actor pool (same measurement as webextract's
    content stage)."""
    return ds.map_batches(extract_links_batch, batch_format="pyarrow")
