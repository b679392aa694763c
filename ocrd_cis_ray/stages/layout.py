"""PDF-style layout parse: positioned text fragments -> reading order.

The north-star rule names "PDF/layout parse" alongside HTML boilerplate
strip as the main-content extraction tier. A PDF text layer is a bag of
positioned fragments with no ordering or structure; extraction must
reconstruct reading order geometrically. This module implements the
classic geometric pipeline (as published in PDF text-extraction
literature — e.g. pdfminer's layout analysis and Klampfl et al. 2014,
"Unsupervised document structure analysis of digital scientific
articles"):

1. margin crop: fragments in the top/bottom page margins are
   header/footer candidates, never body text;
2. running-header detection: a margin line whose text repeats on >50%
   of the document's pages is a running header/footer; page-number
   lines (digits-only) are dropped unconditionally;
3. column detection: 1-D gap clustering on fragment start-x — a gap
   wider than COLUMN_GAP between sorted fragment x-positions splits
   columns;
4. line clustering: within a column, fragments cluster into lines by
   quantized y; within a line they sort by x;
5. reading order: page ascending, column left-to-right, line
   top-to-bottom (column-major — the two-column article convention).

Everything is row-local ``map_batches`` over zero-copy Arrow batches:
each row carries ALL fragments of one document (the same
page-per-row shape the OCR pipeline uses), so reconstruction needs no
shuffle and the stage streams at any scale. The per-doc kernel is
numpy (`np.lexsort` over (page, column, line, x)), not a Python sort.

Determinism contract (the q45 oracle): ``synthesize_layout`` lays each
document's whitespace-normalized text into a deterministic 2-column,
multi-page layout with running headers and page numbers, then shuffles
the fragments by hash; ``reconstruct_reading_order`` must return the
normalized text EXACTLY (`regexp_replace(trim(text), '\\s+', ' ',
'g')` in the DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sampling import knuth_hash32

# page geometry (abstract units)
CHAR_W = 4.0
LINE_CHARS = 30          # pack words into a line until this many chars
LINES_PER_COL = 4
COL_X = (0.0, 200.0)     # two columns
HEADER_Y = 2.0
FOOTER_Y = 195.0
BODY_TOP = 20.0
LINE_H = 10.0
TOP_MARGIN = 10.0        # y < TOP_MARGIN -> header zone
BOTTOM_MARGIN = 190.0    # y > BOTTOM_MARGIN -> footer zone
COLUMN_GAP = 50.0        # min x-gap that splits columns
Y_QUANT = 3.0            # line clustering tolerance
FRAG_WORDS = 2           # fragments hold at most this many words

FRAG_TYPE = pa.struct(
    [
        ("page", pa.int32()),
        ("x", pa.float32()),
        ("y", pa.float32()),
        ("text", pa.string()),
    ]
)


# ---------------------------------------------------------------------------
# deterministic synthesizer (documents -> fragment bags)


def _lay_out(doc_id: int, text: str) -> list[dict]:
    """Deterministic layout: pack words into <=LINE_CHARS lines, fill
    columns top-to-bottom then left-to-right, pages in order; add a
    running header and a page-number footer to every page; emit
    fragments of <=FRAG_WORDS words and shuffle them by hash so the
    reconstruction actually has to re-derive the order."""
    words = text.split()
    # pack words into lines
    lines: list[list[str]] = []
    cur: list[str] = []
    n = 0
    for w in words:
        if cur and n + len(w) + 1 > LINE_CHARS:
            lines.append(cur)
            cur, n = [], 0
        cur.append(w)
        n += len(w) + 1
    if cur:
        lines.append(cur)

    per_page = LINES_PER_COL * len(COL_X)
    n_pages = max(1, -(-len(lines) // per_page))
    frags: list[dict] = []
    for li, line in enumerate(lines):
        page, rem = divmod(li, per_page)
        col, row = divmod(rem, LINES_PER_COL)
        y = BODY_TOP + row * LINE_H
        x0 = COL_X[col]
        chars = 0
        for f0 in range(0, len(line), FRAG_WORDS):
            chunk = line[f0 : f0 + FRAG_WORDS]
            frags.append(
                {
                    "page": page,
                    "x": x0 + chars * CHAR_W,
                    "y": y,
                    "text": " ".join(chunk),
                }
            )
            chars += sum(len(w) + 1 for w in chunk)
    for p in range(n_pages):
        frags.append(
            {"page": p, "x": COL_X[0], "y": HEADER_Y,
             "text": f"Doc {doc_id} - internal draft"}
        )
        frags.append(
            {"page": p, "x": 150.0, "y": FOOTER_Y, "text": str(p + 1)}
        )
    # deterministic shuffle: order by knuth hash of enumeration index
    order = np.argsort(
        knuth_hash32(np.arange(len(frags), dtype=np.int64) + int(doc_id)),
        kind="stable",
    )
    return [frags[i] for i in order]


def synthesize_layout_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    bags = [
        _lay_out(i, " ".join((t or "").split())) for i, t in zip(ids, texts)
    ]
    return pa.table(
        {
            "doc_id": pa.array(ids, batch["doc_id"].type),
            "frags": pa.array(bags, pa.list_(FRAG_TYPE)),
        }
    )


def synthesize_layout(ds):
    """documents(doc_id, text) -> (doc_id, frags); row-local."""
    return ds.map_batches(synthesize_layout_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# reconstruction


def _reconstruct_doc(frags: list[dict]) -> str:
    if not frags:
        return ""
    page = np.array([f["page"] for f in frags], dtype=np.int64)
    x = np.array([f["x"] for f in frags], dtype=np.float64)
    y = np.array([f["y"] for f in frags], dtype=np.float64)
    texts = [f["text"] for f in frags]
    n_pages = int(page.max()) + 1

    # 1-2. margin crop + running-header / page-number drop
    in_margin = (y < TOP_MARGIN) | (y > BOTTOM_MARGIN)
    drop = np.zeros(len(frags), dtype=bool)
    if in_margin.any():
        margin_idx = np.flatnonzero(in_margin)
        # running header: same text on >50% of pages
        seen: dict[str, set[int]] = {}
        for i in margin_idx:
            seen.setdefault(texts[i], set()).add(int(page[i]))
        for i in margin_idx:
            t = texts[i]
            if t.isdigit() or len(seen[t]) * 2 > n_pages:
                drop[i] = True
        # anything else in the margin zone is still non-body (crop rule)
        drop |= in_margin
    keep = ~drop
    if not keep.any():
        return ""
    page, x, y = page[keep], x[keep], y[keep]
    texts = [t for t, k in zip(texts, keep) if k]

    # 3. column detection: interval gap clustering — sort fragments by
    # start-x, track the running max end-x, split where the next start
    # clears the covered extent by more than COLUMN_GAP. (Start-x-only
    # gaps would mis-split wide fragments within a column.)
    end = x + np.array([len(t) for t in texts], dtype=np.float64) * CHAR_W
    sx = np.argsort(x, kind="stable")
    run_end = np.maximum.accumulate(end[sx])
    is_split = np.zeros(len(sx), dtype=bool)
    is_split[1:] = x[sx][1:] - run_end[:-1] > COLUMN_GAP
    col_sorted = np.cumsum(is_split)
    col = np.empty(len(sx), dtype=np.int64)
    col[sx] = col_sorted

    # 4-5. reading order: page, column, quantized-y line, x
    line = np.round(y / Y_QUANT).astype(np.int64)
    order = np.lexsort((x, line, col, page))
    return " ".join(texts[i] for i in order)


def reconstruct_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    bags = batch["frags"].to_pylist()
    out = [_reconstruct_doc(b or []) for b in bags]
    return pa.table(
        {
            "doc_id": pa.array(ids, batch["doc_id"].type),
            "content_text": pa.array(out, pa.string()),
        }
    )


def reconstruct_reading_order(ds):
    """(doc_id, frags) -> (doc_id, content_text); row-local, no shuffle."""
    return ds.map_batches(reconstruct_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# real PDF container path (sources/pdf.py codec)


def synthesize_pdf_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> (doc_id, pdf): each document laid out
    with `_lay_out` (multi-page, 2-column, running headers, page-number
    footers, hash-shuffled fragment order) and written as a REAL PDF
    1.4 file with FlateDecode content streams."""
    from ..sources.pdf import encode_pdf

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    pdfs = []
    for i, t in zip(ids, texts):
        frags = _lay_out(i, " ".join((t or "").split()))
        n_pages = 1 + max((f["page"] for f in frags), default=0)
        pages: list[list[dict]] = [[] for _ in range(n_pages)]
        for f in frags:
            pages[f["page"]].append(f)
        pdfs.append(encode_pdf(pages))
    return pa.table(
        {
            "doc_id": pa.array(ids, batch["doc_id"].type),
            "pdf": pa.array(pdfs, pa.large_binary()),
        }
    )


def extract_pdf_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, pdf) -> (doc_id, content_text): real PDF parse (object
    scan, page-tree walk, FlateDecode, content-stream interpretation)
    then the SAME geometric reading-order reconstruction the fragment
    path uses — margin crop, running-header/page-number drop, column
    detection, line clustering."""
    from ..sources.pdf import parse_pdf

    ids = batch["doc_id"].to_pylist()
    payloads = batch["pdf"].to_pylist()
    out = [_reconstruct_doc(parse_pdf(p)) if p else "" for p in payloads]
    return pa.table(
        {
            "doc_id": pa.array(ids, batch["doc_id"].type),
            "content_text": pa.array(out, pa.string()),
        }
    )


def synthesize_pdfs(ds):
    """documents(doc_id, text) -> (doc_id, pdf bytes); row-local."""
    return ds.map_batches(synthesize_pdf_batch, batch_format="pyarrow")


def extract_pdf_text(ds):
    """(doc_id, pdf bytes) -> (doc_id, content_text); row-local."""
    return ds.map_batches(extract_pdf_batch, batch_format="pyarrow")
