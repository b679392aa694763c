"""Span extraction / normalization — the flagship per-record transform.

Reimplements the reference's hierarchy-flattening semantics as a single
vectorizable ``map_batches`` stage over the interleaved document table:

- word spans are derived from each line by splitting on spaces
  (reference: ocrd_cis/ocropy/recognize.py:237 splits recognized line
  text into Word elements on spaces);
- region text is recomputed as the newline-join of its line texts
  (text-consistency projection, recognize.py:195-199);
- span text is NFKC-normalized (ocrolib/lstm.py:837-838);
- offsets are reassigned as a strictly-increasing 0-based document-order
  index (reading order; the reference's ordered-children invariant);
- invalid spans (unknown kind, image span with no media_ref) are dropped
  with the reference's log-and-skip error policy
  (recognize.py:227-232: a bad element never fails the page).

Input:  raw interleaved docs — ``(doc_id, spans)`` where region text may
        be empty and word spans absent.
Output: normalized docs, same schema; per-row invariant: span-sequence
        equality (kind, text, media_ref, order) against golden.

This stage is row-local (no shuffle); every row carries its whole page,
so sibling-span context is available without any exchange.
"""

from __future__ import annotations

import pyarrow as pa

from ..corpus import SPAN_TYPE, _build_spans
from ..util import nfkc, split_words

VALID_KINDS = {"region", "line", "word", "glyph", "image", "separator", "table"}


def extract_spans_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF (pyarrow in/out): normalize one batch of documents.

    Python-loop over spans is unavoidable here (ragged nested rewrite),
    but operates on plain lists decoded once per batch; the surrounding
    pipeline stays zero-copy Arrow.
    """
    doc_ids = batch["doc_id"].to_pylist()
    all_spans = batch["spans"].to_pylist()
    out_kinds: list[list[str]] = []
    out_texts: list[list[str]] = []
    out_media: list[list[str]] = []
    out_offs: list[list[int]] = []
    for spans in all_spans:
        kinds: list[str] = []
        texts: list[str] = []
        media: list[str] = []
        region_start = -1  # index in output list of current region span
        region_lines: list[str] = []

        def close_region():
            nonlocal region_start
            if region_start >= 0:
                texts[region_start] = "\n".join(region_lines)
                region_start = -1
            region_lines.clear()

        for s in spans:
            kind = s["kind"]
            if kind not in VALID_KINDS:
                continue  # log-and-skip policy (recognize.py:227-232)
            text = nfkc(s["text"]) if s["text"] else ""
            mref = s["media_ref"] or ""
            if kind == "image" and not mref:
                continue
            if kind == "region":
                close_region()
                region_start = len(kinds)
                kinds.append("region")
                texts.append("")
                media.append(mref)
            elif kind == "line":
                region_lines.append(text)
                kinds.append("line")
                texts.append(text)
                media.append(mref)
                for w in split_words(text):
                    kinds.append("word")
                    texts.append(w)
                    media.append("")
            elif kind == "word":
                continue  # re-derived from lines above
            else:  # image / separator / table / glyph pass through
                kinds.append(kind)
                texts.append(text)
                media.append(mref)
        close_region()
        out_kinds.append(kinds)
        out_texts.append(texts)
        out_media.append(media)
        out_offs.append(list(range(len(kinds))))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": _build_spans(out_kinds, out_texts, out_media, out_offs),
        }
    )


def flatten_spans_batch(batch: pa.Table) -> pa.Table:
    """Explode documents to one row per span (doc_id, offset, kind, text,
    media_ref) — the long-form output used by metrics / oracle checks.

    Pure Arrow: list-flatten + parent_indices, no Python loop.
    """
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    parents = spans.value_parent_indices()
    doc_ids = batch["doc_id"].take(parents)
    return pa.table(
        {
            "doc_id": doc_ids,
            "offset": flat.field("offset"),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )


def extract(ds, **map_kwargs):
    """Dataset-level wrapper: raw interleaved docs -> normalized docs."""
    return ds.map_batches(extract_spans_batch, batch_format="pyarrow", **map_kwargs)


def segment_text_batch(batch: pa.Table, *, words_per_line: int = 8) -> pa.Table:
    """Plain-text documents -> flat span rows: the text-side analog of
    line segmentation (reference: ocropy line segmentation produces
    TextLines, each then split to Words on spaces, recognize.py:237).

    Each document's words are grouped into lines of ``words_per_line``;
    output rows are (doc_id, offset:int32, kind, text, media_ref) with
    offsets assigned in reading order: line span first, then its word
    spans (offset(line k) = (W+1)*k since only the last line can be
    short). Deliberately SQL-expressible so the DuckDB oracle can check
    it exactly.
    """
    W = words_per_line
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_id, out_off, out_kind, out_text = [], [], [], []
    for did, text in zip(ids, texts):
        words = (text or "").split(" ")
        for k in range(0, len(words), W):
            chunk = words[k : k + W]
            ln = k // W
            out_id.append(did)
            out_off.append((W + 1) * ln)
            out_kind.append("line")
            out_text.append(" ".join(chunk))
            for j, w in enumerate(chunk):
                out_id.append(did)
                out_off.append((W + 1) * ln + 1 + j)
                out_kind.append("word")
                out_text.append(w)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "offset": pa.array(out_off, pa.int32()),
            "kind": pa.array(out_kind, pa.string()),
            "text": pa.array(out_text, pa.string()),
            "media_ref": pa.array([""] * len(out_id), pa.string()),
        }
    )
