"""Page segmentation: page image → line regions in reading order.

Reimplements the *semantics* of the reference's segmentation
(ocrd_cis/ocropy/segment.py + compute_segmentation/lines2regions,
ocropy/common.py:1295-1794): detect text lines on a binarized page,
group them into regions/columns, and emit them in reading order
(top-to-bottom within a column, columns left-to-right — the recursive
X-Y cut ordering the reference's `lines2regions` RXYC produces;
reading-order topological sort per psegutils.py:114-170).

Algorithm (projection-profile recursive X-Y cut — a published classic,
not the reference's exact heuristics):
1. binarize (Otsu), compute ink profiles;
2. recursively split on the widest whitespace gap — horizontal gaps
   (≥ min_line_gap) separate stacked blocks, vertical gutters
   (≥ min_col_gap) separate columns; recursion alternates until no gap
   remains;
3. leaves = line boxes (y0, y1, x0, x1), emitted depth-first which IS
   reading order;
4. each line box becomes a line span + cropped media payload, offsets
   assigned in reading order (the driver schema's document-order index).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.media import decode_gray, encode_gray
from .image_ops import binarize_global


def _gaps(profile: np.ndarray, min_gap: int) -> list[tuple[int, int]]:
    """Maximal runs of zero-ink positions of length >= min_gap (interior only)."""
    blank = profile == 0
    gaps = []
    start = None
    for i, b in enumerate(blank):
        if b and start is None:
            start = i
        elif not b and start is not None:
            if i - start >= min_gap and start > 0:
                gaps.append((start, i))
            start = None
    # trailing blank run is a margin, not a separator
    return gaps


def segment_page(
    img: np.ndarray, *, min_line_gap: int = 3, min_col_gap: int = 20, min_line_h: int = 4
) -> list[tuple[int, int, int, int]]:
    """Line boxes (y0, y1, x0, x1) in reading order via recursive XY cut."""
    binary = binarize_global(img)
    fg = binary < 128

    out: list[tuple[int, int, int, int]] = []

    def recurse(box, axis: str):
        y0, y1, x0, x1 = box
        sub = fg[y0:y1, x0:x1]
        rows = sub.sum(axis=1)
        cols = sub.sum(axis=0)
        nz_r = np.flatnonzero(rows)
        nz_c = np.flatnonzero(cols)
        if len(nz_r) == 0:
            return
        ty0, ty1 = y0 + nz_r[0], y0 + nz_r[-1] + 1
        tx0, tx1 = x0 + nz_c[0], x0 + nz_c[-1] + 1
        if (ty0, ty1, tx0, tx1) != (y0, y1, x0, x1):
            recurse((ty0, ty1, tx0, tx1), axis)
            return
        if axis == "h":
            gaps = _gaps(rows, min_line_gap)
            if gaps:
                prev = y0
                for gy0, gy1 in gaps:
                    recurse((prev, y0 + gy0, x0, x1), "v")
                    prev = y0 + gy1
                recurse((prev, y1, x0, x1), "v")
                return
            # no horizontal gap: try vertical before declaring a leaf
            vgaps = _gaps(cols, min_col_gap)
            if vgaps:
                recurse(box, "v")
                return
            if y1 - y0 >= min_line_h:
                out.append(box)
            return
        else:  # vertical (column) cut: left-to-right
            vgaps = _gaps(cols, min_col_gap)
            if vgaps:
                prev = x0
                for gx0, gx1 in vgaps:
                    recurse((y0, y1, prev, x0 + gx0), "h")
                    prev = x0 + gx1
                recurse((y0, y1, prev, x1), "h")
                return
            # no column gap: fall back to horizontal
            hgaps = _gaps(rows, min_line_gap)
            if hgaps:
                recurse(box, "h")
                return
            if y1 - y0 >= min_line_h:
                out.append(box)

    h, w = fg.shape
    recurse((0, h, 0, w), "v")
    return out


def segment_pages_batch(batch: pa.Table, **params) -> pa.Table:
    """Page-media rows -> line-media rows in reading order.

    Input: (doc_id, span_id, media_ref, features, pixels) page images.
    Output: one row per detected line with the cropped payload, box
    coords, and a reading-order line index (the `offset` analog).
    """
    out = {
        "doc_id": [],
        "span_id": [],
        "media_ref": [],
        "features": [],
        "line_no": [],
        "y0": [],
        "y1": [],
        "x0": [],
        "x1": [],
        "pixels": [],
    }
    ids = batch["doc_id"].to_pylist()
    spans = batch["span_id"].to_pylist()
    refs = batch["media_ref"].to_pylist()
    feats = batch["features"].to_pylist()
    pixels = batch["pixels"].to_pylist()
    for did, sid, ref, feat, buf in zip(ids, spans, refs, feats, pixels):
        try:
            img = decode_gray(buf)
            boxes = segment_page(img, **params)
        except Exception:
            boxes = []  # log-and-skip (segment.py:486-493 fallback spirit)
        for ln, (y0, y1, x0, x1) in enumerate(boxes):
            out["doc_id"].append(did)
            out["span_id"].append(f"{sid}/line-{ln}")
            out["media_ref"].append(f"{ref}#l{ln}")
            out["features"].append(feat)
            out["line_no"].append(ln)
            out["y0"].append(y0)
            out["y1"].append(y1)
            out["x0"].append(x0)
            out["x1"].append(x1)
            out["pixels"].append(encode_gray(img[y0:y1, x0:x1]))
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"]),
            "span_id": pa.array(out["span_id"], pa.string()),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "features": pa.array(out["features"], pa.string()),
            "line_no": pa.array(np.array(out["line_no"], np.int32)),
            "y0": pa.array(np.array(out["y0"], np.int32)),
            "y1": pa.array(np.array(out["y1"], np.int32)),
            "x0": pa.array(np.array(out["x0"], np.int32)),
            "x1": pa.array(np.array(out["x1"], np.int32)),
            "pixels": pa.array(out["pixels"], pa.large_binary()),
        }
    )


def segment_pages(ds, **params):
    from functools import partial

    return ds.map_batches(
        partial(segment_pages_batch, **params), batch_format="pyarrow", batch_size=16
    )
