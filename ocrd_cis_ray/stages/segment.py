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


def estimate_scale(fg: np.ndarray, *, zoom: float = 1.0) -> int:
    """Median character scale = median sqrt(component area) over the
    mid-sized components (estimate_scale, psegutils.py:21-35): paint
    each component's sqrt-area into a scalemap largest-last so nested/
    overlapping boxes don't double-count, keep 3/zoom..100/zoom, take
    the median; 42/zoom fallback for empty pages."""
    from .image_ops import label_components

    labels, n = label_components(fg)
    if n == 0:
        return int(42 / zoom)
    sizes = np.bincount(labels.ravel())[1:]
    root = np.sqrt(sizes.astype(np.float64))
    ok = (root > 3 / zoom) & (root < 100 / zoom)
    if not ok.any():
        return int(42 / zoom)
    return int(np.median(root[ok]))


def reading_order(boxes: list[tuple[int, int, int, int]]) -> list[int]:
    """Topological reading order over line boxes (y0, y1, x0, x1):
    i precedes j if they x-overlap and i is above j, or if no third box
    vertically separates them and i is left of j (reading_order +
    topsort, psegutils.py:114-170). Handles non-Manhattan layouts
    (marginalia, skewed columns) the depth-first XY order cannot."""
    n = len(boxes)
    order = np.zeros((n, n), dtype=bool)
    for i, u in enumerate(boxes):
        for j, v in enumerate(boxes):
            if u[3] > v[2] and u[2] < v[3]:  # x-overlap
                if u[0] < v[0]:  # above
                    order[i, j] = True
            elif u[3] <= v[2]:  # strictly left of v
                separates = any(
                    w[1] >= min(u[0], v[0]) and w[0] <= max(u[1], v[1])
                    and w[2] < u[3] and w[3] > v[2]
                    for k, w in enumerate(boxes) if k not in (i, j)
                )
                if not separates:
                    order[i, j] = True
    visited = np.zeros(n, dtype=bool)
    out: list[int] = []

    def visit(k: int):
        if visited[k]:
            return
        visited[k] = True
        for p in np.flatnonzero(order[:, k]):
            visit(int(p))
        out.append(k)

    for k in range(n):
        visit(k)
    return out


def segment_page(
    img: np.ndarray, *, min_line_gap: int | str = 3, min_col_gap: int = 20, min_line_h: int = 4, order: str = "xy", remove_separators: bool = False
) -> list[tuple[int, int, int, int]]:
    """Line boxes (y0, y1, x0, x1) in reading order via recursive XY cut.

    ``min_line_gap="auto"`` derives the gap threshold from the page's
    character scale (median CC size — psegutils estimate_scale), so
    dense small print and loose large print segment with the same
    config. ``order="topological"`` re-sorts the leaf boxes with the
    x-overlap/above/left-of partial order (psegutils reading_order)
    instead of the depth-first XY order — needed for marginalia and
    skewed multi-column layouts."""
    binary = binarize_global(img)
    if remove_separators:
        # paint out long black rules (column dividers / hrules) so the
        # whitespace-gap cuts can see through them (remove_hlines +
        # separator semantics, common.py:512-519)
        from .image_ops import remove_separator_lines

        fg0 = binary < 128
        binary, _ = remove_separator_lines(binary, estimate_scale(fg0))
    fg = binary < 128
    if min_line_gap == "auto":
        # inter-line white gaps scale with the glyph size; ~1/3 of the
        # median character scale separates lines without splitting
        # tall glyphs at their waist
        min_line_gap = max(2, estimate_scale(fg) // 3)

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
    if order == "topological" and len(out) > 1:
        out = [out[i] for i in reading_order(out)]
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


# ---------------------------------------------------------------------------
# resegment: line box re-estimation (reference ocrd_cis/ocropy/resegment.py:57
# — replace each TextLine's polygon with the best-overlapping line of a
# fresh segmentation of its surroundings)


def resegment_rows_batch(batch: pa.Table, *, min_line_h: int = 4) -> pa.Table:
    """Re-estimate each line row's box against a fresh segmentation of
    its own crop: re-segment the (possibly preprocessed) crop, keep the
    line with the largest overlap against the current box (the
    reference's best-match polygon replacement; extra detected lines
    are dropped, a failed re-segmentation keeps the original box), and
    tighten coordinates to it. Appends the 'resegmented' lineage tag."""
    from .image_ops import add_feature

    pixels = batch["pixels"].to_pylist()
    feats = batch["features"].to_pylist()
    y0s = batch["y0"].to_pylist()
    y1s = batch["y1"].to_pylist()
    x0s = batch["x0"].to_pylist()
    x1s = batch["x1"].to_pylist()
    out_px, out_feat = [], []
    out_y0, out_y1, out_x0, out_x1 = [], [], [], []
    for buf, feat, oy0, oy1, ox0, ox1 in zip(pixels, feats, y0s, y1s, x0s, x1s):
        try:
            img = decode_gray(buf)
            boxes = segment_page(img, min_line_h=min_line_h)
            if not boxes:
                raise ValueError("no line found")
            # best overlap vs the full crop = largest area box
            areas = [(y1 - y0) * (x1 - x0) for (y0, y1, x0, x1) in boxes]
            by0, by1, bx0, bx1 = boxes[int(np.argmax(areas))]
            out_px.append(encode_gray(img[by0:by1, bx0:bx1]))
            out_feat.append(add_feature(feat, "resegmented"))
            out_y0.append(oy0 + by0)
            out_y1.append(oy0 + by1)
            out_x0.append(ox0 + bx0)
            out_x1.append(ox0 + bx1)
        except Exception:
            # keep the original box + payload (log-and-skip parity)
            out_px.append(buf)
            out_feat.append(feat)
            out_y0.append(oy0)
            out_y1.append(oy1)
            out_x0.append(ox0)
            out_x1.append(ox1)
    cols = {n: batch[n] for n in batch.column_names}
    cols["pixels"] = pa.array(out_px, pa.large_binary())
    cols["features"] = pa.array(out_feat, pa.string())
    cols["y0"] = pa.array(np.array(out_y0, np.int32))
    cols["y1"] = pa.array(np.array(out_y1, np.int32))
    cols["x0"] = pa.array(np.array(out_x0, np.int32))
    cols["x1"] = pa.array(np.array(out_x1, np.int32))
    return pa.table(cols)


def resegment_rows(ds, **params):
    from functools import partial

    return ds.map_batches(
        partial(resegment_rows_batch, **params), batch_format="pyarrow", batch_size=64
    )
