"""Morphology suite, validity predicates, clip stage wiring,
segmentation scale estimate + topological reading order."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocrd_cis_ray.stages.image_ops import (
    check_page,
    check_region,
    keep_marked,
    propagate_labels,
    propagate_labels_majority,
    r_closing,
    r_dilation,
    r_erosion,
    r_opening,
    remove_marked,
    select_regions,
    spread_labels,
)


def _naive_dilate(a: np.ndarray, size) -> np.ndarray:
    h, w = a.shape
    sy, sx = size
    lo_y, lo_x = sy // 2, sx // 2
    out = np.zeros_like(a)
    for y in range(h):
        for x in range(w):
            y0, y1 = max(0, y - lo_y), min(h, y - lo_y + sy)
            x0, x1 = max(0, x - lo_x), min(w, x - lo_x + sx)
            out[y, x] = a[y0:y1, x0:x1].max()
    return out


def test_dilation_erosion_match_naive():
    rng = np.random.default_rng(0)
    for size in [(3, 3), (1, 5), (4, 2), (7, 7)]:
        a = rng.random((17, 23)) < 0.3
        assert (r_dilation(a, size) == _naive_dilate(a, size)).all(), size
        # erosion by duality: erode(a) == ~dilate(~a) for symmetric boxes
        if size[0] % 2 == 1 and size[1] % 2 == 1:
            assert (r_erosion(a, size) == ~_naive_dilate(~a, size)).all(), size


def test_opening_closing_properties():
    rng = np.random.default_rng(1)
    a = rng.random((20, 20)) < 0.4
    opened = r_opening(a, (3, 3))
    closed = r_closing(a, (3, 3))
    assert (opened <= a).all()  # anti-extensive
    assert (closed >= a).all()  # extensive


def test_keep_remove_marked():
    img = np.zeros((10, 20), bool)
    img[2:4, 2:6] = True  # comp A
    img[6:8, 10:15] = True  # comp B
    markers = np.zeros_like(img)
    markers[3, 3] = True  # touches A only
    kept = keep_marked(img, markers)
    assert kept[2:4, 2:6].all() and not kept[6:8, 10:15].any()
    removed = remove_marked(img, markers)
    assert not removed[2:4, 2:6].any() and removed[6:8, 10:15].all()


def test_propagate_labels_and_conflict():
    img = np.zeros((8, 24), bool)
    img[2:5, 2:8] = True  # comp 1: one seed
    img[2:5, 12:22] = True  # comp 2: two seeds -> conflict
    seeds = np.zeros((8, 24), np.int32)
    seeds[3, 3] = 5
    seeds[3, 13] = 7
    seeds[3, 20] = 9
    out = propagate_labels(img, seeds, conflict=99)
    assert out[3, 4] == 5
    assert out[3, 15] == 99
    # majority: comp 2 gets the label with most overlapping pixels
    seeds2 = np.zeros_like(seeds)
    seeds2[2:5, 12:15] = 7  # 9 px
    seeds2[3, 20] = 9  # 1 px
    outm = propagate_labels_majority(img, seeds2)
    assert outm[4, 21] == 7


def test_spread_labels_nearest():
    labels = np.zeros((9, 9), np.int32)
    labels[1, 1] = 1
    labels[7, 7] = 2
    out = spread_labels(labels, maxdist=10)
    assert out[0, 0] == 1 and out[8, 8] == 2
    assert out[2, 2] == 1 and out[6, 6] == 2


def test_select_regions_top_k():
    img = np.zeros((10, 30), bool)
    img[1:3, 1:4] = True  # area 6
    img[5:9, 5:10] = True  # area 20
    img[1:2, 20:22] = True  # area 2
    out = select_regions(img, lambda m: float(m.sum()), min_score=3, nbest=2)
    assert out[5:9, 5:10].all()
    assert out[1:3, 1:4].all()
    assert not out[1:2, 20:22].any()


def test_check_region_and_page():
    rng = np.random.default_rng(2)
    blank = np.full((700, 700), 255, np.uint8)
    assert "blank" in check_page(blank)
    # plausible page: many small ink blobs
    page = blank.copy()
    for _ in range(300):
        y, x = rng.integers(10, 680, 2)
        page[y : y + 6, x : x + 5] = 0
    assert check_page(page) == ""
    assert "not tall enough" in check_page(page[:100])
    region = page[:300, :300]
    assert check_region(region) == ""
    sparse = np.full((100, 150), 255, np.uint8)
    sparse[10:12, 10:12] = 0
    sparse[50:52, 50:52] = 0
    assert "too few" in check_region(sparse)
    inverted = 255 - page
    assert "inverted" in check_page(inverted)


def test_clip_stage_wiring(ray_session):
    """clip runs as a registered media stage: the intruder blob in the
    top margin is removed, the lineage tag appended."""
    import ray.data as rd

    from ocrd_cis_ray.registry import build_pipeline
    from ocrd_cis_ray.sources.media import decode_gray, encode_gray, render_line

    img = render_line("clip me please", intruder=True)
    assert (decode_gray(encode_gray(img))[0:3] == 0).any()  # intruder present
    rows = pa.Table.from_pylist(
        [{"doc_id": "d0", "span_id": "s0", "media_ref": "", "features": "binarized",
          "pixels": encode_gray(img)}]
    )
    out = build_pipeline(
        rd.from_arrow(rows), [{"stage": "clip", "params": {"margin": 3}}]
    ).to_pandas()
    assert out["features"][0] == "binarized,clipped"
    cleaned = decode_gray(out["pixels"][0])
    assert not (cleaned[0:3] == 0).any()  # intruder gone
    assert (cleaned[10:20] < 128).any()  # text untouched


def test_registry_rejects_unknown_params_even_without_defaults(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.registry import build_pipeline

    ds = rd.from_items([{"x": 1}])
    with pytest.raises(ValueError, match="unknown params"):
        build_pipeline(ds, [{"stage": "segment", "params": {"bogus": 1}}])
    with pytest.raises(ValueError, match="unknown params"):
        build_pipeline(ds, [{"stage": "extract", "params": {"bogus": 1}}])


def test_estimate_scale_and_adaptive_gap():
    from ocrd_cis_ray.sources.media import render_line
    from ocrd_cis_ray.stages.segment import estimate_scale, segment_page

    img = render_line("scale estimate test line")
    fg = img < 128
    s = estimate_scale(fg)
    assert 2 <= s < 15  # glyph cells are ~6x8, fragmented into blobs
    boxes = segment_page(img, min_line_gap="auto")
    assert len(boxes) == 1


def test_topological_reading_order_marginalia():
    """A skewed two-column layout with a short marginal note: the
    topological order reads left column top-to-bottom, then right
    column, then the bottom-right marginal note — x-overlap ordering
    the depth-first cut cannot express when boxes are offset."""
    from ocrd_cis_ray.stages.segment import reading_order

    # (y0, y1, x0, x1): left column lines slightly skewed downward,
    # right column offset vertically (non-Manhattan), marginal last
    boxes = [
        (52, 60, 100, 180),  # right col line 1 (offset down)
        (10, 18, 10, 80),  # left col line 1
        (70, 78, 100, 180),  # right col line 2
        (30, 38, 12, 82),  # left col line 2 (skew: x shifted)
        (90, 96, 150, 180),  # marginal note bottom right
        (50, 58, 14, 84),  # left col line 3
    ]
    order = reading_order(boxes)
    ordered = [boxes[i] for i in order]
    # left column fully before right column; marginal last
    assert ordered[0] == (10, 18, 10, 80)
    assert ordered[1] == (30, 38, 12, 82)
    assert ordered[2] == (50, 58, 14, 84)
    assert ordered[3] == (52, 60, 100, 180)
    assert ordered[4] == (70, 78, 100, 180)
    assert ordered[5] == (90, 96, 150, 180)


def test_resegment_tightens_boxes(ray_session):
    """After despeckling widened crops, resegment re-estimates each
    line box against a fresh segmentation: the tightened box follows
    the ink, coordinates stay page-absolute."""
    import ray.data as rd

    from ocrd_cis_ray.sources.media import decode_gray, encode_gray, render_line
    from ocrd_cis_ray.stages.segment import resegment_rows

    img = render_line("resegment this line")
    h, w = img.shape
    # simulate a sloppy previous segmentation: crop with wide margins
    pad = 6
    crop = np.full((h + 2 * pad, w + 2 * pad), 255, np.uint8)
    crop[pad : pad + h, pad : pad + w] = img
    rows = pa.Table.from_pylist(
        [{"doc_id": "d0", "span_id": "p/line-0", "media_ref": "", "features": "binarized",
          "line_no": 0, "y0": 100, "y1": 100 + crop.shape[0], "x0": 50,
          "x1": 50 + crop.shape[1], "pixels": encode_gray(crop)}]
    )
    out = resegment_rows(rd.from_arrow(rows)).to_pandas()
    assert out["features"][0] == "binarized,resegmented"
    ny0, ny1 = out["y0"][0], out["y1"][0]
    nx0, nx1 = out["x0"][0], out["x1"][0]
    # tighter than the sloppy crop, still inside it, page-absolute
    assert 100 <= ny0 and ny1 <= 100 + crop.shape[0]
    assert (ny1 - ny0) < crop.shape[0]
    assert 50 <= nx0 and nx1 <= 50 + crop.shape[1]
    new = decode_gray(out["pixels"][0])
    assert new.shape == (ny1 - ny0, nx1 - nx0)
    assert (new < 128).any()


def test_separator_removal_recovers_columns():
    """A vertical rule between two columns blocks the whitespace-gap
    cut; with remove_separators=True the rule is painted out and both
    columns segment in reading order (remove_hlines/compute_separators
    semantics)."""
    from ocrd_cis_ray.sources.media import render_line
    from ocrd_cis_ray.stages.segment import segment_page

    left = render_line("left col text")
    right = render_line("right side here")
    h = max(left.shape[0], right.shape[0])
    rule_w = 3
    gap = 24
    w = left.shape[1] + gap + rule_w + gap + right.shape[1]
    page = np.full((h * 2, w), 255, np.uint8)
    page[: left.shape[0], : left.shape[1]] = left
    x_rule = left.shape[1] + gap
    page[:, x_rule : x_rule + rule_w] = 0  # full-height vertical rule
    x_r = x_rule + rule_w + gap
    page[: right.shape[0], x_r : x_r + right.shape[1]] = right

    plain = segment_page(page)
    cleaned = segment_page(page, remove_separators=True)
    # with the rule removed, the two column blocks separate...
    assert len(cleaned) == 2
    (y0a, y1a, x0a, x1a), (y0b, y1b, x0b, x1b) = cleaned
    assert x1a <= x_rule and x0b >= x_rule  # left col first, right second
    # ...while the rule forces a different (merged or rule-spanning) cut
    assert plain != cleaned
