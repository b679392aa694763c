"""Image preprocessing kernels + the media-table Ray stages.

Golden semantics per FIXTURES.md F3: deskew recovers a known injected
angle, denoise removes a known speckle count, clip/borderclean remove a
known intruder, predicates have pass/fail cases, feature lineage tags
append in order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocrd_cis_ray.sources.media import decode_gray, encode_gray, render_line
from ocrd_cis_ray.stages.image_ops import (
    add_feature,
    binarize_global,
    binarize_nlbin,
    borderclean,
    check_line,
    clip_intruders,
    dewarp_centerline,
    estimate_skew_angle,
    has_feature,
    label_components,
    media_op,
    preprocess_chain,
    remove_small_components,
)


def test_codec_roundtrip():
    img = render_line("roundtrip")
    assert np.array_equal(decode_gray(encode_gray(img)), img)


def test_binarize_binary_output():
    img = render_line("hello world")
    for out in (binarize_global(img), binarize_nlbin(img)):
        assert set(np.unique(out)) <= {0, 255}
        # ink is preserved: some black pixels remain
        assert (out == 0).sum() > 0


@pytest.mark.parametrize("true_skew", [-3.0, -1.5, 2.0, 4.0])
def test_deskew_recovers_injected_angle(true_skew):
    img = render_line("the quick brown fox jumps", skew_deg=true_skew)
    est = estimate_skew_angle(img, maxskew=5.0, steps=8)
    assert abs(est - true_skew) <= 0.7


def test_denoise_removes_exact_speckle_count():
    # solid block (one big component) + 12 isolated speckles
    img = np.full((40, 120), 255, dtype=np.uint8)
    img[15:25, 20:80] = 0
    rng = np.random.default_rng(7)
    placed = 0
    while placed < 12:
        y, x = int(rng.integers(1, 39)), int(rng.integers(1, 119))
        if img[y - 1 : y + 2, x - 1 : x + 2].min() == 255:
            img[y, x] = 0
            placed += 1
    clean, removed = remove_small_components(img, minsize=3)
    assert removed == 12
    assert (clean[15:25, 20:80] == 0).all()  # the block survives


def test_label_components_counts():
    img = np.zeros((10, 10), dtype=bool)
    img[1:3, 1:3] = True
    img[6:9, 6:9] = True
    labels, n = label_components(img)
    assert n == 2
    assert labels.max() == 2


def test_clip_and_borderclean_remove_intruder():
    img = render_line("abc", intruder=True)
    assert (img[0:3] == 0).any()
    cl = clip_intruders(img, (4, img.shape[0] - 4, 0, img.shape[1]))
    assert (cl[0:3] == 255).all()
    bc = borderclean(img, margin=4)
    assert (bc[0:3] == 255).all()
    # glyph ink survives both
    assert (cl == 0).sum() > 0 and (bc == 0).sum() > 0


def test_dewarp_fixed_height():
    img = render_line("wavy line test", skew_deg=2.0)
    out = dewarp_centerline(img, target_h=24)
    assert out.shape == (24, img.shape[1])
    assert (out == 0).sum() > 0


def test_check_line_predicates():
    assert check_line(render_line("good line")) == ""
    assert "tall" in check_line(np.full((300, 100), 255, np.uint8))
    assert check_line(np.full((2, 100), 255, np.uint8)) != ""
    assert "black" in check_line(np.full((30, 100), 0, np.uint8))
    assert "blank" in check_line(np.full((30, 100), 255, np.uint8))


def test_feature_lineage_helpers():
    f = ""
    f = add_feature(f, "binarized")
    f = add_feature(f, "deskewed")
    assert f == "binarized,deskewed"
    assert has_feature(f, "binarized") and not has_feature(f, "dewarped")
    assert add_feature(f, "binarized") == f  # idempotent


def _media_table(n=6):
    rows = []
    for i in range(n):
        img = render_line(f"line number {i}", skew_deg=(i - 2) * 1.0, noise=i)
        rows.append(
            {
                "doc_id": f"d{i:04d}",
                "span_id": f"s{i}",
                "media_ref": f"media/d{i:04d}/line.bin",
                "features": "",
                "width": img.shape[1],
                "height": img.shape[0],
                "pixels": encode_gray(img),
            }
        )
    return pa.Table.from_pylist(rows)


def test_media_pipeline_chain(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_media_table())
    out = preprocess_chain(ds).to_pandas()
    assert len(out) == 6
    for feats in out["features"]:
        assert feats == "binarized,despeckled,clipped,deskewed,dewarped"
    assert (out["error"] == "").all()
    # all outputs decode and have the dewarp target height
    for buf in out["pixels"]:
        assert decode_gray(buf).shape[0] == 24
    # deskew stage annotated orientation
    assert "orientation" in out.columns


def test_media_op_error_fallback(ray_session):
    import ray.data as rd

    bad = pa.Table.from_pylist(
        [
            {
                "doc_id": "bad",
                "span_id": "s0",
                "media_ref": "",
                "features": "",
                "width": 1,
                "height": 1,
                "pixels": b"not-an-image",
            }
        ]
    )
    out = media_op(rd.from_arrow(bad), "binarize").to_pandas()
    # log-and-skip: row passes through unmodified with error recorded
    assert len(out) == 1
    assert out["error"][0] != ""
    assert out["pixels"][0] == b"not-an-image"


def test_dewarp_rejects_multiline_crop(ray_session):
    """A missegmented two-line crop must NOT be centerline-normalized
    (which would interleave both lines into one mangled band): the
    single-line check (lineest.py:25-59) fails it, the stage falls back
    to vertical padding (dewarp.py:158-166) and annotates the error;
    a clean one-line crop still dewarps."""
    import ray.data as rd

    from ocrd_cis_ray.sources.media import decode_gray, encode_gray, render_line
    from ocrd_cis_ray.stages.image_ops import media_op

    a, b = render_line("upper text line"), render_line("lower text line")
    w = max(a.shape[1], b.shape[1])
    two = np.full((a.shape[0] + b.shape[0] + 6, w), 255, np.uint8)
    two[: a.shape[0], : a.shape[1]] = a
    two[a.shape[0] + 6 :, : b.shape[1]] = b
    one = render_line("clean single line")
    ds = rd.from_items(
        [
            {"doc_id": 1, "span_id": "two", "features": "", "pixels": encode_gray(two)},
            {"doc_id": 2, "span_id": "one", "features": "", "pixels": encode_gray(one)},
        ]
    )
    rows = {r["span_id"]: r for r in media_op(ds, "dewarp").take_all()}
    bad = rows["two"]
    assert bad["error"]  # annotated, not silently mangled
    assert "padded" in bad["features"] and "dewarped" not in bad["features"]
    img = decode_gray(bad["pixels"])
    m = (img.shape[0] - two.shape[0]) // 2
    assert (img[m : m + two.shape[0]] == two).all()  # unmangled passthrough
    good = rows["one"]
    assert good["error"] == ""
    assert "dewarped" in good["features"]
