"""MJPEG-in-AVI container (sources/avi.py): RIFF structure, frame
round-trips, fps rational, multimodal sniff integration."""

from __future__ import annotations

import numpy as np
import pytest

from ocrd_cis_ray.sources.avi import decode_mjpeg_avi, encode_mjpeg_avi


def test_constant_gray_bit_exact():
    frames = np.stack([np.full((24, 40), (7 * k) % 256, np.uint8) for k in range(5)])
    dec, fps = decode_mjpeg_avi(encode_mjpeg_avi(frames, fps=12))
    assert fps == 12.0 and len(dec) == 5
    for k, f in enumerate(dec):
        assert np.array_equal(f, frames[k])


def test_non_mcu_aligned_dims_exact():
    frames = np.stack([np.full((13, 19), 77, np.uint8)] * 3)
    dec, _ = decode_mjpeg_avi(encode_mjpeg_avi(frames))
    assert dec[0].shape == (13, 19)
    assert all(np.array_equal(f, frames[0]) for f in dec)


def test_rgb_lossy_bounded():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (32, 48, 3), np.uint8)
    smooth = base.astype(np.int64)
    for ax in (0, 1):  # smooth it so JPEG error is small
        smooth = (smooth + np.roll(smooth, 1, ax) + np.roll(smooth, -1, ax)) // 3
    rgb = np.stack([smooth.astype(np.uint8)] * 2)
    dec, _ = decode_mjpeg_avi(encode_mjpeg_avi(rgb, quality=90, subsampling="4:2:0"))
    assert dec[0].shape == (32, 48, 3)
    assert float(np.abs(dec[0].astype(int) - rgb[0].astype(int)).mean()) < 12


def test_fps_rational_and_empty():
    frames = np.zeros((1, 8, 8), np.uint8)
    _, fps = decode_mjpeg_avi(encode_mjpeg_avi(frames, fps=30))
    assert fps == 30.0
    dec, _ = decode_mjpeg_avi(encode_mjpeg_avi(np.zeros((0, 8, 8), np.uint8)))
    assert dec == []


def test_odd_sized_jpeg_chunks_stay_word_aligned():
    """Chunks with odd payload sizes must pad; the walk must still find
    every frame."""
    # varying content => varying (often odd) jpeg sizes
    frames = np.stack(
        [((np.arange(11 * 17).reshape(11, 17) * (k + 1)) % 256).astype(np.uint8) for k in range(7)]
    )
    dec, _ = decode_mjpeg_avi(encode_mjpeg_avi(frames, quality=60))
    assert len(dec) == 7


def test_rejects_non_avi():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_mjpeg_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_mjpeg_avi(b"garbage")


def test_decode_video_frames_sniff():
    from ocrd_cis_ray.stages.multimodal import decode_video_frames

    frames = np.stack([np.full((16, 16), 200, np.uint8)] * 4)
    luma = decode_video_frames(encode_mjpeg_avi(frames))
    assert luma.shape == (4, 16, 16)
    assert np.array_equal(luma, frames)


def test_deterministic():
    frames = np.stack([np.full((8, 8), 5, np.uint8)] * 2)
    assert encode_mjpeg_avi(frames) == encode_mjpeg_avi(frames)
