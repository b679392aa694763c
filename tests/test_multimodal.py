"""Multimodal columns: real image path, stubbed audio/video decode
(NotImplementedError by default, deterministic fake for plumbing)."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pytest

from ocrd_cis_ray.sources.media import encode_gray, render_line
from ocrd_cis_ray.stages.multimodal import (
    MediaFeaturizer,
    audio_features,
    decode_audio,
    decode_video_frames,
    featurize_media,
    ImageThumbnailer,
    resize_gray,
    sample_frames,
)


def _rows():
    img = render_line("media doc")
    return [
        {
            "doc_id": "d0",
            "media_ref": "m/img0",
            "modality": "image",
            "payload": encode_gray(img),
            "meta": json.dumps({"width": img.shape[1], "height": img.shape[0]}),
        },
        {
            "doc_id": "d1",
            "media_ref": "m/aud0",
            "modality": "audio",
            "payload": bytes(range(256)) * 4,
            "meta": json.dumps({"sample_rate": 16000, "channels": 1, "duration_s": 0.064}),
        },
        {
            "doc_id": "d2",
            "media_ref": "m/vid0",
            "modality": "video",
            "payload": bytes(range(256)) * 2,
            "meta": json.dumps({"fps": 8, "frames": 8, "width": 8, "height": 8}),
        },
    ]


def test_audio_video_stubs_raise_without_fake():
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x01")
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"\x00\x01")


def test_fake_decoders_deterministic():
    w1 = decode_audio(b"\x00\x80\xff", fake=True)
    w2 = decode_audio(b"\x00\x80\xff", fake=True)
    assert np.array_equal(w1, w2)
    assert w1.min() >= -1.0 and w1.max() <= 1.0
    f = decode_video_frames(bytes(range(128)), fake=True)
    assert f.shape == (2, 8, 8)


def test_resize_and_sampling_kernels():
    img = render_line("resize")
    t = resize_gray(img, 16, 16)
    assert t.shape == (16, 16)
    frames = np.arange(10 * 4).reshape(10, 2, 2).astype(np.uint8)
    s = sample_frames(frames, 4)
    assert s.shape == (4, 2, 2)
    assert s[0].tolist() == frames[0].tolist() and s[-1].tolist() == frames[9].tolist()
    assert audio_features(np.zeros(100), n_bands=4).shape == (4,)


def test_featurizer_stage_fake(ray_session):
    import ray.data as rd

    out = featurize_media(
        rd.from_arrow(pa.Table.from_pylist(_rows())), fake_decode=True, concurrency=1
    ).to_pandas()
    assert len(out) == 3
    assert out["ok"].all()
    by_mod = out.set_index("modality")["feature"]
    assert len(by_mod["image"]) == 64  # histogram
    assert len(by_mod["audio"]) == 8  # band RMS
    assert len(by_mod["video"]) == 4  # sampled frame means


def test_featurizer_stage_stub_records_error(ray_session):
    import ray.data as rd

    out = featurize_media(
        rd.from_arrow(pa.Table.from_pylist(_rows())), fake_decode=False, concurrency=1
    ).to_pandas()
    img = out[out["modality"] == "image"].iloc[0]
    assert img["ok"] and len(img["feature"]) == 64  # real path unaffected
    aud = out[out["modality"] == "audio"].iloc[0]
    assert not aud["ok"] and "audio decode" in aud["error"]


def test_thumbnailer(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.sources.media import decode_gray

    rows = [r for r in _rows() if r["modality"] == "image"]
    out = (
        rd.from_arrow(pa.Table.from_pylist(rows))
        .map_batches(ImageThumbnailer, batch_format="pyarrow", concurrency=1, batch_size=8)
        .to_pandas()
    )
    t = decode_gray(out["thumb"][0])
    assert t.shape == (24, 24)
    assert json.loads(out["thumb_meta"][0])["width"] == 24
