"""FLAC codec (sources/flac.py): exact round-trips across subframe
types, rice methods, partitions, channel layouts; CRC corruption
detection; multimodal decode_audio integration."""

from __future__ import annotations

import numpy as np
import pytest

from ocrd_cis_ray.sources.flac import crc8, crc16, decode_flac, encode_flac


@pytest.fixture(scope="module")
def smooth():
    rng = np.random.default_rng(42)
    t = np.arange(10_000)
    return (8000 * np.sin(t / 50) + 200 * rng.standard_normal(len(t))).astype(np.int16)


def _roundtrip(x, **kw):
    dec, rate = decode_flac(encode_flac(x, 16_000, **kw), verify_md5=True)
    assert rate == 16_000
    assert np.array_equal(dec, x.astype(np.int32))


def test_mono_fixed_compresses(smooth):
    enc = encode_flac(smooth, 16_000)
    assert len(enc) < smooth.nbytes * 0.8  # really compressed
    _roundtrip(smooth)


def test_constant_and_verbatim_paths():
    _roundtrip(np.full(5000, -123, np.int16))  # CONSTANT subframe
    rng = np.random.default_rng(1)
    _roundtrip(rng.integers(-32768, 32768, 9000).astype(np.int16))  # escape/raw


def test_lpc_roundtrip(smooth):
    _roundtrip(smooth, method="lpc")


@pytest.mark.parametrize("po", [0, 2, 4])
@pytest.mark.parametrize("rm", [0, 1])
def test_partitioned_rice(smooth, po, rm):
    _roundtrip(smooth, partition_order=po, rice_method=rm)


def test_stereo_layouts(smooth):
    s = np.stack([smooth[:8000], smooth[:8000] // 2], axis=1).astype(np.int16)
    _roundtrip(s)  # independent
    _roundtrip(s, stereo_mode="mid-side")


@pytest.mark.parametrize("n", [0, 1, 5, 4096, 4097])
def test_edge_block_sizes(n):
    rng = np.random.default_rng(n)
    _roundtrip(rng.integers(-100, 100, n).astype(np.int16))


def test_deterministic(smooth):
    assert encode_flac(smooth, 16_000) == encode_flac(smooth, 16_000)


def test_crc_detects_corruption(smooth):
    enc = bytearray(encode_flac(smooth, 16_000))
    enc[len(enc) // 2] ^= 0xFF  # flip a frame byte
    with pytest.raises(ValueError, match="CRC|sync|flac"):
        decode_flac(bytes(enc))


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 known vectors ("123456789")
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_decode_audio_sniffs_flac(smooth):
    from ocrd_cis_ray.stages.multimodal import decode_audio

    wave = decode_audio(encode_flac(smooth, 16_000))
    assert wave.dtype == np.float32 and len(wave) == len(smooth)
    assert np.allclose(wave, smooth.astype(np.float32) / 32768.0, atol=1e-6)
    # stereo downmixes to mono
    s = np.stack([smooth[:4000], smooth[:4000]], axis=1).astype(np.int16)
    w2 = decode_audio(encode_flac(s, 16_000, stereo_mode="mid-side"))
    assert w2.shape == (4000,)


def test_featurizer_handles_flac(smooth, ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocrd_cis_ray.stages.multimodal import featurize_media

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["a"]),
                "media_ref": pa.array(["cas://x/1"]),
                "modality": pa.array(["audio"]),
                "payload": pa.array([encode_flac(smooth, 16_000)], pa.large_binary()),
                "meta": pa.array(["{}"]),
            }
        )
    )
    row = featurize_media(ds).take_all()[0]
    assert row["ok"] and len(row["feature"]) == 8


def test_utf8_frame_numbers_and_long_streams():
    """Frame indices past 127 use the multi-byte UTF-8-style coding."""
    from ocrd_cis_ray.sources.flac import _utf8_number

    for v, want in [
        (0, b"\x00"), (127, b"\x7f"), (128, b"\xc2\x80"), (0x7FF, b"\xdf\xbf"),
        (0x800, b"\xe0\xa0\x80"), (0xFFFF, b"\xef\xbf\xbf"), (0x10000, b"\xf0\x90\x80\x80"),
    ]:
        assert _utf8_number(v) == want, v
    rng = np.random.default_rng(5)
    x = (1000 * np.sin(np.arange(300 * 64) / 30) + 50 * rng.standard_normal(300 * 64)).astype(np.int16)
    dec, _ = decode_flac(encode_flac(x, 16_000, block_size=64), verify_md5=True)
    assert np.array_equal(dec, x.astype(np.int32))


def test_corruption_fuzz_raises_cleanly(smooth):
    """Any single-byte flip must either decode fine or raise a clean
    codec error (ValueError/EOFError) — never an internal IndexError."""
    enc = bytearray(encode_flac(smooth[:3000], 16_000))
    rng = np.random.default_rng(9)
    for pos in rng.integers(0, len(enc), 80):
        e2 = bytearray(enc)
        e2[pos] ^= 0xFF
        try:
            decode_flac(bytes(e2), verify_md5=True)
        except (ValueError, EOFError, NotImplementedError):
            pass
