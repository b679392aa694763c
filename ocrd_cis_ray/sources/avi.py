"""Motion-JPEG in AVI — a REAL compressed-video container path.

Composes the RIFF/AVI 1.0 container (public Microsoft 'AVI RIFF File
Reference' layout) with the engine's own baseline-JPEG codec
(``sources/jpeg.py``): each frame is a complete JFIF image in a
``00dc`` chunk of the ``movi`` list — exactly the MJPEG that cameras,
capture cards and OpenCV's ``MJPG`` fourcc produce. This retires the
"compressed video" env stub for the MJPEG family; inter-frame codecs
(H.264/VP9) genuinely need PyAV and stay documented stubs.

Decode walks the RIFF chunk tree generically (unknown chunks skipped,
word-aligned sizes honored), takes fps from the stream header's
``dwRate/dwScale`` rational, and decodes every ``00dc``/``00db`` chunk
through ``decode_jpeg``. Encode writes a spec-shaped single-stream
file (avih + strl/strh/strf(BITMAPINFOHEADER fourcc 'MJPG') + movi +
idx1) and is deterministic.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_mjpeg_avi(
    frames: np.ndarray,
    *,
    fps: int = 25,
    quality: int = 95,
    subsampling: str = "4:4:4",
) -> bytes:
    """(n, h, w) uint8 gray or (n, h, w, 3) uint8 RGB -> MJPEG AVI."""
    f = np.asarray(frames)
    if f.dtype != np.uint8 or f.ndim not in (3, 4):
        raise ValueError("frames must be uint8 (n,h,w) or (n,h,w,3)")
    n, h, w = f.shape[:3]
    jpegs = [encode_jpeg(fr, quality=quality, subsampling=subsampling) for fr in f]
    maxbuf = max((len(j) for j in jpegs), default=0)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        maxbuf * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        maxbuf,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4h",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = dwRate/dwScale)
            0,  # dwStart
            n,  # dwLength (frames)
            maxbuf,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: variable-size samples)
            0, 0, w, h,  # rcFrame
        )
    )
    bmih = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        h * w * 3,  # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", bmih)),
    )
    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame (offset relative to the 'movi' fourcc)
    idx_entries = []
    off = 4  # past the 'movi' list-type fourcc
    for j in jpegs:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))  # AVIIF_KEYFRAME
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def decode_mjpeg_avi(payload: bytes) -> tuple[list[np.ndarray], float]:
    """MJPEG AVI -> (list of decoded frames (gray 2D or RGB 3D), fps).

    Generic RIFF walk: nested LISTs descended, unknown chunks skipped,
    both ``00dc`` (compressed) and ``00db`` (uncompressed-name variant
    some muxers use for MJPEG) accepted.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frames: list[np.ndarray] = []
    fps = 25.0

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal fps
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if fourcc == b"LIST":
                walk(buf, body_start + 4, body_end)  # skip list-type fourcc
            elif fourcc == b"strh" and size >= 56 and buf[body_start : body_start + 4] == b"vids":
                scale, rate = struct.unpack("<II", buf[body_start + 20 : body_start + 28])
                if scale and rate:
                    fps = rate / scale
            elif fourcc in (b"00dc", b"00db") and size > 0:
                frames.append(decode_jpeg(buf[body_start:body_end]))
            pos = body_start + size + (size % 2)

    walk(payload, 12, 8 + struct.unpack("<I", payload[4:8])[0])
    return frames, fps
