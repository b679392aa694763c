"""Baseline-sequential JPEG codec — stdlib + numpy only, no pillow/cv2.

Closes the last multimodal env stub (VERDICT r4 item 2): real ML
corpora are JPEG-heavy, and the reference's image universe is
PIL-backed (``/root/reference/ocrd_cis/ocropy/common.py:21-53``
``pil2array`` accepts whatever PIL decodes, which in practice means
JFIF files). Everything here is the public ITU-T T.81 baseline
process: Annex K quantization + Huffman tables, 8x8 type-II DCT,
zigzag + DC-differential + run-length entropy coding, JFIF YCbCr.

Supported (decode): baseline DCT (SOF0), 8-bit, 1 component
(grayscale) or 3 components (YCbCr) with sampling factors 1 or 2
(covers 4:4:4, 4:2:2 and 4:2:0 — the layouts practically all corpus
JPEGs use), restart intervals (DRI / RSTn), multiple DQT/DHT
segments. Progressive (SOF2), arithmetic coding, 12-bit and
hierarchical modes raise ``NotImplementedError`` up front with the
production hint — same policy as the PNG/Y4M codecs in
``media.py``.

Supported (encode): grayscale and RGB at 4:4:4 or 4:2:0, libjpeg
quality scaling of the Annex K tables, optional restart interval (so
the decoder's RST path is testable without external files).

The DCT/IDCT and dequantization are vectorized over all blocks of a
component (one einsum per plane); only the entropy coding walks
blocks in Python — intrinsic sequential work (each block's Huffman
code length depends on the previous bits), parallel across images
inside ``map_batches``.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------------------
# ITU-T T.81 Annex K tables (public standard)

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# zigzag scan: ZIGZAG[k] = natural (row*8+col) index of zigzag position k
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)  # natural index -> zigzag position

# Huffman table specs: (bits[1..16] code-length histogram, symbol values)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


@lru_cache(maxsize=1)
def _dct_mat() -> np.ndarray:
    """8x8 orthonormal DCT-II matrix D: coef = D @ block @ D.T."""
    x = np.arange(8)
    d = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    d[0, :] /= np.sqrt(2.0)
    return d


def scaled_quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables (jcparam.c
    semantics, a public formula): scale = 5000/q below 50 else
    200 - 2q; entries clamped to [1, 255] for 8-bit baseline."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    luma = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255).astype(np.int32)
    chroma = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255).astype(np.int32)
    return luma, chroma


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


@lru_cache(maxsize=1)
def _std_enc_tables():
    return (
        _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
        _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    )


# ---------------------------------------------------------------------------
# color transforms (JFIF / ITU-R 601, float64 then rounded)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category ssss, extra bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _encode_block(
    w: _BitWriter, zz: np.ndarray, pred: int, dc_tab: dict, ac_tab: dict
) -> int:
    """Entropy-encode one zigzagged quantized block; returns new DC pred."""
    dc = int(zz[0])
    ssss, bits = _magnitude(dc - pred)
    code, ln = dc_tab[ssss]
    w.write(code, ln)
    if ssss:
        w.write(bits, ssss)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        ssss, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | ssss]
        w.write(code, ln)
        w.write(bits, ssss)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.write(code, ln)
    return dc


def _plane_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """float64 plane (h, w mult of 8) -> (by, bx, 64) quantized zigzag
    coefficients. DCT + quantization vectorized over all blocks."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    d = _dct_mat()
    coef = np.einsum("ux,byxw,vw->byuv", d, blocks, d, optimize=True)
    q = coef / quant.astype(np.float64)
    quantized = (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int32)
    # zigzag: position k of the output carries natural index ZIGZAG[k]
    return quantized.reshape(by, bx, 64)[:, :, ZIGZAG]


def _pad_edge(plane: np.ndarray, mult_h: int, mult_w: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    arr: np.ndarray,
    *,
    quality: int = 85,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes.

    ``subsampling``: '4:4:4' (no chroma subsampling) or '4:2:0'
    (2x2 box-averaged chroma). ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (tests the decoder's resync)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    luma_q, chroma_q = scaled_quant_tables(quality)
    dc_l, ac_l, dc_c, ac_c = _std_enc_tables()

    if gray:
        comps = [("Y", a.astype(np.float64), 1, 1, luma_q, 0, dc_l, ac_l)]
        hmax = vmax = 1
    else:
        if subsampling == "4:4:4":
            hs, vs = 1, 1
        elif subsampling == "4:2:0":
            hs, vs = 2, 2
        else:
            raise ValueError(f"unsupported subsampling {subsampling}")
        ycc = rgb_to_ycbcr(a)
        y = ycc[..., 0]
        cb, cr = ycc[..., 1], ycc[..., 2]
        if hs == 2:
            cbp = _pad_edge(cb, 2, 2)
            crp = _pad_edge(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
        comps = [
            ("Y", y, hs, vs, luma_q, 0, dc_l, ac_l),
            ("Cb", cb, 1, 1, chroma_q, 1, dc_c, ac_c),
            ("Cr", cr, 1, 1, chroma_q, 1, dc_c, ac_c),
        ]
        hmax, vmax = hs, vs

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component quantized zigzag blocks
    comp_blocks = []
    for _name, plane, ch, cv, quant, _qid, _dt, _at in comps:
        # pad the plane so it covers mcuy*cv x mcux*ch blocks exactly
        need_h, need_w = 8 * cv * mcuy, 8 * ch * mcux
        ph, pw = need_h - plane.shape[0], need_w - plane.shape[1]
        if ph or pw:
            plane = np.pad(plane, ((0, max(0, ph)), (0, max(0, pw))), mode="edge")
        comp_blocks.append(_plane_blocks(plane[:need_h, :need_w], quant))

    # entropy-coded scan, MCU-interleaved
    writer = _BitWriter()
    preds = [0] * len(comps)
    scan = bytearray()
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.pad_to_byte()
                scan += bytes(writer.out)
                writer = _BitWriter()
                scan += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                rst_idx += 1
                preds = [0] * len(comps)
            for ci, (_n, _p, ch, cv, _q, _qid, dct, act) in enumerate(comps):
                for v in range(cv):
                    for u in range(ch):
                        zz = comp_blocks[ci][my * cv + v, mx * ch + u]
                        preds[ci] = _encode_block(writer, zz, preds[ci], dct, act)
            mcu_count += 1
    writer.pad_to_byte()
    scan += bytes(writer.out)

    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(qid: int, table: np.ndarray) -> bytes:
        return (
            b"\xff\xdb"
            + struct.pack(">H", 67)
            + bytes([qid])
            + bytes(table.reshape(64)[ZIGZAG].astype(np.uint8).tolist())
        )

    out += dqt(0, luma_q)
    if not gray:
        out += dqt(1, chroma_q)

    # SOF0
    nf = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for i, (_n, _p, ch, cv, _q, qid, _dt, _at) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, qid])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = bytes([nf])
    for i in range(nf):
        tid = 0 if i == 0 else 1
        sos += bytes([i + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


class _HuffDecoder:
    """Canonical Huffman decoder (T.81 F.16 DECODE): per-length
    mincode/maxcode/valptr arrays."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += n
                k += n
                self.maxcode[ln] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, rd: "_BitReader") -> int:
        code = rd.read_bit()
        ln = 1
        while ln <= 16:
            if self.maxcode[ln] >= code >= self.mincode[ln]:
                return self.vals[self.valptr[ln] + code - self.mincode[ln]]
            code = (code << 1) | rd.read_bit()
            ln += 1
        raise ValueError("bad JPEG huffman code")


class _BitReader:
    """Bit reader over the entropy-coded scan with 0xFF00 unstuffing;
    RSTn markers are consumed by ``resync`` (they sit byte-aligned)."""

    def __init__(self, data: bytes, start: int) -> None:
        self.data = data
        self.pos = start
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # past EOI padding: feed 1-bits (T.81 allows it)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed data byte
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                # real marker (RST/EOI): stop feeding, pad with 1s
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def resync(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, ssss: int) -> int:
    """T.81 F.12 EXTEND: map ssss received bits to a signed value."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h, w) grayscale or (h, w, 3) RGB.

    Raises ``NotImplementedError`` for progressive / arithmetic /
    12-bit streams (production: pillow/libjpeg-turbo), ``ValueError``
    for malformed data."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) with comps = [(cid, ch, cv, qid)]
    scan_comps = None
    scan_start = None
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", d, pos + 2)
        seg = d[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                prec = seg[p] >> 4
                qid = seg[p] & 0xF
                if prec:
                    raise NotImplementedError(
                        "16-bit JPEG quant tables not supported (baseline 8-bit "
                        "decodes natively); production: pillow/libjpeg"
                    )
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], np.uint8)
                quant[qid] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(seg):
                cls = seg[p] >> 4
                tid = seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(-ext)
            prec, fh, fw, nf = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG not supported (8-bit baseline decodes "
                    "natively); production: pillow/libjpeg"
                )
            comps = []
            for i in range(nf):
                cid, hv, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/arithmetic/hierarchical JPEG not supported "
                "(baseline sequential decodes natively); production: "
                "pillow/libjpeg-turbo"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid = seg[1 + 2 * i]
                tsel = seg[2 + 2 * i]
                scan_comps.append((cid, tsel >> 4, tsel & 0xF))
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame
    if len(comps) not in (1, 3):
        raise NotImplementedError(
            f"{len(comps)}-component JPEG not supported (grayscale/YCbCr "
            "decode natively); production: pillow"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError(
            "JPEG sampling factors >2 not supported; production: pillow"
        )
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    # scan-order component specs
    by_cid = {c[0]: c for c in comps}
    specs = []  # (comp_index, ch, cv, quant, dc_dec, ac_dec)
    coef_store = []
    for cid, dc_id, ac_id in scan_comps:
        _, ch, cv, qid = by_cid[cid]
        if qid not in quant or (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("JPEG missing quant/huffman table")
        specs.append((ch, cv, quant[qid], huff[(0, dc_id)], huff[(1, ac_id)]))
        coef_store.append(np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int32))

    rd = _BitReader(d, scan_start)
    preds = [0] * len(specs)
    mcu_count = 0
    zz = np.zeros(64, dtype=np.int32)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd.resync()
                preds = [0] * len(specs)
            for ci, (ch, cv, _q, dc_dec, ac_dec) in enumerate(specs):
                for v in range(cv):
                    for u in range(ch):
                        zz[:] = 0
                        ssss = dc_dec.decode(rd)
                        diff = _extend(rd.read_bits(ssss), ssss) if ssss else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = ac_dec.decode(rd)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(rd.read_bits(s), s)
                            k += 1
                        coef_store[ci][my * cv + v, mx * ch + u] = zz
            mcu_count += 1

    # dequant + IDCT per component, vectorized
    dm = _dct_mat()
    planes = []
    for ci, (ch, cv, q, _dd, _ad) in enumerate(specs):
        by, bx, _ = coef_store[ci].shape
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[:, :, ZIGZAG] = coef_store[ci]
        nat = nat.reshape(by, bx, 8, 8) * q.astype(np.float64)
        pix = np.einsum("ux,byuv,vw->byxw", dm, nat, dm, optimize=True) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full frame size by pixel replication
        ry, rx = vmax // cv, hmax // ch
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    ycc[..., 0] = np.clip(np.round(ycc[..., 0]), 0, 255)
    return ycbcr_to_rgb(ycc)
