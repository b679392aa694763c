"""JPEG codec (baseline-sequential AND progressive) — stdlib + numpy
only, no pillow/cv2.

Closes the multimodal env stub (VERDICT r4 item 2): real ML corpora
are JPEG-heavy, and the reference's image universe is PIL-backed
(``/root/reference/ocrd_cis/ocropy/common.py:21-53`` ``pil2array``
accepts whatever PIL decodes, which in practice means JFIF files).
Everything here is the public ITU-T T.81 standard: Annex K
quantization + Huffman tables, 8x8 type-II DCT, zigzag +
DC-differential + run-length entropy coding, JFIF YCbCr, and the
Annex G progressive mode.

Supported (decode): baseline DCT (SOF0/1) and PROGRESSIVE (SOF2 —
spectral selection and successive approximation: DC/AC first +
refinement scans, EOB runs, per-scan huffman tables), 8-bit, 1
component (grayscale) or 3 components (YCbCr) with sampling factors
1 or 2 (covers 4:4:4, 4:2:2 and 4:2:0 — the layouts practically all
corpus JPEGs use), restart intervals (DRI / RSTn), multiple DQT/DHT
segments. Arithmetic coding, 12-bit and hierarchical modes raise
``NotImplementedError`` up front with the production hint — same
policy as the PNG/Y4M codecs in ``media.py``.

Supported (encode): grayscale and RGB at 4:4:4 or 4:2:0, libjpeg
quality scaling of the Annex K tables, optional restart interval (so
the decoder's RST path is testable without external files), and
``progressive=True`` — the classic successive-approximation scan
ladder with per-scan OPTIMIZED huffman tables (T.81 K.2/K.3), whose
coefficients are identical to the baseline encode so both decode to
the same pixels exactly (the invariant the tests pin).

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
    progressive: bool = False,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> JFIF bytes.

    ``subsampling``: '4:4:4' (no chroma subsampling) or '4:2:0'
    (2x2 box-averaged chroma). ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (tests the decoder's resync).
    ``progressive=True`` emits SOF2 with the classic successive-
    approximation scan ladder (DC first at Al=1, AC bands at Al=2,
    two AC refinement passes, DC refinement) and per-scan OPTIMIZED
    huffman tables; the quantized coefficients are identical to the
    baseline encode, so both decode to the same pixels exactly."""
    a = np.asarray(arr)
    if progressive and restart_interval:
        raise ValueError("restart_interval with progressive encode not supported")
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
        elif subsampling == "4:2:2":
            hs, vs = 2, 1
        else:
            raise ValueError(f"unsupported subsampling {subsampling}")
        ycc = rgb_to_ycbcr(a)
        y = ycc[..., 0]
        cb, cr = ycc[..., 1], ycc[..., 2]
        if hs == 2:
            cbp = _pad_edge(cb, vs, 2)
            crp = _pad_edge(cr, vs, 2)
            cb = cbp.reshape(cbp.shape[0] // vs, vs, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // vs, vs, crp.shape[1] // 2, 2).mean(axis=(1, 3))
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

    # entropy-coded scan, MCU-interleaved (baseline path; the
    # progressive path emits its scans in _encode_progressive_scans)
    writer = _BitWriter()
    preds = [0] * len(comps)
    scan = bytearray()
    mcu_count = 0
    rst_idx = 0
    for my in range(0 if progressive else mcuy):
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

    # SOF0 (baseline) / SOF2 (progressive)
    nf = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for i, (_n, _p, ch, cv, _q, qid, _dt, _at) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, qid])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(">H", 2 + len(sof)) + sof

    if progressive:
        comps_meta = [(c[2], c[3]) for c in comps]
        out += _encode_progressive_scans(
            comps_meta, comp_blocks, mcux, mcuy, h, w, hmax, vmax
        )
        out += b"\xff\xd9"
        return bytes(out)

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
    """JFIF bytes -> uint8 (h, w) grayscale or (h, w, 3) RGB.

    Decodes baseline-sequential (SOF0/1) AND progressive (SOF2)
    streams — progressive covers both spectral selection and
    successive approximation (DC/AC first + refinement scans, EOB
    runs, per-scan Huffman tables, restart markers in either scan
    kind). Raises ``NotImplementedError`` for arithmetic /
    hierarchical / 12-bit streams (production: pillow/libjpeg-turbo),
    ``ValueError`` for malformed data."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, comps, progressive)
    scans: list[dict] = []
    while pos + 2 <= len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        if marker in (0xD8, 0x01, 0xFF) or 0xD0 <= marker <= 0xD7:
            pos += 2 if marker != 0xFF else 1
            continue
        if marker == 0xD9:
            break
        if pos + 4 > len(d):
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline(-ext), SOF2 progressive
            prec, fh, fw, nf = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG not supported (8-bit decodes "
                    "natively); production: pillow/libjpeg"
                )
            comps = []
            for i in range(nf):
                cid, hv, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, qid))
            frame = (fh, fw, comps, marker == 0xC2)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic/hierarchical JPEG not supported "
                "(baseline + progressive huffman decode natively); "
                "production: pillow/libjpeg-turbo"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — record the scan, skip its entropy data
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid = seg[1 + 2 * i]
                tsel = seg[2 + 2 * i]
                scan_comps.append((cid, tsel >> 4, tsel & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            scans.append(
                {
                    "comps": scan_comps,
                    "Ss": ss,
                    "Se": se,
                    "Ah": a >> 4,
                    "Al": a & 0xF,
                    "start": pos + 2 + seglen,
                    "huff": dict(huff),  # tables in effect for THIS scan
                    "ri": restart_interval,
                }
            )
            # skip the entropy-coded segment to the next true marker
            p = pos + 2 + seglen
            while p + 1 < len(d):
                if d[p] != 0xFF:
                    p += 1
                elif d[p + 1] == 0x00 or 0xD0 <= d[p + 1] <= 0xD7:
                    p += 2
                elif d[p + 1] == 0xFF:  # fill byte
                    p += 1
                else:
                    break
            pos = p
            continue
        pos += 2 + seglen
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps, progressive = frame
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

    by_cid = {c[0]: (i, c) for i, c in enumerate(comps)}
    coef_store = [
        np.zeros((mcuy * c[2], mcux * c[1], 64), dtype=np.int64) for c in comps
    ]

    for scan in scans:
        _decode_scan(d, scan, by_cid, coef_store, hmax, vmax, mcux, mcuy, fh, fw, progressive)

    # dequant + IDCT per component, vectorized
    dm = _dct_mat()
    planes = []
    for i, (_cid, ch, cv, qid) in enumerate(comps):
        if qid not in quant:
            raise ValueError("JPEG missing quant table")
        q = quant[qid]
        by, bx, _ = coef_store[i].shape
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[:, :, ZIGZAG] = coef_store[i]
        nat = nat.reshape(by, bx, 8, 8) * q.astype(np.float64)
        pix = np.einsum("ux,byuv,vw->byxw", dm, nat, dm, optimize=True) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
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


def _decode_scan(d, scan, by_cid, coef_store, hmax, vmax, mcux, mcuy, fh, fw, progressive):
    """Decode ONE entropy-coded scan into the coefficient store.

    Sequential: the single full-band scan. Progressive: DC/AC,
    first/refinement per (Ss, Se, Ah, Al) — T.81 G.2 (the EOB-run and
    correction-bit semantics follow the spec's G.1.2.2/G.1.2.3
    decoding procedures)."""
    huff = scan["huff"]
    ss, se, ah, al = scan["Ss"], scan["Se"], scan["Ah"], scan["Al"]
    ri = scan["ri"]
    if progressive:
        # T.81 G.1: DC scans are exactly Ss=Se=0; AC scans 1<=Ss<=Se<=63,
        # single-component; refinements step one bit (Ah == Al+1)
        if (ss == 0) != (se == 0) or se > 63 or ss > se:
            raise ValueError("malformed progressive scan band")
        if ss > 0 and len(scan["comps"]) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if ah and ah != al + 1:
            raise ValueError("progressive refinement must step one bit")
    elif (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("sequential scan must cover the full band")
    rd = _BitReader(d, scan["start"])

    specs = []  # (comp_index, ch, cv, dc_dec, ac_dec)
    for cid, dc_id, ac_id in scan["comps"]:
        idx, (_cid, ch, cv, _qid) = by_cid[cid]
        dc_dec = huff.get((0, dc_id))
        ac_dec = huff.get((1, ac_id))
        if ss == 0 and ah == 0 and dc_dec is None:
            raise ValueError("JPEG missing DC huffman table")
        if se > 0 and (not progressive or ss > 0) and ac_dec is None:
            raise ValueError("JPEG missing AC huffman table")
        specs.append((idx, ch, cv, dc_dec, ac_dec))

    interleaved = len(specs) > 1
    preds = [0] * len(specs)
    eob = [0]  # EOB-run counter (AC progressive scans)

    def visit(si: int, by: int, bx: int) -> None:
        idx = specs[si][0]
        zz = coef_store[idx][by, bx]
        if not progressive:
            preds[si] = _block_sequential(rd, zz, preds[si], specs[si][3], specs[si][4])
        elif ss == 0:
            if ah == 0:
                preds[si] = _block_dc_first(rd, zz, preds[si], specs[si][3], al)
            else:
                _block_dc_refine(rd, zz, al)
        else:
            if ah == 0:
                _block_ac_first(rd, zz, specs[si][4], ss, se, al, eob)
            else:
                _block_ac_refine(rd, zz, specs[si][4], ss, se, al, eob)

    if interleaved:
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and unit and unit % ri == 0:
                    rd.resync()
                    preds[:] = [0] * len(specs)
                    eob[0] = 0
                for si, (_idx, ch, cv, _dd, _ad) in enumerate(specs):
                    for v in range(cv):
                        for u in range(ch):
                            visit(si, my * cv + v, mx * ch + u)
                unit += 1
    else:
        # non-interleaved scan: the component's TRUE block grid
        _idx, ch, cv, _dd, _ad = specs[0]
        wb = -(-(fw * ch) // (hmax * 8))
        hb = -(-(fh * cv) // (vmax * 8))
        unit = 0
        for by in range(hb):
            for bx in range(wb):
                if ri and unit and unit % ri == 0:
                    rd.resync()
                    preds[:] = [0] * len(specs)
                    eob[0] = 0
                visit(0, by, bx)
                unit += 1


def _block_sequential(rd, zz, pred, dc_dec, ac_dec) -> int:
    """Baseline full-band block decode (T.81 F.2); returns new DC pred."""
    zz[:] = 0
    ssss = dc_dec.decode(rd)
    diff = _extend(rd.read_bits(ssss), ssss) if ssss else 0
    pred += diff
    zz[0] = pred
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
    return pred


def _block_dc_first(rd, zz, pred, dc_dec, al) -> int:
    """Progressive DC first scan: diff-coded (DC >> Al); pred runs in
    the reduced-precision domain."""
    ssss = dc_dec.decode(rd)
    diff = _extend(rd.read_bits(ssss), ssss) if ssss else 0
    pred += diff
    zz[0] = pred << al
    return pred


def _block_dc_refine(rd, zz, al) -> None:
    """Progressive DC refinement: one bit restores bit Al (two's
    complement OR — exact for the shifted first-scan value)."""
    if rd.read_bit():
        zz[0] = int(zz[0]) | (1 << al)


def _block_ac_first(rd, zz, ac_dec, ss, se, al, eob) -> None:
    """Progressive AC first scan for one block band (EOB-run coded)."""
    if eob[0] > 0:
        eob[0] -= 1
        return
    k = ss
    while k <= se:
        rs = ac_dec.decode(rd)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                eob[0] = (1 << r) - 1
                if r:
                    eob[0] += rd.read_bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC index overflow")
        zz[k] = _extend(rd.read_bits(s), s) << al
        k += 1


def _block_ac_refine(rd, zz, ac_dec, ss, se, al, eob) -> None:
    """Progressive AC refinement (T.81 G.1.2.3): correction bits for
    history-nonzero coefficients, ±1<<Al placements for newly
    significant ones, EOB runs complete remaining corrections."""
    delta = 1 << al

    def correct(k_from: int, k_to: int, stop_at_zero_run: int = -1) -> int:
        """Advance from k_from..k_to correcting nonzero coefficients;
        with stop_at_zero_run >= 0, stop at the (stop+1)-th zero-history
        slot and return its index (or k_to+1 if none)."""
        r = stop_at_zero_run
        k = k_from
        while k <= k_to:
            c = int(zz[k])
            if c != 0:
                if rd.read_bit():
                    if (abs(c) & delta) == 0:
                        zz[k] = c + delta if c > 0 else c - delta
            else:
                if r == 0:
                    return k
                if r > 0:
                    r -= 1
            k += 1
        return k

    if eob[0] > 0:
        # block inside an EOB run: only corrections over the band
        correct(ss, se)
        eob[0] -= 1
        return
    k = ss
    while k <= se:
        rs = ac_dec.decode(rd)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                eob[0] = 1 << r
                if r:
                    eob[0] += rd.read_bits(r)
                break  # EOB-run completion below handles this block
            # ZRL: pass over 16 zero-history coefficients
            k = correct(k, se, stop_at_zero_run=15)
            k += 1
            continue
        if s != 1:
            raise ValueError("JPEG AC refinement magnitude != 1")
        newval = delta if rd.read_bit() else -delta
        k = correct(k, se, stop_at_zero_run=r)
        if k <= se:
            zz[k] = newval
        k += 1
    if eob[0] > 0:
        correct(k, se)
        eob[0] -= 1


# ---------------------------------------------------------------------------
# progressive encoder (SOF2): spectral selection + successive
# approximation, per-scan OPTIMIZED huffman tables (T.81 K.2/K.3 —
# progressive symbol sets include EOBn codes absent from the Annex K
# baseline tables, so table optimization is structural, not a tweak)


def _build_huffman_table(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies -> canonical (bits[16], vals) per T.81 K.2/K.3:
    pairwise merge of lowest-frequency subtrees, length-limit to 16 by
    the Annex K.3 adjustment, reserved all-ones codepoint excluded via
    the sentinel symbol 256."""
    freq = np.zeros(257, np.int64)
    for s, n in freqs.items():
        freq[s] = n
    freq[256] = 1  # sentinel: guarantees no real symbol gets all-1s
    codesize = np.zeros(257, np.int64)
    others = np.full(257, -1, np.int64)
    while True:
        nz = np.flatnonzero(freq > 0)
        if len(nz) <= 1:
            break
        # v1 = least freq (ties: HIGHER symbol, the Annex K convention)
        order = nz[np.lexsort((-nz, freq[nz]))]
        v1, v2 = int(order[0]), int(order[1])
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = int(others[v1])
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = int(others[v2])
            codesize[v2] += 1
    bits = np.zeros(60, np.int64)
    for sz in codesize[codesize > 0]:
        bits[int(sz)] += 1
    # K.3: fold lengths > 16 back
    i = int(np.max(np.flatnonzero(bits))) if bits.any() else 0
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # drop the sentinel's codepoint (longest code)
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    # vals sorted by (codesize, symbol), sentinel excluded
    syms = [s for s in range(256) if codesize[s] > 0]
    syms.sort(key=lambda s: (codesize[s], s))
    return [int(b) for b in bits[1:17]], syms


class _TokenStream:
    """Entropy tokens of one scan: (symbol, [(value, nbits), ...]) —
    tokenized once for frequency counting, emitted once the optimized
    table exists."""

    def __init__(self) -> None:
        self.tokens: list[tuple[int, list[tuple[int, int]]]] = []
        self.freqs: dict[int, int] = {}

    def emit(self, symbol: int, extras: list[tuple[int, int]]) -> None:
        self.tokens.append((symbol, extras))
        self.freqs[symbol] = self.freqs.get(symbol, 0) + 1

    def raw(self, value: int, nbits: int) -> None:
        """Huffman-free bits (DC refinement scans)."""
        self.tokens.append((-1, [(value, nbits)]))

    def write(self, w: "_BitWriter", table: dict[int, tuple[int, int]] | None) -> None:
        for sym, extras in self.tokens:
            if sym >= 0:
                code, ln = table[sym]
                w.write(code, ln)
            for v, n in extras:
                if n:
                    w.write(v, n)


def _reduced_ac(v: int, al: int) -> int:
    """Point transform for AC: sign(v) * (|v| >> Al) (T.81 G.1.2.2)."""
    return (abs(int(v)) >> al) * (1 if v >= 0 else -1)


def _tok_dc_first(stream: _TokenStream, zz, pred: int, al: int) -> int:
    v = int(zz[0]) >> al  # arithmetic shift: two's-complement reduced DC
    ssss, bits = _magnitude(v - pred)
    stream.emit(ssss, [(bits, ssss)])
    return v


def _tok_dc_refine(stream: _TokenStream, zz, al: int) -> None:
    stream.raw((int(zz[0]) >> al) & 1, 1)


class _ACScanState:
    __slots__ = ("eobrun", "pending")

    def __init__(self) -> None:
        self.eobrun = 0
        self.pending: list[tuple[int, int]] = []  # buffered correction bits

    def flush_eob(self, stream: _TokenStream) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            stream.emit(r << 4, ([(self.eobrun - (1 << r), r)] if r else []) + self.pending)
            self.eobrun = 0
            self.pending = []
        elif self.pending:
            raise AssertionError("correction bits without an emitting symbol")


def _tok_ac_first(stream: _TokenStream, st: _ACScanState, zz, ss: int, se: int, al: int) -> None:
    vals = [_reduced_ac(zz[k], al) for k in range(ss, se + 1)]
    if not any(vals):
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob(stream)
        return
    st.flush_eob(stream)
    r = 0
    last_nz = max(i for i, v in enumerate(vals) if v)
    for v in vals[: last_nz + 1]:
        if v == 0:
            r += 1
            continue
        while r > 15:
            stream.emit(0xF0, [])  # ZRL
            r -= 16
        ssss, bits = _magnitude(v)
        stream.emit((r << 4) | ssss, [(bits, ssss)])
        r = 0
    if last_nz < len(vals) - 1:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob(stream)


def _tok_ac_refine(stream: _TokenStream, st: _ACScanState, zz, ss: int, se: int, ah: int, al: int) -> None:
    """T.81 G.1.2.3 encode: newly-significant (r,1) symbols with sign
    bits, correction bits for history-nonzero coefficients buffered
    onto the next emitted symbol (or the closing EOBn)."""
    br: list[tuple[int, int]] = []
    r = 0  # run of zero-HISTORY coefficients (corrections are transparent)
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        # nonzero of either kind: fold overlong runs FIRST, so each
        # correction bit attaches to the symbol whose decode traversal
        # passes its coefficient (the T.81 G.1.2.3 emission order)
        while r > 15:
            st.flush_eob(stream)
            stream.emit(0xF0, br)  # ZRL covers 16 zero-history slots
            br = []
            r -= 16
        if t > 1:  # history-nonzero: buffer the correction bit
            br.append((t & 1, 1))
            continue
        # newly significant (t == 1)
        st.flush_eob(stream)
        stream.emit((r << 4) | 1, [(1 if v > 0 else 0, 1)] + br)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush_eob(stream)


def _progressive_scan_script(n_comps: int) -> list[tuple]:
    """(kind, comp_indices, Ss, Se, Ah, Al) — the classic SA ladder:
    DC first at Al=1, AC bands at Al=2, two AC refinement passes,
    one DC refinement."""
    if n_comps == 1:
        bands = [(0, 1, 5), (0, 6, 63)]
    else:
        bands = [(0, 1, 5), (0, 6, 63), (1, 1, 63), (2, 1, 63)]
    script: list[tuple] = [("dc_first", list(range(n_comps)), 0, 0, 0, 1)]
    script += [("ac_first", [c], s, e, 0, 2) for c, s, e in bands]
    script += [("ac_refine", [c], s, e, 2, 1) for c, s, e in bands]
    script += [("ac_refine", [c], s, e, 1, 0) for c, s, e in bands]
    script.append(("dc_refine", list(range(n_comps)), 0, 0, 1, 0))
    return script


def _encode_progressive_scans(comps_meta, comp_blocks, mcux, mcuy, h, w, hmax, vmax) -> bytes:
    """All progressive scans: per-scan tokenize → optimized DHT → SOS →
    entropy data. ``comps_meta``: [(ch, cv, dc_enc_tables_unused)]."""
    out = bytearray()
    n = len(comps_meta)
    for kind, cidx, ss, se, ah, al in _progressive_scan_script(n):
        stream = _TokenStream()
        st = _ACScanState()
        if kind in ("dc_first", "dc_refine"):
            preds = [0] * n
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in cidx:
                        ch, cv = comps_meta[ci]
                        for v in range(cv):
                            for u in range(ch):
                                zz = comp_blocks[ci][my * cv + v, mx * ch + u]
                                if kind == "dc_first":
                                    preds[ci] = _tok_dc_first(stream, zz, preds[ci], al)
                                else:
                                    _tok_dc_refine(stream, zz, al)
        else:
            ci = cidx[0]
            ch, cv = comps_meta[ci]
            wb = -(-(w * ch) // (hmax * 8))
            hb = -(-(h * cv) // (vmax * 8))
            for by in range(hb):
                for bx in range(wb):
                    zz = comp_blocks[ci][by, bx]
                    if kind == "ac_first":
                        _tok_ac_first(stream, st, zz, ss, se, al)
                    else:
                        _tok_ac_refine(stream, st, zz, ss, se, ah, al)
            st.flush_eob(stream)

        # per-scan table (DC-first symbol set fits a DC-style table too)
        needs_table = kind in ("dc_first", "ac_first", "ac_refine")
        table = None
        if needs_table and stream.freqs:
            bits, vals = _build_huffman_table(stream.freqs)
            cls = 0 if kind == "dc_first" else 1
            payload = bytes([(cls << 4) | 0]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
            table = _build_codes(bits, vals)

        sos = bytes([len(cidx)])
        for ci in cidx:
            sos += bytes([ci + 1, 0x00])  # table ids 0/0 (rewritten per scan)
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        wtr = _BitWriter()
        stream.write(wtr, table)
        wtr.pad_to_byte()
        out += bytes(wtr.out)
    return bytes(out)
