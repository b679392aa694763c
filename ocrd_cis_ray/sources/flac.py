"""FLAC codec — pure numpy + stdlib, no external audio library.

Implements the FLAC bitstream per the public spec (RFC 9639 /
xiph.org format docs), the same ground the PNG (``media.py``) and
baseline-JPEG (``jpeg.py``) codecs cover for images: a REAL
compressed-audio path so multimodal audio ingestion is not an env
stub. The reference's media universe is loader-based
(ocrd_cis/ocropy/common.py pil loaders); this is the audio analog for
the engine's opaque-binary media columns.

Scope (the baseline that covers real-world FLAC encodes):

- decode: STREAMINFO parse, frames with fixed blocking, subframe types
  CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC (any order), both
  rice residual methods (4- and 5-bit parameters) with partitions and
  escape codes, wasted bits, all four channel layouts (independent,
  left/side, right/side, mid/side), 8/16/24-bit samples, header CRC-8
  and frame CRC-16 verified.
- encode: 16-bit mono/stereo, fixed 4096-sample blocks, best-of
  FIXED orders 0-2 (or quantized LPC via Levinson-Durbin with
  ``method='lpc'``), single-partition rice with escape fallback,
  independent or mid/side stereo, STREAMINFO MD5 of the decoded
  stream. Deterministic: same samples -> same bytes.

Bit IO is numpy-vectorized where it counts: the decoder reads off one
``unpackbits`` plane with unary runs resolved by ``searchsorted`` over
the precomputed one-bit positions (no per-bit Python loop), and the
encoder builds each frame's bit plane with vectorized offset cumsums.
"""

from __future__ import annotations

import hashlib

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (FLAC: CRC-8 poly 0x07 over the frame header, CRC-16 poly 0x8005
# over the whole frame; both init 0, no reflection)

_CRC8_TABLE = None
_CRC16_TABLE = None


def _crc_tables():
    global _CRC8_TABLE, _CRC16_TABLE
    if _CRC8_TABLE is None:
        t8 = np.zeros(256, np.uint8)
        for i in range(256):
            c = i
            for _ in range(8):
                c = ((c << 1) ^ 0x07 if c & 0x80 else c << 1) & 0xFF
            t8[i] = c
        t16 = np.zeros(256, np.uint16)
        for i in range(256):
            c = i << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x8005 if c & 0x8000 else c << 1) & 0xFFFF
            t16[i] = c
        _CRC8_TABLE, _CRC16_TABLE = t8, t16
    return _CRC8_TABLE, _CRC16_TABLE


def crc8(data: bytes) -> int:
    t8, _ = _crc_tables()
    c = 0
    for b in data:
        c = int(t8[c ^ b])
    return c


def crc16(data: bytes) -> int:
    _, t16 = _crc_tables()
    c = 0
    for b in data:
        c = (int(t16[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)) & 0xFFFF
    return c


# ---------------------------------------------------------------------------
# bit IO


class _BitReader:
    """Bit reader over an unpacked bit plane. ``read`` folds a slice;
    unary runs resolve via searchsorted on the one-bit index (O(log n)
    per run, no per-bit scan)."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        self.pos = p + n
        if self.pos > len(self.bits):
            raise EOFError("flac: bitstream truncated")
        v = 0
        for b in self.bits[p : p + n]:
            v = (v << 1) | int(b)
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count zeros up to the next 1 bit, consuming it."""
        i = int(np.searchsorted(self.ones, self.pos))
        if i >= len(self.ones):
            raise EOFError("flac: unary run past end of stream")
        one_at = int(self.ones[i])
        q = one_at - self.pos
        self.pos = one_at + 1
        return q

    def read_rice_block(self, param: int, count: int) -> np.ndarray:
        """``count`` rice(param) residuals. param == 0: the unary
        terminators are exactly consecutive entries of the ones index —
        fully vectorized. param > 0: low-bit fields may contain one-bits,
        so terminator discovery is a sequential walk — but O(1) per
        residual via the cumulative-ones prefix (no per-bit loop, no
        searchsorted per run), and the low bits fold afterwards in ONE
        (count × param) vectorized gather."""
        if count == 0:
            return np.zeros(0, np.int64)
        i0 = int(np.searchsorted(self.ones, self.pos))
        if i0 + count > len(self.ones):
            raise EOFError("flac: rice block past end of stream")
        if param == 0:
            ones = self.ones[i0 : i0 + count].astype(np.int64)
            starts = np.empty(count, np.int64)
            starts[0] = self.pos
            starts[1:] = ones[:-1] + 1
            q = ones - starts
            self.pos = int(ones[-1]) + 1
            u = q
        else:
            ones_all = self.ones
            cum = self._cum_ones()
            n_ones = len(ones_all)
            term = np.empty(count, np.int64)  # terminator bit positions
            q = np.empty(count, np.int64)
            pos = self.pos
            j = i0
            for k in range(count):
                if j >= n_ones:
                    raise EOFError("flac: rice run past end of stream")
                one_at = int(ones_all[j])
                term[k] = one_at
                q[k] = one_at - pos
                pos = one_at + 1 + param
                # ones consumed by the low-bit field, from the prefix sum
                j = j + 1 + int(cum[min(pos, len(cum) - 1)] - cum[one_at + 1])
            if pos > len(self.bits):
                raise EOFError("flac: rice low bits past end of stream")
            self.pos = pos
            # one vectorized gather folds every low-bit field at once
            idx = term[:, None] + 1 + np.arange(param, dtype=np.int64)[None, :]
            lows = self.bits[idx].astype(np.int64)
            weights = (1 << np.arange(param - 1, -1, -1, dtype=np.int64))
            u = (q << param) | (lows @ weights)
        return (u >> 1) ^ -(u & 1)  # unfold zigzag

    def _cum_ones(self) -> np.ndarray:
        """cum[i] = number of one-bits strictly before bit i (cached)."""
        c = getattr(self, "_cum", None)
        if c is None:
            c = np.zeros(len(self.bits) + 1, np.int64)
            np.cumsum(self.bits, out=c[1:])
            self._cum = c
        return c

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self) -> None:
        self.chunks: list[np.ndarray] = []
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        a = np.empty(n, np.uint8)
        for i in range(n - 1, -1, -1):
            a[i] = value & 1
            value >>= 1
        self.chunks.append(a)
        self.nbits += n

    def write_bits(self, arr: np.ndarray) -> None:
        self.chunks.append(arr.astype(np.uint8, copy=False))
        self.nbits += len(arr)

    def getvalue(self) -> bytes:
        bits = np.concatenate(self.chunks) if self.chunks else np.zeros(0, np.uint8)
        return np.packbits(bits).tobytes()  # packbits zero-pads the tail


def _utf8_number(v: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if v < 0x80:
        return bytes([v])
    out = []
    # byte count: payload bits = (6-n) head bits + 6 per continuation
    n = 1
    while v >> (6 * n) >= (1 << max(0, 6 - n)):
        n += 1
    head = (0xFF << (7 - n)) & 0xFF | (v >> (6 * n))
    out.append(head & 0xFF)
    for i in range(n - 1, -1, -1):
        out.append(0x80 | ((v >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("flac: bad utf8-coded number")
        v = (v << 6) | (c & 0x3F)
    return v


# ---------------------------------------------------------------------------
# encode

_BLOCK = 4096
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_cost(u: np.ndarray, param: int) -> int:
    return int((u >> param).sum()) + len(u) * (1 + param)


def _write_rice_partition(bw: _BitWriter, res: np.ndarray, plen: int) -> None:
    """One partition: best rice param (plen-bit field) or escape."""
    u = (res.astype(np.int64) << 1) ^ (res.astype(np.int64) >> 63)  # zigzag fold
    pmax = (1 << plen) - 2  # top value is the escape code
    best_p, best_c = 0, _rice_cost(u, 0)
    for p in range(1, pmax + 1):
        c = _rice_cost(u, p)
        if c < best_c:
            best_p, best_c = p, c
    raw_bits = max(1, int(np.abs(res).max()).bit_length() + 1) if len(res) else 1
    if best_c > raw_bits * len(res):
        bw.write((1 << plen) - 1, plen)  # escape
        bw.write(raw_bits, 5)
        for v in res.tolist():
            bw.write(int(v) & ((1 << raw_bits) - 1), raw_bits)
        return
    bw.write(best_p, plen)
    q = (u >> best_p).astype(np.int64)
    total = int(q.sum()) + len(u) * (1 + best_p)
    bits = np.zeros(total, np.uint8)
    starts = np.concatenate(([0], np.cumsum(q + 1 + best_p)[:-1]))
    bits[starts + q] = 1  # unary terminators
    for j in range(best_p):
        bits[starts + q + 1 + j] = (u >> (best_p - 1 - j)) & 1
    bw.write_bits(bits)


def _write_residuals(
    bw: _BitWriter,
    res: np.ndarray,
    *,
    order: int = 0,
    block_size: int | None = None,
    partition_order: int = 0,
    rice_method: int = 0,
) -> None:
    """Partitioned rice residuals (method 0 = 4-bit params, 1 = 5-bit).

    ``partition_order`` > 0 requires the block size divisible by
    2^order with the first partition non-empty (the FLAC validity
    rule); callers keep the default 0 except to exercise the
    multi-partition decode path."""
    bs = block_size if block_size is not None else len(res) + order
    if partition_order and (bs % (1 << partition_order) or (bs >> partition_order) <= order):
        partition_order = 0
    plen = 4 + rice_method
    bw.write(rice_method, 2)
    bw.write(partition_order, 4)
    off = 0
    for p in range(1 << partition_order):
        cnt = (bs >> partition_order) - (order if p == 0 else 0)
        _write_rice_partition(bw, res[off : off + cnt], plen)
        off += cnt


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int, method: str,
                    *, partition_order: int = 0, rice_method: int = 0) -> None:
    x = x.astype(np.int64)
    if len(x) and (x == x[0]).all():
        bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)  # CONSTANT
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    if method == "lpc" and len(x) > 16:
        order = 4
        acf = np.array(
            [np.dot(x[: len(x) - k].astype(np.float64), x[k:].astype(np.float64)) for k in range(order + 1)]
        )
        if acf[0] > 0:
            # Levinson-Durbin
            err = acf[0]
            a = np.zeros(order)
            ok = True
            for i in range(order):
                acc = acf[i + 1] - np.dot(a[:i], acf[i:0:-1][:i])
                k = acc / err if err > 1e-9 else 0.0
                a[:i], a[i] = a[:i] - k * a[i - 1 :: -1][:i], k
                err *= 1 - k * k
                if err <= 0:
                    ok = False
                    break
            if ok and np.isfinite(a).all() and np.abs(a).max() > 0:
                precision = 12
                shift = min(15, max(0, precision - 1 - int(np.ceil(np.log2(np.abs(a).max() + 1e-12)))))
                qc = np.clip(np.round(a * (1 << shift)), -(1 << (precision - 1)), (1 << (precision - 1)) - 1).astype(np.int64)
                if np.any(qc):
                    # residual with integer semantics (matches decoder)
                    hist = np.lib.stride_tricks.sliding_window_view(x[:-1], order)[..., ::-1]
                    pred = (hist @ qc) >> shift
                    res = x[order:] - pred
                    bw.write(0, 1); bw.write(0x20 | (order - 1), 6); bw.write(0, 1)
                    for w in x[:order].tolist():
                        bw.write(int(w) & ((1 << bps) - 1), bps)
                    bw.write(precision - 1, 4)
                    bw.write(shift, 5)
                    for c in qc.tolist():
                        bw.write(int(c) & ((1 << precision) - 1), precision)
                    _write_residuals(bw, res, order=order, block_size=len(x),
                                     partition_order=partition_order, rice_method=rice_method)
                    return
        # fall through to fixed if LPC degenerate
    best_o, best_s = 0, np.abs(_fixed_residual(x, 0)).sum()
    for o in (1, 2):
        if len(x) > o:
            s = np.abs(_fixed_residual(x, o)).sum()
            if s < best_s:
                best_o, best_s = o, s
    o = best_o
    bw.write(0, 1); bw.write(0x08 | o, 6); bw.write(0, 1)  # FIXED
    for w in x[:o].tolist():
        bw.write(int(w) & ((1 << bps) - 1), bps)
    _write_residuals(bw, _fixed_residual(x, o), order=o, block_size=len(x),
                     partition_order=partition_order, rice_method=rice_method)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    *,
    method: str = "fixed",
    stereo_mode: str = "independent",
    block_size: int = _BLOCK,
    partition_order: int = 0,
    rice_method: int = 0,
) -> bytes:
    """Encode int16 PCM (shape (n,) mono or (n, 2) stereo) to FLAC.

    ``method``: 'fixed' (best-of FIXED orders 0-2) or 'lpc' (order-4
    quantized Levinson-Durbin). ``stereo_mode``: 'independent' or
    'mid-side'. Deterministic byte output.
    """
    x = np.asarray(samples)
    if x.dtype != np.int16:
        raise ValueError("encode_flac takes int16 samples")
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if ch not in (1, 2):
        raise ValueError("mono or stereo only")
    bps = 16

    # STREAMINFO md5 is over the interleaved little-endian stream
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()

    frames = []
    for f, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size].astype(np.int64)
        bs = len(blk)
        bw = _BitWriter()
        if ch == 2 and stereo_mode == "mid-side":
            chan_code = 10
        else:
            chan_code = ch - 1
        header = bytearray([0xFF, 0xF8])
        bs_code = 0b0110 if bs <= 256 else 0b0111
        header.append((bs_code << 4) | 0)  # sample rate code 0: streaminfo
        header.append((chan_code << 4) | (0b100 << 1))  # 16-bit, reserved 0
        header += _utf8_number(f)
        if bs_code == 0b0110:
            header.append(bs - 1)
        else:
            header += int(bs - 1).to_bytes(2, "big")
        header.append(crc8(bytes(header)))
        for b in header:
            bw.write(b, 8)
        if ch == 2 and stereo_mode == "mid-side":
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            _write_subframe(bw, mid, bps, method, partition_order=partition_order, rice_method=rice_method)
            _write_subframe(bw, side, bps + 1, method, partition_order=partition_order, rice_method=rice_method)
        else:
            for c in range(ch):
                _write_subframe(bw, blk[:, c], bps, method, partition_order=partition_order, rice_method=rice_method)
        # byte-align then CRC-16 of the whole frame
        pad = (-bw.nbits) % 8
        if pad:
            bw.write(0, pad)
        body = bw.getvalue()
        frames.append(body + crc16(body).to_bytes(2, "big"))

    si = bytearray()
    si += int(block_size).to_bytes(2, "big")
    si += int(block_size).to_bytes(2, "big")
    si += (0).to_bytes(3, "big")  # min frame size unknown
    si += (0).to_bytes(3, "big")
    # 64 bits: rate(20) | channels-1(3) | bps-1(5) | total samples(36)
    packed64 = (sample_rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | (n & ((1 << 36) - 1))
    si += packed64.to_bytes(8, "big")
    si += md5
    header_block = bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)  # last-metadata, type 0
    return b"fLaC" + header_block + b"".join(frames)


# ---------------------------------------------------------------------------
# decode

_BLOCKSIZE_TABLE = {1: 192, **{i: 576 << (i - 2) for i in range(2, 6)}, **{i: 256 << (i - 8) for i in range(8, 16)}}
_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050, 7: 24000,
               8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _read_residuals(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    plen = 4 + method  # 4-bit or 5-bit rice params
    part_order = br.read(4)
    parts = 1 << part_order
    out = []
    for p in range(parts):
        cnt = (block_size >> part_order) - (order if p == 0 else 0)
        param = br.read(plen)
        if param == (1 << plen) - 1:  # escape: raw n-bit residuals
            nbits = br.read(5)
            vals = np.array([br.read_signed(nbits) if nbits else 0 for _ in range(cnt)], np.int64)
            out.append(vals)
        else:
            out.append(br.read_rice_block(param, cnt))
    return np.concatenate(out) if out else np.zeros(0, np.int64)


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe pad bit set")
    typ = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if typ == 0:  # CONSTANT
        out = np.full(block_size, br.read_signed(bps), np.int64)
    elif typ == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(block_size)], np.int64)
    elif 8 <= typ <= 12:  # FIXED
        order = typ - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residuals(br, block_size, order)
        out = np.empty(block_size, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            out[i] = res[i - order] + sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
    elif typ >= 32:  # LPC
        order = (typ & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = br.read_signed(5)
        coefs = np.array([br.read_signed(precision) for _ in range(order)], np.int64)
        res = _read_residuals(br, block_size, order)
        out = np.empty(block_size, np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            pred = int(np.dot(coefs, out[i - order : i][::-1])) >> shift
            out[i] = res[i - order] + pred
    else:
        raise ValueError(f"flac: reserved subframe type {typ}")
    return out << wasted if wasted else out


def _parse_metadata(payload: bytes) -> tuple[int, bytes]:
    """Walk the metadata blocks; return (first frame byte offset,
    STREAMINFO payload). Clean EOFError on truncation."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a flac stream")
    pos = 4
    si = None
    while True:
        if pos + 4 > len(payload):
            raise EOFError("flac: truncated metadata block header")
        hdr = payload[pos]
        typ, last = hdr & 0x7F, hdr & 0x80
        ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if pos + 4 + ln > len(payload):
            raise EOFError("flac: truncated metadata block body")
        if typ == 0:
            si = payload[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if last:
            break
    if si is None or len(si) < 34:
        raise ValueError("flac: missing STREAMINFO")
    return pos, si


def flac_streaminfo(payload: bytes) -> dict:
    """STREAMINFO facts without decoding frames: sample_rate, channels,
    bits_per_sample, total_samples, md5 (hex)."""
    _, si = _parse_metadata(payload)
    packed64 = int.from_bytes(si[10:18], "big")
    return {
        "sample_rate": packed64 >> 44,
        "channels": ((packed64 >> 41) & 0x7) + 1,
        "bits_per_sample": ((packed64 >> 36) & 0x1F) + 1,
        "total_samples": packed64 & ((1 << 36) - 1),
        "md5": si[18:34].hex(),
    }


def decode_flac(payload: bytes, *, verify_md5: bool = False) -> tuple[np.ndarray, int]:
    """Decode FLAC to (samples int32 (n,) or (n, ch), sample_rate).

    Verifies header CRC-8 and frame CRC-16; ``verify_md5=True``
    additionally checks the STREAMINFO MD5 (16-bit streams).
    ``flac_streaminfo`` exposes bits_per_sample for normalization."""
    pos, si = _parse_metadata(payload)
    packed64 = int.from_bytes(si[10:18], "big")
    st_rate = packed64 >> 44
    st_bps = ((packed64 >> 36) & 0x1F) + 1
    total = packed64 & ((1 << 36) - 1)
    md5_expect = si[18:34]

    br = _BitReader(payload[pos:])
    chans: list[list[np.ndarray]] = []
    nbits_total = len(br.bits)
    while br.pos + 16 <= nbits_total:
        frame_start_byte = br.pos >> 3
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        chan_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0b0110:
            block_size = br.read(8) + 1
        elif bs_code == 0b0111:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCKSIZE_TABLE.get(bs_code) or _err("flac: bad blocksize code")
        if rate_code == 0b1100:
            br.read(8)
        elif rate_code in (0b1101, 0b1110):
            br.read(16)
        elif rate_code == 0b1111:
            raise ValueError("flac: invalid sample rate code")
        bps = _BPS_TABLE.get(bps_code, st_bps) if bps_code else st_bps
        hdr_end_byte = br.pos >> 3
        expect8 = br.read(8)
        got8 = crc8(payload[pos + frame_start_byte : pos + hdr_end_byte])
        if expect8 != got8:
            raise ValueError("flac: frame header CRC-8 mismatch")

        if chan_code <= 7:
            sub = [_decode_subframe(br, block_size, bps) for _ in range(chan_code + 1)]
        elif chan_code == 8:  # left/side
            left = _decode_subframe(br, block_size, bps)
            side = _decode_subframe(br, block_size, bps + 1)
            sub = [left, left - side]
        elif chan_code == 9:  # right/side
            side = _decode_subframe(br, block_size, bps + 1)
            right = _decode_subframe(br, block_size, bps)
            sub = [right + side, right]
        elif chan_code == 10:  # mid/side
            mid = _decode_subframe(br, block_size, bps)
            side = _decode_subframe(br, block_size, bps + 1)
            m2 = (mid << 1) | (side & 1)
            sub = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("flac: reserved channel assignment")
        br.align_byte()
        frame_end_byte = br.pos >> 3
        expect16 = br.read(16)
        got16 = crc16(payload[pos + frame_start_byte : pos + frame_end_byte])
        if expect16 != got16:
            raise ValueError("flac: frame CRC-16 mismatch")
        chans.append(sub)
        # stop once we've decoded the declared sample count
        if total and sum(len(f[0]) for f in chans) >= total:
            break

    if not chans:
        return np.zeros((0,), np.int32), st_rate
    n_ch = len(chans[0])
    cols = [np.concatenate([f[c] for f in chans]) for c in range(n_ch)]
    if total:
        cols = [c[:total] for c in cols]
    out = cols[0][:, None] if n_ch == 1 else np.stack(cols, axis=1)
    out = out.astype(np.int32)
    if verify_md5 and st_bps == 16:
        got = hashlib.md5(out.astype("<i2").tobytes()).digest()
        if got != md5_expect and md5_expect != b"\x00" * 16:
            raise ValueError("flac: stream MD5 mismatch")
    if n_ch == 1:
        out = out[:, 0]
    return out, st_rate


def _err(msg: str):
    raise ValueError(msg)
