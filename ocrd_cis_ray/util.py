"""Scalar helpers shared by stages: edit distance, tokenization, hashing.

Reimplements (from public-algorithm knowledge, NOT copied) the scalar
function surface of the reference (SURVEY.md §2.8):

- Levenshtein distance       (reference uses the C `Levenshtein` lib at
  ocrd_cis/align/cli.py:214, ocrd_cis/div/stats.py:84)
- pure edit alignment with op extraction (reference: ocrolib/edist.py:21-83)
- token cleaning             (reference: ocrd_cis/aio/aio.py:454-460)
- NFKC normalization         (reference: ocrolib/lstm.py:837-838)

All hashing here is seed-stable across processes (no Python ``hash()``,
which is salted per interpreter) so synthesized corpora and shuffles are
deterministic cluster-wide.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# stable hashing


def stable_hash64(s: str) -> int:
    """Deterministic 64-bit hash of a string (process- and node-stable)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def stable_hash32(s: str) -> int:
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def content_hash(s: str) -> str:
    """Hex content hash used for exact dedup keys."""
    return hashlib.blake2b(s.encode("utf-8"), digest_size=16).hexdigest()


# ---------------------------------------------------------------------------
# edit distance


def levenshtein(a: str, b: str) -> int:
    """Levenshtein distance via Myers' bit-parallel algorithm (Myers
    1999 / Hyyrö 2001) on Python big-int bitvectors — O(len(b)) word
    ops for patterns of any length (Python ints are arbitrary-width).

    Matches the semantics of the C `Levenshtein.distance` the reference
    calls (align/cli.py:214, recognize.py:234, div/stats.py:84).
    ~10x faster than a numpy row DP for ~100-char strings (the CER hot
    kernel).
    """
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if not la:
        return lb
    if not lb:
        return la
    if la > lb:  # pattern = shorter string (fewer bits)
        a, b, la, lb = b, a, lb, la
    peq: dict[str, int] = {}
    bit = 1
    for ch in a:
        peq[ch] = peq.get(ch, 0) | bit
        bit <<= 1
    mask = (1 << la) - 1
    high = 1 << (la - 1)
    pv = mask
    mv = 0
    score = la
    get = peq.get
    for ch in b:
        eq = get(ch, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & high:
            score += 1
        elif mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
    return score


def lev_within(a: str, b: str, limit: int) -> bool:
    """True iff Levenshtein(a, b) <= limit — banded DP, O(limit·min(m,n)).

    The aligner only needs the bounded predicate (align/cli.py:211-217
    tests d<=1 / d<=3), so the full DP matrix is never built.
    """
    la, lb = len(a), len(b)
    if abs(la - lb) > limit:
        return False
    if a == b:
        return True
    if limit <= 0:
        return False
    if la == 0 or lb == 0:
        return max(la, lb) <= limit
    # classic banded two-row DP over the shorter string
    if la > lb:
        a, b, la, lb = b, a, lb, la
    INF = limit + 1
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cb = b[j - 1]
        lo = max(1, j - limit)
        hi = min(la, j + limit)
        cur = [INF] * (la + 1)
        if lo == 1:
            cur[0] = j if j <= limit else INF
        best = cur[0]
        for i in range(lo, hi + 1):
            c = min(
                prev[i] + 1,
                cur[i - 1] + 1,
                prev[i - 1] + (0 if a[i - 1] == cb else 1),
            )
            cur[i] = c
            if c < best:
                best = c
        if best > limit:
            return False
        prev = cur
    return prev[la] <= limit


def edit_ops(a: list[str] | str, b: list[str] | str):
    """Full DP alignment between two sequences; returns (distance, pairs).

    ``pairs`` is a list of (ai, bi) index tuples where ai/bi is None for
    insert/delete. Semantics of the reference's xlevenshtein alignment
    (ocrolib/edist.py:21-83) generalized to token sequences — used by the
    n-way aligner to line up OCR variants.
    """
    n, m = len(a), len(b)
    dp = np.zeros((n + 1, m + 1), dtype=np.int32)
    dp[:, 0] = np.arange(n + 1)
    dp[0, :] = np.arange(m + 1)
    if n and m:
        # vectorized row fill: the sequential row[j-1]+1 dependency is
        # resolved with the cummin identity row[j]-j = min_{k<=j}(t[k]-k)
        if isinstance(a, str) and isinstance(b, str):
            bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
            aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
            neq = aa[:, None] != bb[None, :]
        else:
            neq = np.array([[x != y for y in b] for x in a], dtype=bool)
        js = np.arange(1, m + 1, dtype=np.int32)
        for i in range(1, n + 1):
            prev = dp[i - 1]
            t = np.minimum(prev[1:] + 1, prev[:-1] + neq[i - 1])
            t = np.minimum(t, js + i)  # k=0 path: row[0]=i, cost i+j
            dp[i, 1:] = np.minimum.accumulate(t - js) + js
    # backtrace
    pairs: list[tuple[int | None, int | None]] = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] + (0 if a[i - 1] == b[j - 1] else 1):
            pairs.append((i - 1, j - 1))
            i, j = i - 1, j - 1
        elif i > 0 and dp[i, j] == dp[i - 1, j] + 1:
            pairs.append((i - 1, None))
            i -= 1
        else:
            pairs.append((None, j - 1))
            j -= 1
    pairs.reverse()
    return int(dp[n, m]), pairs


# ---------------------------------------------------------------------------
# text normalization / tokenization

_PUNCT_DIGIT_RE = re.compile(r"[^\w\s]|\d", re.UNICODE)
_WS_RE = re.compile(r"\s+")


def nfkc(s: str) -> str:
    """NFKC normalization (reference: ocrolib/lstm.py:837-838)."""
    return unicodedata.normalize("NFKC", s)


def clean_token(tok: str) -> str:
    """Strip punctuation/digits and lowercase — the reference's `tokenize`
    cleaning (aio/aio.py:454-460)."""
    return _PUNCT_DIGIT_RE.sub("", tok).lower()


def split_words(line: str) -> list[str]:
    """Line -> word split on single spaces (reference: recognize.py:237
    splits recognized line text on spaces to produce Word elements)."""
    return line.split(" ") if line else []
