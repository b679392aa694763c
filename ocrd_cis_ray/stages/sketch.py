"""Mergeable sketches: HyperLogLog approximate distinct count.

The reference has no sketches (SURVEY.md §2.5), but a 10^12-document
engine needs approximate distinct counts where exact ``COUNT(DISTINCT)``
would shuffle every value. Pattern per the Ray guide: one serialized
sketch per batch (map_batches partial), merged in a tiny final stage —
sketches are designed to be mergeable, so the shuffle payload is
#batches × 4 KiB regardless of corpus size.

HyperLogLog (Flajolet et al. 2007) with p=12 (4096 uint8 registers,
~1.6% standard error), linear-counting small-range correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

P = 12
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _hash_column(col: pa.Array) -> np.ndarray:
    """Stable 64-bit hashes of an arrow column (strings or ints)."""
    import pandas as pd

    vals = col.to_pandas()
    if vals.dtype.kind in ("i", "u"):
        # splitmix64-style scramble of integer keys (vectorized)
        h = vals.to_numpy().astype(np.uint64).copy()
        with np.errstate(over="ignore"):
            h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h = h ^ (h >> np.uint64(31))
        return h
    return pd.util.hash_array(vals.to_numpy().astype(object))


def hll_partial_batch(batch: pa.Table, *, column: str) -> pa.Table:
    """One row per batch: the batch's serialized HLL register array."""
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    regs = np.zeros(M, dtype=np.uint8)
    if len(col):
        h = _hash_column(col)
        idx = (h >> np.uint64(64 - P)).astype(np.int64)
        rest = (h << np.uint64(P)) | np.uint64(1 << (P - 1))  # sentinel bit
        # rank = #leading zeros of rest + 1, vectorized via log2
        # (rest != 0 guaranteed by the sentinel)
        lz = np.uint64(63) - np.floor(np.log2(rest.astype(np.float64))).astype(np.uint64)
        rank = (lz + np.uint64(1)).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
    return pa.table({"hll": pa.array([regs.tobytes()], pa.binary())})


def hll_merge(partials: list[bytes]) -> np.ndarray:
    regs = np.zeros(M, dtype=np.uint8)
    for buf in partials:
        regs = np.maximum(regs, np.frombuffer(buf, dtype=np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * M * M / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)  # linear counting for small cardinalities
    return float(est)


def approx_distinct(ds, column: str) -> float:
    """Approximate COUNT(DISTINCT column): partial sketch per batch →
    merge on the driver (#batches tiny rows)."""
    from functools import partial

    partials = ds.map_batches(
        partial(hll_partial_batch, column=column), batch_format="pyarrow"
    ).take_all()
    regs = hll_merge([r["hll"] for r in partials])
    return hll_estimate(regs)


# ---------------------------------------------------------------------------
# Bloom filter membership sketch (Bloom 1970; the standard incremental
# cross-corpus dedup primitive: build once over the reference corpus,
# probe each new shard — e.g. Dolma's bloom-based dedupe). Mergeable:
# per-block partial filters OR together, so the build is one streamed
# pass with a fixed-size reduce (m/8 bytes per block).


def _bloom_positions(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """k probe positions per key via double hashing (Kirsch-Mitzenmacher):
    pos_i = (h1 + i*h2) mod m. Returns (len(h), k) int64."""
    h1 = h % np.uint64(m)
    h2 = (h >> np.uint64(17) | np.uint64(1)) % np.uint64(m)  # odd-ish stride
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


def bloom_partial_batch(batch: pa.Table, *, column: str, m: int, k: int) -> pa.Table:
    """One block -> one packed-bitset row (m/8 bytes)."""
    h = _hash_column(batch[column])
    bits = np.zeros(m, dtype=bool)
    if len(h):
        bits[_bloom_positions(h, m, k).ravel()] = True
    return pa.table({"bits": pa.array([np.packbits(bits).tobytes()], pa.large_binary())})


def bloom_build(ds, column: str, *, m: int = 1 << 20, k: int = 7) -> np.ndarray:
    """Streamed build: per-block partial filters OR-reduced driver-side
    (block count x m/8 bytes through the tiny reduce, never the keys)."""
    parts = ds.map_batches(
        bloom_partial_batch,
        batch_format="pyarrow",
        fn_kwargs={"column": column, "m": m, "k": k},
        batch_size=None,
    ).to_pandas()
    acc = np.zeros(m // 8, dtype=np.uint8)
    for b in parts["bits"]:
        acc |= np.frombuffer(b, dtype=np.uint8)
    return np.unpackbits(acc).astype(bool)


def bloom_probe(ds, bits, column: str, *, k: int = 7):
    """Probe a dataset against a built (or ray.put) filter ->
    (original columns..., maybe_member:int32). No false negatives;
    false-positive rate ~ (1 - e^{-kn/m})^k."""
    import ray

    bits_ref = bits if isinstance(bits, ray.ObjectRef) else ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        bb = ray.get(bits_ref)
        m = len(bb)
        h = _hash_column(batch[column])
        if len(h):
            pos = _bloom_positions(h, m, 7 if k is None else k)
            member = bb[pos].all(axis=1)
        else:
            member = np.zeros(0, bool)
        return batch.append_column(
            "maybe_member", pa.array(member.astype(np.int32), pa.int32())
        )

    return ds.map_batches(probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin, Lang & Liberty 2016) — the mergeable
# quantile path. grouped_percentiles/grouped_ntile are EXACT but their
# driver CDF collect is LIMIT-bounded (they raise past ~5M distinct
# (group, score) pairs by design); the KLL sketch is the documented
# scale path beyond that ceiling: fixed O(k log(n/k)) memory per group
# regardless of score cardinality, mergeable (map-side partials → one
# tiny exchange), rank error ~O(1/k)·n. Approximate by construction →
# rows-only query + pytest error bounds (no bit-stable oracle; the
# compaction offset sequence depends on merge order, so two block
# layouts may differ inside the error bound).


class KLLSketch:
    """Fixed-memory quantile sketch over float64 values.

    ``compactors[h]`` holds items each representing ``2^h`` originals;
    a full level sorts, keeps alternating items (deterministic
    alternating offset per level), and promotes them — halving storage
    while preserving ranks to within the KLL bound. Level capacities
    decay geometrically (2/3 per level below the top, floor 2).
    """

    __slots__ = ("k", "compactors", "n", "_offset")

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.compactors: list[np.ndarray] = [np.zeros(0, np.float64)]
        self.n = 0
        self._offset = 0  # alternating compaction offset

    def _capacity(self, h: int) -> int:
        depth = len(self.compactors) - 1 - h
        return max(2, int(np.ceil(self.k * (2.0 / 3.0) ** depth)))

    def update_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.compactors[0] = np.concatenate([self.compactors[0], v])
        self.n += len(v)
        self._compress()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.zeros(0, np.float64))
        for h, c in enumerate(other.compactors):
            if len(c):
                self.compactors[h] = np.concatenate([self.compactors[h], c])
        self.n += other.n
        self._compress()
        return self

    def _compress(self) -> None:
        h = 0
        while h < len(self.compactors):
            if len(self.compactors[h]) > self._capacity(h):
                if h + 1 == len(self.compactors):
                    self.compactors.append(np.zeros(0, np.float64))
                buf = np.sort(self.compactors[h])
                promoted = buf[self._offset :: 2]
                self._offset = 1 - self._offset
                self.compactors[h + 1] = np.concatenate([self.compactors[h + 1], promoted])
                self.compactors[h] = np.zeros(0, np.float64)
            h += 1

    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, c in enumerate(self.compactors):
            if len(c):
                items.append(c)
                weights.append(np.full(len(c), 1 << h, np.int64))
        if not items:
            return np.zeros(0, np.float64), np.zeros(0, np.int64)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="mergesort")
        return it[order], w[order]

    def quantile(self, q: float) -> float:
        """Lower-quantile value at rank ceil(q·n) (the discrete
        semantics grouped_percentiles uses)."""
        it, w = self._items_weights()
        if len(it) == 0:
            return float("nan")
        target = max(1, int(np.ceil(float(q) * self.n)))
        cw = np.cumsum(w)
        return float(it[min(int(np.searchsorted(cw, target)), len(it) - 1)])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]


def grouped_quantile_sketch(
    ds,
    *,
    group: str = "lang",
    score_col: str = "score",
    ps=(0.5, 0.9, 0.99),
    k: int = 200,
    num_buckets: int | None = None,
):
    """Per-group approximate percentiles via mergeable KLL partials —
    the unbounded-cardinality sibling of ``sampling.grouped_percentiles``
    (exact, but LIMIT-bounded): each batch contributes ONE pickled
    sketch row per group it contains, a bucketed groupby merges the
    partials per group, and the quantiles read off the merged sketch.
    Exchange payload: O(batches × groups × k), independent of row count
    and score cardinality. Returns a pandas frame (group, p50, ...)."""
    import pickle

    import pandas as pd

    from ..shuffle import bucketed_groupby

    ps = [float(p) for p in ps]
    names = [f"p{int(round(p * 100)):02d}" for p in ps]
    if len(set(names)) != len(names):
        raise ValueError(f"percentiles {ps} collide to one column name")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"__g": [], "__sk": []}
        for g, sub in df.groupby(group, sort=False):
            sk = KLLSketch(k)
            sk.update_many(sub[score_col].to_numpy(np.float64))
            rows["__g"].append(g)
            rows["__sk"].append(pickle.dumps(sk))
        return pd.DataFrame(rows)

    def merge_group(gdf: pd.DataFrame) -> pd.DataFrame:
        import functools

        sk = functools.reduce(
            lambda a, b: a.merge(b), (pickle.loads(b) for b in gdf["__sk"])
        )
        vals = sk.quantiles(ps)
        return pd.DataFrame(
            {group: [gdf["__g"].iloc[0]], "n": [sk.n], **{nm: [v] for nm, v in zip(names, vals)}}
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    out = bucketed_groupby(partials, "__g", merge_group, num_buckets=num_buckets).to_pandas()
    return out.sort_values(group, kind="mergesort").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Count-Min sketch + heavy hitters (Cormode & Muthukrishnan 2005) — the
# frequency sibling of HLL (distinct) / Bloom (membership) / KLL
# (quantiles): point-frequency estimates and top-k heavy hitters over
# key universes too large even for map-side-combined exact partials
# (every URL / token / host at web scale). One-sided error: estimates
# never undercount, overcount ≤ εN with prob 1-δ at w=⌈e/ε⌉, d=⌈ln 1/δ⌉.


class CountMinSketch:
    __slots__ = ("w", "d", "table", "n")

    def __init__(self, w: int = 2048, d: int = 4):
        self.w = int(w)
        self.d = int(d)
        self.table = np.zeros((self.d, self.w), np.int64)
        self.n = 0

    def _rows(self, hashes: np.ndarray) -> np.ndarray:
        """(d, n) row positions from one 64-bit hash per key (seeded
        re-scrambles per depth — independent enough for CM bounds)."""
        out = np.empty((self.d, len(hashes)), np.int64)
        h = hashes.astype(np.uint64)
        for r in range(self.d):
            with np.errstate(over="ignore"):
                salt = np.uint64((0x9E3779B97F4A7C15 * (r + 1)) & 0xFFFFFFFFFFFFFFFF)
                hr = (h ^ salt) * np.uint64(0xBF58476D1CE4E5B9)
                hr ^= hr >> np.uint64(29)
            out[r] = (hr % np.uint64(self.w)).astype(np.int64)
        return out

    def update_hashed(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(hashes) == 0:
            return
        c = np.ones(len(hashes), np.int64) if counts is None else np.asarray(counts, np.int64)
        rows = self._rows(hashes)
        for r in range(self.d):
            np.add.at(self.table[r], rows[r], c)
        self.n += int(c.sum())

    def estimate_hashed(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, np.int64)
        rows = self._rows(hashes)
        est = self.table[0][rows[0]]
        for r in range(1, self.d):
            est = np.minimum(est, self.table[r][rows[r]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.w, self.d) != (other.w, other.d):
            raise ValueError("count-min merge requires identical dimensions")
        self.table += other.table
        self.n += other.n
        return self


def heavy_hitters(
    ds,
    column: str,
    *,
    k: int = 10,
    w: int = 4096,
    d: int = 4,
    candidates_per_batch: int | None = None,
    num_buckets: int | None = None,
):
    """Approximate top-k most frequent values: each batch contributes a
    pickled CM partial plus its LOCAL top candidates (value, exact local
    count); the merge stage sums sketches, unions candidates, and
    re-estimates each candidate on the MERGED sketch — so the exchange
    carries O(batches × (w·d + candidates)) regardless of key
    cardinality. A key can only be missed if it is top-k globally yet
    never near the top of any batch (the standard local-candidate
    caveat; raise ``candidates_per_batch`` to tighten). Estimates never
    undercount (CM is one-sided). Returns pandas (value, est_count)
    sorted desc, ties by value."""
    import pickle

    import pandas as pd

    cpb = candidates_per_batch or max(4 * k, 32)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[column].astype(str)
        counts = vals.value_counts()
        cms = CountMinSketch(w, d)
        cms.update_hashed(
            pd.util.hash_array(counts.index.to_numpy(object)),
            counts.to_numpy(np.int64),
        )
        top = counts.head(cpb)
        return pd.DataFrame(
            {
                "__part": [0],
                "__cms": [pickle.dumps(cms)],
                "__cand": [pickle.dumps(list(top.index))],
            }
        )

    def reduce_all(gdf: pd.DataFrame) -> pd.DataFrame:
        import functools

        cms = functools.reduce(
            lambda a, b: a.merge(b), (pickle.loads(b) for b in gdf["__cms"])
        )
        cands = sorted({c for b in gdf["__cand"] for c in pickle.loads(b)})
        est = cms.estimate_hashed(pd.util.hash_array(np.array(cands, object)))
        out = pd.DataFrame({"value": cands, "est_count": est})
        return (
            out.sort_values(["est_count", "value"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )

    from ..shuffle import bucketed_groupby

    partials = ds.map_batches(partial, batch_format="pandas")
    # single reduce group: the partials are tiny (one row per batch)
    return bucketed_groupby(partials, "__part", reduce_all, num_buckets=1).to_pandas()
