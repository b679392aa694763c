"""BPE tokenizer training + encoding, Ray-Data-first.

How real BPE trainers scale (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; the HuggingFace
tokenizers trainer): the corpus-size-dependent work is ONLY the word
frequency count — the merge loop runs over the compact (word, count)
table, which is vocabulary-sized, not corpus-sized. This module keeps
exactly that split:

- ``train_bpe``: word frequencies via the repo's distributed
  map-side-combined bucketed aggregate with top-V truncation
  (``textops.token_frequencies`` — driver memory O(blocks×V) at any
  corpus scale), then the classic greedy merge loop over the ≤V-row
  table. Deterministic: ties break (count desc, pair lexicographic).
- ``BPEEncoder``: an actor-pool ``map_batches`` stage — the merge
  ranks load once per actor in ``__init__``, and a word→tokens memo
  grows across batches (Zipf makes the hit rate ~1 after warmup);
  per-doc work is a value_counts + map, not a per-token Python loop.

The merge table is exact integer arithmetic end-to-end, so it is
bit-identical across block layouts and cluster widths; the q55 query
is rows-only only because no SQL oracle can express the iterative
merge loop (pytest pins it against a brute-force reference instead).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

END_OF_WORD = "</w>"


def train_bpe(ds, *, num_merges: int = 50, top_v: int = 100_000, col: str = "text"):
    """-> pd.DataFrame(rank:int64, left, right, count:int64).

    Stops early when the best pair occurs < 2 times (nothing left to
    merge)."""
    from .textops import token_frequencies

    freq = token_frequencies(ds, col=col, top_v=top_v)
    words = {
        tuple(w) + (END_OF_WORD,): int(c)
        for w, c in freq.items()
        if isinstance(w, str) and w
    }
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # deterministic argmax: count desc, then pair lexicographic asc
        best_count = max(pairs.values())
        if best_count < 2:
            break
        best_pair = min(p for p, c in pairs.items() if c == best_count)
        a, b = best_pair
        merges.append((rank, a, b, best_count))
        merged = a + b
        new_words = {}
        for sym, c in words.items():
            out = []
            i = 0
            n = len(sym)
            while i < n:
                if i < n - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "count"]
    ).astype({"rank": np.int64, "count": np.int64})


def encode_word(word: str, ranks: dict) -> list:
    """Standard greedy BPE: repeatedly apply the lowest-rank merge."""
    sym = list(word) + [END_OF_WORD]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BPEEncoder:
    """Actor-pool stage: documents(doc_id, text) -> (doc_id, n_words,
    n_tokens). Merge ranks parsed once per actor; word->len memo
    persists across batches."""

    # memo ceiling: word->len entries are ~100 B each, so 2M entries is
    # ~200 MB per worker — beyond that, stop inserting (Zipf: the hot
    # head is long cached by then; the cold tail is computed inline)
    MEMO_CAP = 2_000_000

    def __init__(self, merges: pd.DataFrame):
        self.ranks = {
            (r.left, r.right): int(r.rank) for r in merges.itertuples()
        }
        self.memo: dict = {}

    def _tok_len(self, word: str) -> int:
        n = self.memo.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks))
            if len(self.memo) < self.MEMO_CAP:
                self.memo[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[
            "text"
        ].to_pylist()
        n_words = np.zeros(len(texts), np.int64)
        n_tokens = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            ws = t.split(" ") if t else []
            n_words[i] = len(ws)
            # count distinct words once per doc (Zipf: few distinct)
            vc = Counter(ws)
            n_tokens[i] = sum(self._tok_len(w) * c for w, c in vc.items())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words),
                "n_tokens": pa.array(n_tokens),
            }
        )


# process-global encoder cache: Ray reuses worker processes across
# tasks, so a lazily-built encoder keyed by the merge table's content
# gives the actor pool's once-per-process rank parse AND its
# cross-batch word->len memo — without actor process spawn (measured
# 30-50% slower pool start in sessions crowded by earlier pipelines).
# Keyed by content, not object identity: different merge tables
# (different corpora) coexist within one worker.
_ENCODERS: dict = {}


def _encoder_for(merge_rows: tuple) -> "BPEEncoder":
    enc = _ENCODERS.get(merge_rows)
    if enc is None:
        if len(_ENCODERS) >= 4:  # bound worker memory: evict oldest corpus
            _ENCODERS.pop(next(iter(_ENCODERS)))
        enc = BPEEncoder(
            pd.DataFrame(list(merge_rows), columns=["left", "right", "rank"])
        )
        _ENCODERS[merge_rows] = enc
    return enc


def bpe_pipeline(ds, *, num_merges: int = 50, top_v: int = 100_000, concurrency=None):
    """Train on the corpus, then encode the same corpus with the
    learned merges. Encoding runs as TASKS over a process-global
    encoder cache (see _encoder_for) — the merge table is tiny
    (num_merges rows), so shipping it in the task closure is free;
    ``concurrency`` is accepted for API compatibility and ignored."""
    merges = train_bpe(ds, num_merges=num_merges, top_v=top_v)
    merge_rows = tuple(
        (str(r.left), str(r.right), int(r.rank)) for r in merges.itertuples()
    )

    def encode(batch: pa.Table) -> pa.Table:
        return _encoder_for(merge_rows)(batch)

    encoded = ds.map_batches(encode, batch_format="pyarrow")
    return merges, encoded
