"""Post-correction — lexicon + channel-model candidate ranking as a
stateful actor-pool stage.

Reference pipeline (ocrd_cis/postcorrect/cli.py + the packaged Java
decision maker): a profiler proposes correction candidates for
suspicious tokens against a language lexicon; the decision maker ranks
candidates with features (edit distance, dictionary frequency,
historical/OCR pattern weights — data/config.json leFeatures/rrFeatures/
dmFeatures) keeping the top ``maxCandidates`` (default 10,
ocrd-tool.json:490-495) and rewrites tokens where the ranker is
confident.

This native reimplementation:
- lexicon index built ONCE per actor in ``__init__`` — a SymSpell-style
  deletion-neighbourhood index (public algorithm) for distance ≤ 2
  candidate generation (the "profiler");
- channel model = (src, dst) character-confusion weights, learned from
  aligned OCR/GT pairs with ``learn_confusions`` (the reference extracts
  confusions from edit alignments, ocrolib/edist.py:21-83);
- ranking score = log freq prior + sum of confusion log-weights along
  the edit script - per-edit penalty; top-k kept, best above threshold
  replaces the token.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import clean_token, edit_ops


def _deletes(word: str, max_dist: int) -> set[str]:
    """All strings reachable by deleting up to max_dist chars."""
    out = {word}
    frontier = {word}
    for _ in range(max_dist):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


class PostCorrector:
    """Actor-pool stage: token rows -> ranked candidates + correction.

    Input batches: (doc_id, line_no:int32, word_no:int32, token).
    Output adds: suspicious:bool, corrected, candidates:
    list<struct<suggestion, distance:int32, weight:float32>> (the
    stubbed-profiler JSON shape of tests/run_training_test.bash:33-49).
    """

    def __init__(
        self,
        lexicon: dict[str, int],
        confusions: dict[tuple[str, str], float] | None = None,
        *,
        max_candidates: int = 10,
        max_dist: int = 2,
        accept_threshold: float = -math.inf,
    ):
        self.lexicon = dict(lexicon)
        self.total = max(1, sum(self.lexicon.values()))
        self.confusions = dict(confusions or {})
        self.max_candidates = max_candidates
        self.max_dist = max_dist
        self.accept_threshold = accept_threshold
        # SymSpell-style index: delete-variant -> [lexicon words]
        self.index: dict[str, list[str]] = {}
        for w in self.lexicon:
            for d in _deletes(w, max_dist):
                self.index.setdefault(d, []).append(w)
        # decision cache lives on the actor: correction of a (token,
        # peer) pair is deterministic, so it amortizes across ALL
        # batches the actor processes, not just one
        self._cache: dict[tuple, tuple] = {}

    # -- candidate generation ("profiler") --------------------------------

    def candidates(self, token: str) -> list[tuple[str, int, float]]:
        """(suggestion, distance, weight) top-k for a suspicious token."""
        from ..util import lev_within, levenshtein

        seen: dict[str, int] = {}
        for d in _deletes(token, self.max_dist):
            for w in self.index.get(d, ()):
                if w not in seen and lev_within(token, w, self.max_dist):
                    seen[w] = levenshtein(token, w)
        scored = []
        for w, dist in seen.items():
            scored.append((w, dist, self._score(token, w, dist)))
        scored.sort(key=lambda t: (-t[2], t[1], t[0]))
        return scored[: self.max_candidates]

    def _score(self, token: str, cand: str, dist: int) -> float:
        """log-domain: freq prior + channel-model confusion weights."""
        s = math.log(self.lexicon.get(cand, 1) / self.total)
        _, pairs = edit_ops(token, cand)
        for ai, bi in pairs:
            a = token[ai] if ai is not None else ""
            b = cand[bi] if bi is not None else ""
            if a == b:
                continue
            w = self.confusions.get((a, b))
            s += math.log(w) if w and w > 0 else -4.0  # unseen-edit penalty
        return s

    # -- batch interface ---------------------------------------------------

    VOTE_BONUS = 2.0  # log-domain bonus for a peer-OCR-confirmed candidate
    # (the reference's nOCR ranking feature: candidates supported by
    # other aligned OCR engines outrank lexicon-only ones,
    # data/config.json rrFeatures/dmFeatures)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import lev_within

        tokens = batch["token"].to_pylist()
        peers = batch["peer"].to_pylist() if "peer" in batch.column_names else [None] * len(tokens)
        cand_type = pa.struct(
            [("suggestion", pa.string()), ("distance", pa.int32()), ("weight", pa.float32())]
        )
        suspicious, corrected, cands_col = [], [], []
        cache = self._cache
        for tok, peer in zip(tokens, peers):
            key = clean_token(tok or "")
            if not key or key in self.lexicon:
                suspicious.append(False)
                corrected.append(
                    key if key and tok != key and (tok or "").lower() == key else tok
                )
                cands_col.append([])
                continue
            peer_key = clean_token(peer or "") if peer else ""
            ck = (key, peer_key)
            if ck in cache:
                sus, corr, cl = cache[ck]
            else:
                cands = self.candidates(key)
                # nOCR vote: the aligned token from another engine is a
                # candidate with a vote bonus when it's a lexicon word
                # within edit range of the suspicious token
                if (
                    peer_key
                    and peer_key != key
                    and peer_key in self.lexicon
                    and lev_within(key, peer_key, self.max_dist + 1)
                ):
                    from ..util import levenshtein

                    d = levenshtein(key, peer_key)
                    score = self._score(key, peer_key, d) + self.VOTE_BONUS
                    cands = sorted(
                        [c for c in cands if c[0] != peer_key] + [(peer_key, d, score)],
                        key=lambda t: (-t[2], t[1], t[0]),
                    )[: self.max_candidates]
                cl = [
                    {"suggestion": c, "distance": np.int32(d), "weight": np.float32(s)}
                    for c, d, s in cands
                ]
                if cands and cands[0][2] >= self.accept_threshold:
                    corr = cands[0][0]
                    sus = True
                else:
                    corr, sus = key, True
                cache[ck] = (sus, corr, cl)
            suspicious.append(sus)
            corrected.append(corr if corr else tok)
            cands_col.append(cl)
        cols = {name: batch[name] for name in batch.column_names}
        cols["suspicious"] = pa.array(suspicious, pa.bool_())
        cols["corrected"] = pa.array(corrected, pa.string())
        cols["candidates"] = pa.array(cands_col, pa.list_(cand_type))
        return pa.table(cols)


    # -- line-level interface (explode/correct/rejoin inside the actor,
    #    so the surrounding pipeline needs NO token-level shuffle) -------

    def correct_line(self, text: str, peer_text: str = "") -> str:
        """Correct every token of one line, using the peer engine's
        cursor-aligned token as the nOCR vote (match_cursor semantics,
        align/cli.py:224-245; give-up leaves tokens unvoted)."""
        from ..stages.align import match_cursor

        words = text.split(" ") if text else []
        if not words:
            return text
        ptoks = peer_text.split(" ") if peer_text else []
        matched = match_cursor(words, ptoks) if ptoks else None
        out = []
        for wn, w in enumerate(words):
            peer = ptoks[matched[wn]] if matched is not None else ""
            out.append(self._correct_token(w, peer))
        return " ".join(out)

    def _correct_token(self, tok: str, peer: str) -> str:
        from ..util import lev_within, levenshtein

        key = clean_token(tok or "")
        if not key:
            return tok
        if key in self.lexicon:
            # case-normalize pure case errors (OCR 'D'/'d' confusions):
            # the token is lexicon-valid after lowercasing only
            return key if tok != key and tok.lower() == key else tok
        peer_key = clean_token(peer or "") if peer else ""
        ck = (key, peer_key)
        hit = self._cache.get(ck)
        if hit is not None:
            return hit[1]
        cands = self.candidates(key)
        if (
            peer_key
            and peer_key != key
            and peer_key in self.lexicon
            and lev_within(key, peer_key, self.max_dist + 1)
        ):
            d = levenshtein(key, peer_key)
            score = self._score(key, peer_key, d) + self.VOTE_BONUS
            cands = sorted(
                [c for c in cands if c[0] != peer_key] + [(peer_key, d, score)],
                key=lambda t: (-t[2], t[1], t[0]),
            )[: self.max_candidates]
        corr = cands[0][0] if cands and cands[0][2] >= self.accept_threshold else key
        self._cache[ck] = (True, corr, None)
        return corr

    def correct_lines_batch(self, batch: pa.Table, *, text_col: str = "text", peer_col: str = "peer_text", out_col: str = "corrected_text") -> pa.Table:
        texts = batch[text_col].to_pylist()
        peers = batch[peer_col].to_pylist() if peer_col in batch.column_names else [""] * len(texts)
        corrected = [self.correct_line(t or "", p or "") for t, p in zip(texts, peers)]
        cols = {n: batch[n] for n in batch.column_names}
        cols[out_col] = pa.array(corrected, pa.string())
        return pa.table(cols)


class LineCorrector(PostCorrector):
    """PostCorrector exposed as a line-level actor stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        return self.correct_lines_batch(batch)


def postcorrect_tokens(ds, lexicon: dict[str, int], confusions=None, *, concurrency: int = 4, batch_size: int = 4096, num_cpus: float = 1, **kw):
    """Dataset wrapper: actor pool holding the lexicon index + channel model."""
    return ds.map_batches(
        PostCorrector,
        fn_constructor_args=(lexicon, confusions),
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        batch_size=batch_size,
        num_cpus=num_cpus,
    )


# ---------------------------------------------------------------------------
# channel-model learning (confusion extraction from aligned pairs)


def confusion_partials_batch(
    batch: pa.Table,
    *,
    test_col: str = "text",
    gt_col: str = "gt_text",
    max_pairs: int | None = None,
    sample_rate: float | None = None,
) -> pa.Table:
    """Per-batch (src, dst, n) confusion counts from edit alignments of
    (ocr, gt) line pairs — the xlevenshtein confusion extraction
    (ocrolib/edist.py:21-83) as a distributed partial aggregate.

    Bounding the O(len²) alignments (the channel model saturates after
    a few thousand pairs): ``sample_rate`` keeps a pair iff its content
    hash clears a threshold — DETERMINISTIC and independent of batch
    layout, so the learned model (and everything downstream) is
    byte-stable across runs; corpus-scale callers shrink the rate with
    corpus size. ``max_pairs`` (first-N differing per batch) is kept
    for explicit hard bounding but depends on block layout — prefer
    sample_rate anywhere reruns must agree."""
    test = batch[test_col].to_pylist()
    gt = batch[gt_col].to_pylist()
    if sample_rate is not None and len(test):
        thr = int(sample_rate * (1 << 32))
        h = pd.util.hash_array(
            np.asarray([(t or "") + "\x00" + (g or "") for t, g in zip(test, gt)],
                       dtype=object)
        ) % (1 << 32)
        keep = h < thr
        test = [t for t, k in zip(test, keep) if k]
        gt = [g for g, k in zip(gt, keep) if k]
    counts: Counter = Counter()
    aligned = 0
    for t, g in zip(test, gt):
        t, g = t or "", g or ""
        if t == g:
            continue
        if max_pairs is not None and aligned >= max_pairs:
            break
        aligned += 1
        _, pairs = edit_ops(t, g)
        for ai, bi in pairs:
            a = t[ai] if ai is not None else ""
            b = g[bi] if bi is not None else ""
            if a != b:
                counts[(a, b)] += 1
    items = sorted(counts.items())
    return pa.table(
        {
            "src": pa.array([k[0] for k, _ in items], pa.string()),
            "dst": pa.array([k[1] for k, _ in items], pa.string()),
            "n": pa.array([v for _, v in items], pa.int64()),
        }
    )


def learn_confusions(
    pairs_ds,
    *,
    test_col: str = "text",
    gt_col: str = "gt_text",
    max_pairs_per_batch: int | None = None,
    sample_rate: float | None = None,
) -> dict[tuple[str, str], float]:
    """Distributed confusion-weight estimation: partial counts per batch
    → small groupby sum → normalized weights (count / total edits).
    Returns the channel model dict for PostCorrector."""
    from functools import partial as fpartial

    partials = pairs_ds.map_batches(
        fpartial(
            confusion_partials_batch,
            test_col=test_col,
            gt_col=gt_col,
            max_pairs=max_pairs_per_batch,
            sample_rate=sample_rate,
        ),
        batch_format="pyarrow",
    )
    # partials are map-side combined and ALPHABET-bounded (≤ |charset|²
    # rows per batch, ~10² in practice), so the reduce input is
    # O(batches × confusion pairs) tiny rows — a driver pandas sum
    # beats a Ray sort-aggregate's ~2 s fixed all-to-all overhead. At
    # extreme block counts, callers bound the input with
    # max_pairs_per_batch (the estimate is a rate; sampling is exact
    # in expectation).
    agg = partials.to_pandas()
    if agg.empty or "n" not in agg.columns:
        return {}  # clean channel: no confusions observed
    agg = agg.groupby(["src", "dst"], as_index=False)["n"].sum()
    total = max(1, int(agg["n"].sum()))
    return {(r.src, r.dst): float(r.n) / total for r in agg.itertuples()}
