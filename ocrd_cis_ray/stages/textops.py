"""Text-analysis stages over a documents table: language-ID, quality
scoring, token counting, document fingerprinting.

Extends the reference's text-side utilities to the operations a
large-scale training-data pipeline needs:

- stopword-set language detection follows the reference's
  ``detect_language`` (ocrd_cis/aio/aio.py:462-477: intersect document
  token set with per-language stopword sets, argmax overlap);
- token cleaning per aio/aio.py:454-460 (strip punct/digits, lower);
- quality scoring = length / punctuation / stopword-ratio features;
- fingerprint = polynomial rolling hash over the cleaned token stream.

All stages are stateless vectorized ``map_batches`` UDFs; the scoring
stage is row-local so it scales linearly with no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# per-language stopword (function-word) lists — standard closed-class
# vocabulary, the same signal the reference's stopwords.json carries
# (div/stopwords.json: german 129 / english 174 / latin 90 words;
# div/lang.py:19-88 consumes it). The q22 oracle SQL is GENERATED from
# this dict (_langid_sql), so engine and oracle stay in lockstep.
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        """the and of to a in is it you that he was for on are as with his they
        i at be this have from or one had by word but not what all were we when
        your can said there use an each which she do how their if will up other
        about out many then them these so some her would make like him into time
        has look two more write go see number no way could people my than first
        been who its now find long down day did get come made may part over new
        sound take only little work know place year live me back give most very
        after thing our just name good sentence man think say great where help
        through much before line right too mean old any same tell boy follow
        came want show also around form three small set put end does another
        well large must big even such because turn here why ask went men read
        need land different home us move try kind hand picture again change off
        play spell air away animal house point page letter mother answer found
        study still learn should world high every near add food between own
        below country plant last school father keep tree never start city earth
        eye light thought head under story saw left dont few while along might
        close something seem next hard open example begin life always those both
        paper together got group often run""".split()
    ),
    "de": frozenset(
        """der die das und ist ich nicht sie mit ein auf für von zu den dem des
        er es wir ihr sind war waren sein eine einer eines einem einen auch als
        an aber bei bis da dann doch durch ehe ohne nach noch nur oder so um
        unter vor wenn wie wo zwar über aus man mir mich dir dich uns euch ihm
        ihn ihnen was wer wem wen welche welcher welches hier dort heute morgen
        immer wieder schon sehr mehr viel viele alle alles etwas nichts kein
        keine keiner meines deines seines hat hatte haben hatten wird werden
        wurde wurden kann können konnte muss müssen sollte würde jetzt dieser
        diese dieses jener jene jenes mein dein sein unser ihre sich selbst
        gegen zwischen während wegen trotz statt damit dass weil obwohl indem
        sondern sowie beim vom zum zur ins ans aufs""".split()
    ),
    "fr": frozenset(
        """le la les et de un une est je pas pour dans sur avec que qui quoi ne
        se ce cette ces son sa ses mon ma mes ton ta tes notre votre leur nous
        vous ils elles il elle on tu au aux du des par plus moins très bien mal
        tout tous toute toutes rien quelque chose comme mais ou donc or ni car
        si quand où dont être avoir fait faire dit dire peut pouvoir veut
        vouloir va aller vient venir sans sous entre vers chez depuis pendant
        avant après aussi encore déjà toujours jamais ici là alors ainsi même
        autre autres deux trois premier dernier nouveau grand petit bon mauvais
        était été sont avait avaient sera seront cet celui celle ceux celles
        lui leur eux moi toi soi y en""".split()
    ),
    "es": frozenset(
        """el la los las y de un una es no por para con su en que se del al lo
        le les me te nos os mi tu sus mis tus este esta estos estas ese esa
        esos esas aquel aquella como más menos muy mucho muchos poco pocos
        todo todos toda todas otro otros otra otras pero o ni si cuando donde
        porque pues aunque mientras durante antes después también tampoco ya
        aún siempre nunca aquí allí entonces así mismo misma dos tres primero
        último nuevo grande pequeño bueno malo era fue son había habían será
        serán estar estaba estaban ser tener tiene tienen hacer hace hacen
        decir dice dijo puede pueden ir va van venir viene sin sobre entre
        hacia desde hasta contra según cada cual quien cuyo ello ella ellos
        ellas usted ustedes yo él""".split()
    ),
    "zh": frozenset(
        """的 是 不 了 在 人 有 我 他 这 个 们 中 来 上 大 为 和 国 地 到 以 说 时
        要 就 出 会 可 也 你 对 生 能 而 子 那 得 于 着 下 自 之 年 过 发 后 作 里
        用 道 行 所 然 家 种 事 成 方 多 经 么 去 法 学 如 都 同 现 当 没 动 面 起
        看 定 天 分 还 进 好 小 部 其 些 主 样 理 心 她 本 前 开 但 因 只 从 想 实""".split()
    ),
    "la": frozenset(
        """et in est non ad ut cum de quod qui quae sed si ex per aut atque enim
        autem nec neque quam etiam iam tamen esse sunt erat erant fuit a ab ac
        apud ante post inter sub super contra sine pro propter ob tam ita sic
        nam vero igitur ergo itaque quia quoniam dum donec ubi unde quo cur
        quid quis quem cuius cui ipse ille hic haec hoc ea id eius eorum se
        sibi suus sua suum noster vester meus tuus omnis omnia nihil nemo
        semper numquam saepe modo tum tunc nunc hodie cras heri ibi illic
        huc illuc inde deinde primum denique quidem quoque vel sive seu an
        ne uti velut quasi tamquam""".split()
    ),
}

_TOKEN_SPLIT = r"\s+"


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_tokens) — whitespace token count.

    Vectorized: count spaces with a pyarrow kernel; SQL-parity with
    ``len(string_split(text, ' '))``.
    """
    n = pc.add(pc.count_substring(batch["text"], " "), 1)
    return pa.table({"doc_id": batch["doc_id"], "n_tokens": pc.cast(n, pa.int64())})


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality features per doc: n_chars, n_tokens, avg_token_len, punct_ratio.

    n_chars = utf8 length; punct_ratio = non-alnum-non-space chars /
    n_chars; avg_token_len = (n_chars - (n_tokens-1)) / n_tokens for
    single-space-joined text.
    """
    text = batch["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.int64())
    stripped = pc.replace_substring_regex(text, r"[A-Za-z0-9\s]", "")
    n_punct = pc.cast(pc.utf8_length(stripped), pa.int64())
    punct_ratio = pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()))
    avg_tok = pc.divide(
        pc.cast(pc.subtract(n_chars, pc.subtract(n_tokens, 1)), pa.float64()),
        pc.cast(n_tokens, pa.float64()),
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "avg_token_len": avg_tok,
            "punct_ratio": punct_ratio,
        }
    )


class LangIdStage:
    """Stateful actor stage: stopword-set language ID (aio/aio.py:462-477).

    Stopword sets + compiled splitter built once per actor in __init__;
    __call__ scores each doc as argmax over per-language stopword hit
    counts (ties broken by language code order, 'und' = undetermined
    when no stopword hits).
    """

    def __init__(self, stopwords: dict[str, frozenset[str]] | None = None):
        import re

        self.stop = stopwords or STOPWORDS
        self.langs = sorted(self.stop)
        self.split = re.compile(_TOKEN_SPLIT)
        # flat lookup: token -> bitmask of languages containing it
        self.mask: dict[str, int] = {}
        for i, lang in enumerate(self.langs):
            for w in self.stop[lang]:
                self.mask[w] = self.mask.get(w, 0) | (1 << i)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Whole-batch vectorized: tokenize once, ONE hashmap lookup per
        token (pandas map, C hash table) to a language bitmask, then one
        bincount per language over the doc index — no per-token Python
        bit loop."""
        nl = len(self.langs)
        texts = batch["text"].tolist()
        toks_per_doc = [self.split.split((t or "").lower()) for t in texts]
        lengths = np.array([len(ts) for ts in toks_per_doc], dtype=np.int64)
        ndocs = len(texts)
        flat = [tok for ts in toks_per_doc for tok in ts]
        if not flat:
            return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": ["und"] * ndocs})
        masks = pd.Series(flat).map(self.mask).fillna(0).to_numpy(dtype=np.int64)
        doc_idx = np.repeat(np.arange(ndocs), lengths)
        counts = np.zeros((ndocs, nl), dtype=np.int64)
        for i in range(nl):
            hit = (masks >> i) & 1 == 1
            if hit.any():
                counts[:, i] = np.bincount(doc_idx[hit], minlength=ndocs)
        best = counts.argmax(axis=1)  # ties -> first (lowest code order)
        pred = np.array(self.langs, dtype=object)[best]
        pred[counts.max(axis=1) == 0] = "und"
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": pred})


FP_BASE = np.uint64(1099511628211)  # FNV-ish odd multiplier
FP_OFFSET = np.uint64(1469598103934665603)


def _fp_pows(n: int) -> np.ndarray:
    """Powers of FP_BASE mod 2^64, highest power first (cached, grown on demand)."""
    global _POWS
    if len(_POWS) < n:
        m = max(n, 2 * len(_POWS))
        p = np.empty(m, dtype=np.uint64)
        p[0] = np.uint64(1)
        with np.errstate(over="ignore"):
            for i in range(1, m):
                p[i] = p[i - 1] * FP_BASE
        _POWS = p
    return _POWS


_POWS = np.ones(1, dtype=np.uint64)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Polynomial document fingerprint: h = sum b_i * BASE^(n-1-i) mod 2^64.

    A deterministic whole-doc fingerprint over UTF-8 bytes; equal texts
    collide by construction, near-equal texts don't (exact-dup key,
    cheaper than cryptographic hashing). Fully vectorized: one numpy
    multiply-sum over the batch's concatenated UTF-8 buffer using
    precomputed powers — no per-byte Python loop.
    """
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    arr = texts.cast(pa.binary())
    # flat byte buffer + per-doc offsets (zero-copy from Arrow)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lengths = np.diff(offs).astype(np.int64)
    maxlen = int(lengths.max()) if len(lengths) else 1
    pows = _fp_pows(maxlen + 1)
    # per-position coefficient: BASE^(len-1-pos_in_doc); build via a
    # position-within-doc index over the flat buffer
    pos = np.arange(offs[0], offs[-1], dtype=np.int64) - np.repeat(offs[:-1].astype(np.int64), lengths)
    exp = np.repeat(lengths - 1, lengths) - pos
    with np.errstate(over="ignore"):
        terms = data[offs[0] : offs[-1]].astype(np.uint64) * pows[exp]
        # prefix-sum difference (uint64 wraps = mod 2^64, which is the hash
        # domain) — handles empty docs with no special cases
        cs = np.zeros(len(terms) + 1, dtype=np.uint64)
        np.cumsum(terms, out=cs[1:])
        rel = offs.astype(np.int64) - int(offs[0])
        fps = cs[rel[1:]] - cs[rel[:-1]]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array([format(int(x), "016x") for x in fps], pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# distributed corpus vocabulary (shared by the rare-token quality filter,
# the post-correction lexicon, and the OCR chain's language dict)


def _token_count_partials(t: pa.Table, *, col: str) -> pd.DataFrame:
    texts = t[col].to_pylist()
    toks = [w for txt in texts for w in (txt or "").split(" ")]
    vc = pd.Series(toks).value_counts()
    return pd.DataFrame({"w": vc.index, "c": vc.to_numpy()})


def token_frequencies(ds, *, col: str = "text", top_v: int | None = None,
                      num_buckets: int | None = None) -> pd.Series:
    """Distributed corpus token-frequency map → small pd.Series
    (index = token, value = count), safe to ``ray.put`` and broadcast.

    Pass 1 is the combiner pattern: per-batch vectorized value_counts
    partials, then ONE bucketed hash aggregate — the exchange moves at
    most (batches × per-batch vocab) rows, never the token stream.

    ``top_v`` truncates to the V most frequent tokens WITHOUT ever
    collecting the full vocabulary to the driver: each aggregated
    block contributes its local top-V candidates (each token lives in
    exactly one block after the hash aggregate, so the global top-V is
    a subset of the per-block top-V union), and the driver selects the
    final V from ≤ blocks×V candidate rows. Driver memory is
    O(blocks × V), independent of vocabulary size — the 100-TB path.
    Ties at the boundary break deterministically (count desc, token
    asc). Tokens outside the map are "rare by definition"; callers
    treat misses as count 0 (or a floor of their choosing).
    """
    from functools import partial

    from ..shuffle import bucketed_aggregate

    freq_ds = bucketed_aggregate(
        ds.map_batches(partial(_token_count_partials, col=col), batch_format="pyarrow"),
        "w",
        {"c": ("c", "sum")},
        num_buckets=num_buckets,
    )
    if top_v is None:
        freq = freq_ds.to_pandas()
    else:
        def local_top(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) <= top_v:
                return df
            return df.sort_values(["c", "w"], ascending=[False, True]).head(top_v)

        cand = freq_ds.map_batches(local_top, batch_format="pandas").to_pandas()
        freq = (
            cand.sort_values(["c", "w"], ascending=[False, True]).head(top_v)
            if len(cand) > top_v
            else cand
        )
    return pd.Series(freq["c"].to_numpy(), index=freq["w"])


# ---------------------------------------------------------------------------
# Gopher-style document quality filter

# The eight "must contain >= 2 distinct" English function words from the
# Gopher data-quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A1.1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_batch(
    batch: pa.Table,
    *,
    min_words: int = 15,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_distinct: int = 2,
) -> pa.Table:
    """Gopher repetition-free quality rules, vectorized, one batch pass.

    Every feature is chosen to be EXACTLY expressible in ANSI SQL (the
    q46 oracle recomputes all of them in DuckDB), with the repo's
    standing single-space tokenization convention (split on ' ',
    matching the q20/q21 oracles):

    - n_words, mean word length ((chars - spaces) / n_words);
    - symbol-to-word ratio ('#' and '...' occurrences per word);
    - fraction of words containing an ASCII letter;
    - distinct-stopword count over GOPHER_STOPWORDS;
    - pass_filter = conjunction of the published thresholds.

    Row-local; zero shuffle; per-word work is done on the FLATTENED
    word array with np.add.reduceat segment sums (no Python loop).
    """
    text = batch["text"]
    n = len(batch)
    n_words = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    nw = n_words.to_numpy(zero_copy_only=False).astype(np.float64)
    mean_wl = (
        n_chars.to_numpy(zero_copy_only=False) - (nw - 1)
    ) / nw
    n_hash = pc.count_substring(text, "#").to_numpy(zero_copy_only=False)
    n_ell = pc.count_substring(text, "...").to_numpy(zero_copy_only=False)
    symbol_ratio = (n_hash + n_ell) / nw

    words = pc.split_pattern(text, " ")
    flat = pc.list_flatten(words)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nw.astype(np.int64), out=offsets[1:])
    alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    # segment sums over the flattened mask (empty docs impossible:
    # split always yields >=1 element)
    alpha_per_doc = np.add.reduceat(alpha, offsets[:-1]) if n else alpha
    frac_alpha = alpha_per_doc / nw

    stop_codes = pc.index_in(flat, pa.array(GOPHER_STOPWORDS)).to_numpy(
        zero_copy_only=False
    )
    # index_in yields null for misses -> to_numpy gives float with nan
    hit = np.nan_to_num(stop_codes, nan=-1) >= 0
    codes = np.nan_to_num(stop_codes, nan=-1).astype(np.int64)
    # distinct stopwords per doc: scatter into an (n, 8) presence grid
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), nw.astype(np.int64))
    grid = np.zeros((n, len(GOPHER_STOPWORDS)), dtype=bool)
    grid[doc_idx[hit], codes[hit]] = True
    n_stop = grid.sum(axis=1).astype(np.int64)

    nwi = n_words.to_numpy(zero_copy_only=False)
    ok = (
        (nwi >= min_words)
        & (nwi <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (frac_alpha >= min_alpha_frac)
        & (n_stop >= min_stop_distinct)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": n_words,
            "mean_word_len": pa.array(mean_wl, pa.float64()),
            "symbol_ratio": pa.array(symbol_ratio, pa.float64()),
            "frac_alpha_words": pa.array(frac_alpha, pa.float64()),
            "n_stop_distinct": pa.array(n_stop, pa.int64()),
            "pass_filter": pa.array(ok.astype(np.int32), pa.int32()),
        }
    )


def gopher_quality(ds, **thresholds):
    """documents(doc_id, text) -> per-doc Gopher quality features +
    pass_filter; row-local map_batches, zero shuffle."""
    return ds.map_batches(
        gopher_quality_batch, batch_format="pyarrow", fn_kwargs=thresholds
    )
