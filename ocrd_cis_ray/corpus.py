"""Deterministic synthesis of the interleaved text+media document corpus.

The engine's primary input (driver ``input_hint``) is a table of
interleaved documents:

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

the flattened form of the reference's PAGE-XML page tree
(Page -> TextRegion -> TextLine -> Word, reading order == offset order;
reference traversals: ocrd_cis/align/cli.py:63-79,
ocrd_cis/ocropy/recognize.py:161-303). No such corpus ships with the
driver, so we synthesize one deterministically (seeded per ``doc_id``)
from the driver's ``documents.parquet`` texts — every worker produces
identical bytes for a given (doc_id, seed), so synthesis can run
distributed inside ``map_batches`` with no driver-side loop.

Content rules (FIXTURES.md F1):
- 1-4 region spans per doc; each region has 1-8 line spans; each line is
  followed by its word spans (line text split on spaces, recognize.py:237).
- region text = newline-join of its line texts (recognize.py:195-199).
- ~1 in 4 docs gets an ``image`` span with a media_ref (media-heavy skew
  fixture for partition rebalancing).
- offsets strictly increasing per doc, 0-based.

The *raw* variant (``raw=True``) emits region spans with EMPTY text and
no word spans — the extraction stage (stages/extract.py) must
reconstruct them; the golden output of extraction over a raw corpus is
exactly the non-raw corpus for the same seed (span-sequence equality).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .util import stable_hash32, stable_hash64

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])

_VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark window dup anatomie blumenbach gegenstand natur "
    "seite text zeile wort glyph region bild druck papier folio recto verso"
).split()


def _doc_spans(doc_id: str, base_words: list[str], seed: int, raw: bool):
    """Span list for one document. Deterministic in (doc_id, seed)."""
    rng = np.random.default_rng((stable_hash64(doc_id) ^ seed) & 0xFFFFFFFFFFFF)
    n_regions = int(rng.integers(1, 5))
    has_image = bool(rng.integers(0, 4) == 0)
    kinds: list[str] = []
    texts: list[str] = []
    media: list[str] = []
    wi = 0  # cursor into base_words; wrap around

    def next_words(n: int) -> list[str]:
        nonlocal wi
        out = []
        for _ in range(n):
            if base_words:
                out.append(base_words[wi % len(base_words)])
                wi += 1
            else:
                out.append(_VOCAB[int(rng.integers(0, len(_VOCAB)))])
        return out

    for r in range(n_regions):
        n_lines = int(rng.integers(1, 9))
        line_texts = []
        region_pos = len(kinds)
        kinds.append("region")
        texts.append("")  # filled below (non-raw)
        media.append("")
        for _ in range(n_lines):
            n_words = int(rng.integers(2, 7))
            words = next_words(n_words)
            lt = " ".join(words)
            line_texts.append(lt)
            kinds.append("line")
            texts.append(lt)
            media.append("")
            if not raw:
                for w in words:
                    kinds.append("word")
                    texts.append(w)
                    media.append("")
        if not raw:
            texts[region_pos] = "\n".join(line_texts)
        if has_image and r == 0:
            kinds.append("image")
            texts.append("")
            media.append(f"media/{doc_id}/img-{r}.bin")
    offsets = list(range(len(kinds)))
    return kinds, texts, media, offsets


def synth_batch(batch: pa.Table, *, seed: int = 42, pages_per_doc: int = 1, raw: bool = False) -> pa.Table:
    """map_batches UDF: driver ``documents`` rows -> interleaved doc rows.

    Each input document expands to ``pages_per_doc`` pages with doc_id
    ``d{doc_id:08d}p{page:04d}`` (zero-padded so lexicographic order ==
    numeric order, the reference's sorted-URL page ordering,
    align/cli.py:263-265).
    """
    src_ids = batch["doc_id"].to_pylist()
    src_texts = batch["text"].to_pylist()
    doc_ids: list[str] = []
    spans_kind: list[list[str]] = []
    spans_text: list[list[str]] = []
    spans_media: list[list[str]] = []
    spans_off: list[list[int]] = []
    for sid, text in zip(src_ids, src_texts):
        words = text.split(" ") if text else []
        for p in range(pages_per_doc):
            did = f"d{int(sid):08d}p{p:04d}"
            k, t, m, o = _doc_spans(did, words, seed, raw)
            doc_ids.append(did)
            spans_kind.append(k)
            spans_text.append(t)
            spans_media.append(m)
            spans_off.append(o)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": _build_spans(spans_kind, spans_text, spans_media, spans_off),
        }
    )


def _build_spans(kinds, texts, media, offs) -> pa.ListArray:
    """Assemble list<struct> column from per-doc python lists via flat arrays."""
    lengths = [len(k) for k in kinds]
    offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    flat_kind = pa.array([x for k in kinds for x in k], pa.string())
    flat_text = pa.array([x for t in texts for x in t], pa.string())
    flat_media = pa.array([x for m in media for x in m], pa.string())
    flat_off = pa.array([x for o in offs for x in o], pa.int32())
    struct = pa.StructArray.from_arrays(
        [flat_kind, flat_text, flat_media, flat_off],
        fields=list(SPAN_TYPE),
    )
    return pa.ListArray.from_arrays(pa.array(offsets), struct)


def synth_corpus_dataset(sf_dir: str, *, seed: int = 42, pages_per_doc: int = 1, raw: bool = False):
    """Distributed corpus synthesis: read driver documents -> interleaved docs.

    Returns a lazy ``ray.data.Dataset`` with DOC_SCHEMA. Column-pruned
    read (only doc_id+text leave storage).
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        synth_batch,
        batch_format="pyarrow",
        fn_kwargs={"seed": seed, "pages_per_doc": pages_per_doc, "raw": raw},
    )


# ---------------------------------------------------------------------------
# OCR-variant synthesis (FIXTURES.md F2): N corrupted channels per doc


# per-source character corruption tables: small, known Levenshtein distances
CORRUPTIONS = {
    "OCR-1": [("e", "c"), ("a", "o")],
    "OCR-2": [("t", "l"), ("n", "u")],
    "GT": [],
}


def corrupt_text(text: str, source: str, doc_id: str, seed: int = 42, rate: float = 0.35) -> str:
    """Deterministic per-(doc,source) character corruption.

    Applies each (src, dst) substitution to a seeded subset of
    occurrences, so variant distances are small and known — exercising
    the aligner's exact/lev<=1/lev<=3 matching tiers
    (reference align/cli.py:203-245).
    """
    table = CORRUPTIONS.get(source, [])
    if not table:
        return text
    rng = np.random.default_rng((stable_hash64(doc_id + "/" + source) ^ seed) & 0xFFFFFFFFFFFF)
    chars = list(text)
    for src, dst in table:
        for i, ch in enumerate(chars):
            if ch == src and rng.random() < rate:
                chars[i] = dst
    return "".join(chars)


def synth_variants_batch(batch: pa.Table, *, sources=("OCR-1", "OCR-2", "GT"), seed: int = 42) -> pa.Table:
    """Interleaved docs -> long-form OCR variant lines.

    Output one row per (doc_id, source, line): columns
    (doc_id, source, line_no:int32, text, conf:float32). GT keeps the
    original line text with conf 1.0 (reference align/cli.py:158-159);
    OCR sources get corrupted text with a deterministic pseudo-conf.
    """
    doc_ids = batch["doc_id"].to_pylist()
    spans = batch["spans"].to_pylist()
    out = {"doc_id": [], "source": [], "line_no": [], "text": [], "conf": []}
    for did, sp in zip(doc_ids, spans):
        lines = [s["text"] for s in sp if s["kind"] == "line"]
        for source in sources:
            for ln, lt in enumerate(lines):
                ct = corrupt_text(lt, source, did, seed)
                conf = 1.0 if source == "GT" else round(0.5 + (stable_hash32(f"{did}/{source}/{ln}") % 500) / 1000.0, 3)
                out["doc_id"].append(did)
                out["source"].append(source)
                out["line_no"].append(ln)
                out["text"].append(ct)
                out["conf"].append(conf)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "line_no": pa.array(out["line_no"], pa.int32()),
            "text": pa.array(out["text"], pa.string()),
            "conf": pa.array(out["conf"], pa.float32()),
        }
    )
