"""Recognizer actor (template OCR) and post-correction actor, plus the
chained render → recognize → postcorrect pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocrd_cis_ray.sources.media import encode_gray, render_line
from ocrd_cis_ray.stages.postcorrect import PostCorrector, learn_confusions, postcorrect_tokens
from ocrd_cis_ray.stages.recognize import Recognizer, recognize_lines


def test_recognizer_exact_on_clean_render():
    r = Recognizer()
    for text in ("hello world", "the quick brown fox", "a b c"):
        got, conf, words, _ = r.recognize_line(render_line(text))
        assert got == text
        assert conf > 0.9
        assert [w["text"] for w in words] == text.split()


def test_recognizer_word_confidence_semantics():
    r = Recognizer()
    _, _, words, _ = r.recognize_line(render_line("word"))
    # word conf = (min+max)/2 of glyph confs — for a perfect match all
    # glyph confs are 1.0
    assert words[0]["conf"] == pytest.approx(1.0, abs=1e-5)
    assert words[0]["x0"] >= 0


def test_recognizer_actor_stage(ray_session):
    import ray.data as rd

    rows = [
        {
            "doc_id": f"d{i}",
            "span_id": f"s{i}",
            "pixels": encode_gray(render_line(f"line {i} text")),
        }
        for i in range(8)
    ]
    out = recognize_lines(rd.from_arrow(pa.Table.from_pylist(rows)), concurrency=2, batch_size=4).to_pandas()
    assert list(out.sort_values("doc_id")["text"]) == [f"line {i} text" for i in range(8)]


LEXICON = {"hello": 50, "world": 40, "quick": 20, "brown": 20, "fox": 10, "the": 100}


def test_postcorrector_corrects_known_errors():
    pc = PostCorrector(LEXICON)
    cands = pc.candidates("hcllo")
    assert cands and cands[0][0] == "hello" and cands[0][1] == 1
    cands = pc.candidates("wrld")  # deletion
    assert cands and cands[0][0] == "world"
    assert pc.candidates("zzzzzz") == []  # nothing within distance 2


def test_postcorrector_channel_model_prefers_seen_confusion():
    # 'c'->'e' is a known OCR confusion; token 'thc' should prefer 'the'
    lex = {"the": 100, "thy": 100}  # equal priors: channel model decides
    pc_with = PostCorrector(lex, {("c", "e"): 0.9})
    cands = pc_with.candidates("thc")
    assert cands[0][0] == "the"
    pc_against = PostCorrector(lex, {("c", "y"): 0.9})
    cands = pc_against.candidates("thc")
    assert cands[0][0] == "thy"


def test_postcorrector_max_candidates():
    lex = {f"word{c}": 10 for c in "abcdefghijklmn"}
    pc = PostCorrector(lex, max_candidates=10)
    cands = pc.candidates("word")
    assert len(cands) == 10


def test_postcorrect_stage(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": "d0", "line_no": 0, "word_no": 0, "token": "hcllo"},
        {"doc_id": "d0", "line_no": 0, "word_no": 1, "token": "world"},
    ]
    out = (
        postcorrect_tokens(rd.from_items(rows), LEXICON, concurrency=1)
        .to_pandas()
        .sort_values("word_no")
    )
    assert list(out["corrected"]) == ["hello", "world"]
    assert list(out["suspicious"]) == [True, False]
    assert len(out["candidates"].iloc[0]) >= 1


def test_learn_confusions(ray_session):
    import ray.data as rd

    pairs = rd.from_items(
        [
            {"text": "hcllo", "gt_text": "hello"},
            {"text": "wcrld", "gt_text": "world"},
            {"text": "same", "gt_text": "same"},
        ]
    )
    conf = learn_confusions(pairs)
    assert conf.get(("c", "e")) == pytest.approx(0.5)
    assert conf.get(("c", "o")) == pytest.approx(0.5)


def test_full_ocr_chain(ray_session):
    """render (with noise) → recognize actor → postcorrect actor: the
    reference's recognize→align→postcorrect flow, single-source."""
    import ray.data as rd

    texts = ["hello world", "the quick brown fox"]
    rows = [
        {"doc_id": f"d{i}", "span_id": "s0", "pixels": encode_gray(render_line(t))}
        for i, t in enumerate(texts)
    ]
    rec = recognize_lines(rd.from_arrow(pa.Table.from_pylist(rows)), concurrency=1)

    def to_tokens(b):
        out = {"doc_id": [], "line_no": [], "word_no": [], "token": []}
        for did, words in zip(b["doc_id"].to_pylist(), b["words"].to_pylist()):
            for wn, w in enumerate(words):
                out["doc_id"].append(did)
                out["line_no"].append(0)
                out["word_no"].append(wn)
                out["token"].append(w["text"])
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"]),
                "line_no": pa.array(out["line_no"], pa.int32()),
                "word_no": pa.array(out["word_no"], pa.int32()),
                "token": pa.array(out["token"]),
            }
        )

    tokens = rec.map_batches(to_tokens, batch_format="pyarrow")
    corrected = postcorrect_tokens(tokens, LEXICON, concurrency=1).to_pandas()
    got = corrected.sort_values(["doc_id", "word_no"]).groupby("doc_id")["corrected"].apply(" ".join)
    assert got["d0"] == "hello world"
    assert got["d1"] == "the quick brown fox"


RANK_LEX = {
    "smite": 50, "hello": 100, "world": 80, "crown": 40, "plane": 40,
    "stone": 40, "grape": 40, "mouse": 40, "house": 40, "track": 40,
    "bring": 40, "shine": 40, "feast": 40, "globe": 40,
}
# keep cases: OOV tokens both engines agree on (GT = the token itself);
# the fixed vote mangles them into the nearest lexicon word
_KEEP = ["smith", "hella", "worla", "crowd", "plant", "stony"]
# error cases: the peer engine (and GT) name the right lexicon word
_ERR = [
    ("wxrld", "world"), ("hxllo", "hello"), ("crxwn", "crown"),
    ("plxne", "plane"), ("stxne", "stone"), ("grxpe", "grape"),
    ("mxuse", "mouse"), ("trxck", "track"), ("brxng", "bring"),
    ("shxne", "shine"), ("fxast", "feast"), ("glxbe", "globe"),
]


def _ranker_lines():
    rows = [{"text": t, "peer_text": t, "gt_text": t} for t in _KEEP]
    rows += [{"text": t, "peer_text": gt, "gt_text": gt} for t, gt in _ERR]
    return rows


def test_train_ranker_learns_keep_decision(ray_session):
    """The learned decision-maker (reference dmFeatures: runDM decides
    whether the top candidate is applied, postcorrect/cli.py:34-39)
    keeps agreed-on OOV tokens the fixed vote would mangle."""
    import ray.data as rd

    from ocrd_cis_ray.stages.postcorrect import train_ranker

    w = train_ranker(rd.from_items(_ranker_lines()), RANK_LEX, concurrency=1)
    assert w is not None

    batch = pa.table(
        {
            "doc_id": ["d"] * 2, "line_no": pa.array([0, 0], pa.int32()),
            "word_no": pa.array([0, 1], pa.int32()),
            "token": ["smith", "wxrld"], "peer": ["smith", "world"],
        }
    )
    fixed = PostCorrector(RANK_LEX)(batch)["corrected"].to_pylist()
    learned = PostCorrector(RANK_LEX, ranker=w)(batch)["corrected"].to_pylist()
    assert fixed == ["smite", "world"]  # fixed vote mangles the OOV keep
    assert learned == ["smith", "world"]  # ranker keeps it, still corrects


def test_train_ranker_deterministic(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.postcorrect import train_ranker

    lines = _ranker_lines()
    w1 = train_ranker(rd.from_items(lines), RANK_LEX, concurrency=1)
    w2 = train_ranker(rd.from_items(list(reversed(lines))), RANK_LEX, concurrency=2)
    assert np.array_equal(w1, w2)


def test_train_ranker_gate_falls_back(ray_session):
    """Model selection: too few examples, or a learned decision that
    does not beat the fixed vote on the training sample, returns None
    (the chain then keeps the fixed vote)."""
    import ray.data as rd

    from ocrd_cis_ray.stages.postcorrect import train_ranker

    few = [{"text": "wxrld", "peer_text": "world", "gt_text": "world"}]
    assert train_ranker(rd.from_items(few), RANK_LEX, concurrency=1) is None
    # every GT is the rank-0 candidate -> fixed vote is already perfect
    perfect = [{"text": t, "peer_text": gt, "gt_text": gt} for t, gt in _ERR]
    assert train_ranker(rd.from_items(perfect), RANK_LEX, concurrency=1) is None


def test_recognizer_glyph_spans():
    """emit_glyphs surfaces one glyph per character with grid positions
    and per-char confidences (reference recognize.py:267-302 Glyph
    elements); word conf must equal (min+max)/2 over its glyph confs
    (recognize.py:263-265)."""
    r = Recognizer(emit_glyphs=True)
    text, _, words, glyphs = r.recognize_line(render_line("ab cd"))
    assert text == "ab cd"
    assert [g["text"] for g in glyphs] == ["a", "b", " ", "c", "d"]
    # positions: glyph grid stride, starting at the first word's x0
    xs = [int(g["x0"]) for g in glyphs]
    assert xs == [xs[0] + 8 * i for i in range(5)]
    assert xs[0] == int(words[0]["x0"])
    assert int(words[1]["x0"]) == xs[3]
    # word conf parity: (min+max)/2 of its glyph confs
    for w, lo, hi in ((words[0], 0, 2), (words[1], 3, 5)):
        gconfs = [float(g["conf"]) for g in glyphs[lo:hi]]
        assert float(w["conf"]) == pytest.approx((min(gconfs) + max(gconfs)) / 2)


def test_recognizer_glyph_stage(ray_session):
    """The actor-pool stage exposes the glyphs column when asked and
    keeps the q71 schema unchanged otherwise."""
    import ray.data as rd

    rows = [
        {
            "doc_id": 1,
            "span_id": "line-0",
            "pixels": encode_gray(render_line("hey you")),
        }
    ]
    ds = rd.from_items(rows)
    plain = recognize_lines(ds, concurrency=1, batch_size=8).take_all()
    assert "glyphs" not in plain[0]
    out = recognize_lines(ds, concurrency=1, batch_size=8, emit_glyphs=True).take_all()
    gs = out[0]["glyphs"]
    assert "".join(g["text"] for g in gs) == "hey you"
