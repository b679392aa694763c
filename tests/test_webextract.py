"""Main-content extraction: HTML boilerplate strip + PDF layout parse.

Pins (a) the exact-inversion contract both q44/q45 oracles rely on
(synthesize -> extract == whitespace-normalized source text), (b) each
individual DOM heuristic (structural ancestors, link density,
near-good smoothing, entity unescape, image spans), and (c) each
geometric layout heuristic (margin crop, running-header repeat drop,
page-number drop, interval-gap column detection, line clustering)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _doc_table(texts, start_id=0):
    return pa.table(
        {
            "doc_id": pa.array(
                np.arange(start_id, start_id + len(texts), dtype=np.int64)
            ),
            "text": pa.array(texts, pa.string()),
        }
    )


def _norm(s):
    return " ".join((s or "").split())


# ---------------------------------------------------------------------------
# HTML


def test_html_round_trip_exact():
    from ocrd_cis_ray.stages.webextract import _content_batch, synthesize_html_batch

    texts = [
        "The quick brown fox jumps over the lazy dog. " * 8,
        "short doc but above forty characters total!!",
        "  leading   and trailing   whitespace   everywhere   plus more words to cross the length floor  ",
        "",
        "one paragraph exactly, with punctuation; and <angle> & ampersand chars escaped properly in transit okay",
    ]
    t = _doc_table(texts)
    out = _content_batch(synthesize_html_batch(t))
    got = out["content_text"].to_pylist()
    for want, have in zip(texts, got):
        assert have == _norm(want)


def test_html_heuristics_unit():
    from ocrd_cis_ray.stages.webextract import _BlockParser, _classify

    page = (
        "<html><body>"
        "<nav><a href='/x'>Home</a> <a href='/y'>About</a></nav>"
        "<p>This is a long enough content paragraph that clears the "
        "forty character minimum length comfortably.</p>"
        "<p>tail</p>"  # short, link-free -> promoted by prev good
        "<div><a href='/r1'>link one</a> | <a href='/r2'>link two</a></div>"
        "<footer>copyright footer text</footer>"
        "</body></html>"
    )
    parser = _BlockParser()
    blocks = parser.feed_doc(page)
    good = _classify(blocks)
    texts = [b.text for b, ok in zip(blocks, good) if ok]
    assert texts == [
        "This is a long enough content paragraph that clears the forty "
        "character minimum length comfortably.",
        "tail",
    ]


def test_html_isolated_short_block_dropped():
    from ocrd_cis_ray.stages.webextract import _BlockParser, _classify

    page = (
        "<body><nav><a href='/x'>Home</a></nav>"
        "<p>orphan</p>"
        "<div><a href='/a'>aa</a> <a href='/b'>bb</a></div></body>"
    )
    blocks = _BlockParser().feed_doc(page)
    good = _classify(blocks)
    assert [ok for b, ok in zip(blocks, good) if b.text == "orphan"] == [False]


def test_html_spans_schema_and_images():
    from ocrd_cis_ray.stages.webextract import extract_main_batch, synthesize_html_batch

    # doc_id 0 -> s % 3 == 0 -> inline figure in main content
    t = _doc_table(["figure doc with plenty of words to pass the length gate"])
    spans = extract_main_batch(synthesize_html_batch(t))
    kinds = spans["kind"].to_pylist()
    assert kinds == ["region", "image"]
    assert spans["media_ref"].to_pylist()[1] == "media://doc/0/fig0"
    assert spans["offset"].to_pylist() == [0, 1]
    assert spans.schema.names == ["doc_id", "kind", "text", "media_ref", "offset"]


def test_html_entities_unescaped():
    from ocrd_cis_ray.stages.webextract import _content_batch, synthesize_html_batch

    text = "salt &amp; pepper <tags> stay literal when round-tripped here"
    out = _content_batch(synthesize_html_batch(_doc_table([text], start_id=1)))
    assert out["content_text"].to_pylist() == [_norm(text)]


def test_html_ray_pipeline(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.webextract import extract_main_content, synthesize_html

    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": [
                f"document number {i} with deterministic filler words "
                f"repeated enough times to be realistic {'lorem ipsum ' * (i % 5)}"
                for i in range(40)
            ],
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    out = extract_main_content(synthesize_html(ds)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out["content_text"]) == [_norm(t) for t in df["text"]]
    spans = extract_main_content(
        synthesize_html(rd.from_pandas(df.head(5))), mode="spans"
    ).to_pandas()
    assert set(spans["kind"]) <= {"region", "image"}
    assert len(spans) >= 5


# ---------------------------------------------------------------------------
# layout


def test_layout_round_trip_exact():
    from ocrd_cis_ray.stages.layout import reconstruct_batch, synthesize_layout_batch

    texts = [
        "word " * 300,  # multi-page
        "a compact single page document with a handful of words",
        "",
        "Supercalifragilisticexpialidocious antidisestablishmentarianism "
        "floccinaucinihilipilification plus ordinary words after the long ones",
    ]
    t = _doc_table(texts)
    out = reconstruct_batch(synthesize_layout_batch(t))
    for want, have in zip(texts, out["content_text"].to_pylist()):
        assert have == _norm(want)


def test_layout_headers_and_page_numbers_dropped():
    from ocrd_cis_ray.stages.layout import synthesize_layout_batch, reconstruct_batch

    t = _doc_table(["word " * 300])  # guaranteed multi-page
    bag = synthesize_layout_batch(t)["frags"].to_pylist()[0]
    n_pages = max(f["page"] for f in bag) + 1
    assert n_pages >= 2
    texts = {f["text"] for f in bag}
    assert "Doc 0 - internal draft" in texts and "1" in texts
    out = reconstruct_batch(synthesize_layout_batch(t))["content_text"].to_pylist()[0]
    assert "draft" not in out and out.split() == ["word"] * 300


def test_layout_column_order_is_column_major():
    from ocrd_cis_ray.stages.layout import (
        LINES_PER_COL,
        LINE_CHARS,
        reconstruct_batch,
        synthesize_layout_batch,
    )

    # enough single-char words that column 0 and column 1 both fill
    words = [f"w{i:03d}" for i in range(60)]
    t = _doc_table([" ".join(words)])
    out = reconstruct_batch(synthesize_layout_batch(t))["content_text"].to_pylist()[0]
    assert out.split() == words  # column-major order restored exactly


def test_layout_reconstruct_handles_empty_and_unknown(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.layout import reconstruct_reading_order, synthesize_layout

    df = pd.DataFrame(
        {
            "doc_id": np.arange(30, dtype=np.int64),
            "text": ["alpha beta gamma delta " * (i % 7) for i in range(30)],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = reconstruct_reading_order(synthesize_layout(ds)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out["content_text"]) == [_norm(t) for t in df["text"]]


# ---------------------------------------------------------------------------
# real PDF container codec (sources/pdf.py)


def test_pdf_writer_emits_valid_structure():
    from ocrd_cis_ray.sources.pdf import encode_pdf

    pdf = encode_pdf([[{"x": 10, "y": 30, "text": "hello"}],
                      [{"x": 10, "y": 30, "text": "world"}]])
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    assert b"/Type /Catalog" in pdf and b"/Count 2" in pdf
    assert b"/FlateDecode" in pdf and b"xref" in pdf and b"startxref" in pdf
    # xref offsets are byte-accurate: every listed offset lands on "N 0 obj"
    import re
    xref_at = int(pdf.rsplit(b"startxref", 1)[1].split()[0])
    lines = pdf[xref_at:].split(b"\n")
    n_objs = int(lines[1].split()[1])
    for num, ln in enumerate(lines[3 : 2 + n_objs], start=1):
        off = int(ln.split()[0])
        assert re.match(rb"%d 0 obj" % num, pdf[off:off + 20])


def test_pdf_round_trip_exact():
    from ocrd_cis_ray.sources.pdf import encode_pdf, parse_pdf
    from ocrd_cis_ray.stages.layout import _lay_out, _reconstruct_doc

    texts = [
        "",
        "one",
        "the quick brown fox jumps over the lazy dog " * 8,
        "alpha beta gamma delta epsilon zeta " * 40,  # multi-page
    ]
    for did, text in enumerate(texts):
        norm = _norm(text)
        frags = _lay_out(did, norm)
        n_pages = 1 + max((f["page"] for f in frags), default=0)
        pages = [[] for _ in range(n_pages)]
        for f in frags:
            pages[f["page"]].append(f)
        got = _reconstruct_doc(parse_pdf(encode_pdf(pages)))
        assert got == norm


def test_pdf_string_escaping_and_unicode():
    from ocrd_cis_ray.sources.pdf import encode_pdf, parse_pdf

    tricky = "par(en)s \\back\\slash\\ new\nline tab\t octal\x07 ümlaut €uro"
    out = parse_pdf(encode_pdf([[{"x": 5, "y": 20, "text": tricky}]]))
    assert [f["text"] for f in out] == [tricky]
    assert out[0]["x"] == 5.0 and out[0]["y"] == 20.0  # y back in top-down


def test_pdf_interpreter_foreign_operators():
    """The parser must handle text operators our writer never emits:
    relative moves (Td/TD/T*), leading (TL), quote shows, TJ kerning."""
    from ocrd_cis_ray.sources.pdf import PAGE_H, _interpret_content

    content = (b"BT /F1 12 Tf 20 TL 1 0 0 1 50 150 Tm (first) Tj "
               b"10 -20 Td (second) Tj T* (third) Tj (fourth) ' "
               b"[(kern) -500 (ed)] TJ ET")
    frags = _interpret_content(content, 3)
    assert [(f["text"], f["x"], f["y"]) for f in frags] == [
        ("first", 50.0, PAGE_H - 150.0),
        ("second", 60.0, PAGE_H - 130.0),
        ("third", 60.0, PAGE_H - 110.0),
        ("fourth", 60.0, PAGE_H - 90.0),
        ("kern", 60.0, PAGE_H - 90.0),
        # kern advance: -(-500)/1000 * 12pt = +6
        ("ed", 66.0, PAGE_H - 90.0),
    ]
    assert all(f["page"] == 3 for f in frags)


def test_pdf_parser_rejects_non_pdf_and_bad_filter():
    import pytest as _pytest

    from ocrd_cis_ray.sources.pdf import encode_pdf, parse_pdf

    with _pytest.raises(ValueError):
        parse_pdf(b"GIF89a not a pdf")
    pdf = encode_pdf([[{"x": 1, "y": 1, "text": "x"}]])
    with _pytest.raises(NotImplementedError):
        parse_pdf(pdf.replace(b"/FlateDecode", b"/LZWDecode\x20\x20"))


def test_pdf_ray_pipeline(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.layout import extract_pdf_text, synthesize_pdfs

    df = pd.DataFrame(
        {
            "doc_id": np.arange(24, dtype=np.int64),
            "text": ["omega psi chi phi " * (i % 9) for i in range(24)],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = extract_pdf_text(synthesize_pdfs(ds)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out["content_text"]) == [_norm(t) for t in df["text"]]


def test_pdf_parser_xref_path_and_damage_fallback():
    from ocrd_cis_ray.sources.pdf import _objects_via_xref, encode_pdf, parse_pdf

    pdf = encode_pdf([[{"x": 10, "y": 30, "text": "hello"}],
                      [{"x": 10, "y": 30, "text": "world"}]])
    # primary path: the byte-accurate xref resolves every object
    assert sorted(_objects_via_xref(pdf)) == [1, 2, 3, 4, 5, 6, 7]
    assert [f["text"] for f in parse_pdf(pdf)] == ["hello", "world"]
    # damaged startxref -> tolerant scan fallback still extracts
    damaged = pdf.replace(b"startxref", b"startxrEf")
    assert [f["text"] for f in parse_pdf(damaged)] == ["hello", "world"]
    # spurious obj-header-looking bytes are skipped, not fatal
    spurious = damaged.replace(b"%PDF-1.4\n", b"%PDF-1.4\n% 99 0 obj << /junk\n")
    assert [f["text"] for f in parse_pdf(spurious)] == ["hello", "world"]


def test_pdf_string_unknown_escapes_keep_the_char():
    # per spec, '\' before a non-escape char is dropped and the char
    # kept: '\8' -> '8' (8/9 are NOT octal digits; int(_, 8) used to
    # raise ValueError and fail the whole document)
    from ocrd_cis_ray.sources.pdf import _parse_string

    assert _parse_string(rb"(a\8b)", 0)[0] == "a8b"
    assert _parse_string(rb"(a\9)", 0)[0] == "a9"
    # octal stops at the first non-octal digit: '\19' = \1 then '9'
    assert _parse_string(rb"(\19)", 0)[0] == "\x019"
    assert _parse_string(rb"(\101)", 0)[0] == "A"


def test_pdf_indirect_length_is_resolved():
    # /Length as an indirect reference (common in real writers): the
    # two-pass scan resolves it through the object table instead of
    # trusting an endstream scan
    import re as _re

    from ocrd_cis_ray.sources.pdf import encode_pdf, parse_pdf

    pdf = encode_pdf([[{"x": 10, "y": 30, "text": "indirect"}]])
    m = _re.search(rb"/Length (\d+)", pdf)
    n = m.group(1)
    # swap in a reference and append the length object; offsets shift,
    # so the xref path fails and the tolerant scan (with resolution)
    # must carry it
    pdf2 = pdf[: m.start()] + b"/Length 99 0 R" + pdf[m.end():]
    pdf2 = pdf2.replace(
        b"%%EOF", b"99 0 obj\n" + n + b"\nendobj\n%%EOF"
    )
    frags = parse_pdf(pdf2)
    assert [f["text"] for f in frags] == ["indirect"]


def test_pdf_endstream_fallback_survives_payload_eol_and_inline_marker():
    import zlib as _z

    from ocrd_cis_ray.sources.pdf import _OBJ_RE, _object_header, _object_stream

    # payload's own trailing \n must survive (strip exactly ONE EOL —
    # the spec's pre-endstream EOL, not an rstrip of all CR/LF)
    data = b"5 0 obj\n<< >>\nstream\nABC\n\nendstream\nendobj"
    num, val, j = _object_header(data, _OBJ_RE.match(data))
    assert _object_stream(data, j, val) == b"ABC\n"

    # a literal 'endstream' INSIDE FlateDecode bytes (level-0 stored
    # block embeds the raw payload) must not truncate: candidates are
    # validated by decompression
    msg = b"xx endstream yy"
    comp = _z.compress(msg, 0)
    assert b"endstream" in comp
    data2 = (
        b"6 0 obj\n<< /Filter /FlateDecode >>\nstream\n"
        + comp
        + b"\nendstream\nendobj"
    )
    num2, val2, j2 = _object_header(data2, _OBJ_RE.match(data2))
    assert _z.decompress(_object_stream(data2, j2, val2)) == msg
