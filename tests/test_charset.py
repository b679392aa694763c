"""Charset sniff/decode (stages/charset.py): sniff precedence, decode
correctness, and the ray e2e path."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ocrd_cis_ray.stages.charset import (
    MARKER,
    detect_and_decode,
    detect_decode_batch,
    sniff_charset,
    synthesize_encoded_batch,
)


@pytest.mark.parametrize(
    "data,want",
    [
        (b"\xef\xbb\xbfhello", "utf-8-sig"),
        ("x".encode("utf-16"), "utf-16"),  # LE BOM on this platform
        (b"\xfe\xff\x00x", "utf-16"),  # BE BOM
        (b"plain ascii", "utf-8"),
        ("héllo".encode("utf-8"), "utf-8"),
        ("héllo".encode("latin-1"), "latin-1"),  # 0xE9 invalid UTF-8 here
        (b"\xff\x00", "latin-1"),  # garbage never fails
        (b"", "utf-8"),
    ],
)
def test_sniff_precedence(data, want):
    assert sniff_charset(data) == want


def test_bom_stripped_on_decode():
    t = pa.table(
        {"doc_id": pa.array([0], pa.int64()),
         "payload": pa.array([b"\xef\xbb\xbfabc"], pa.large_binary())}
    )
    out = detect_decode_batch(t).to_pylist()[0]
    assert out == {"doc_id": 0, "charset": "utf-8-sig", "text": "abc"}


def test_synthesize_detect_all_four_charsets():
    t = pa.table(
        {"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
         "text": ["a", "b", "c", "d"]}
    )
    out = detect_decode_batch(synthesize_encoded_batch(t)).to_pylist()
    assert [r["charset"] for r in out] == [
        "utf-8-sig", "utf-16", "latin-1", "utf-8"]
    assert [r["text"] for r in out] == [c + MARKER for c in "abcd"]


def test_lying_bom_never_crashes():
    # a valid BOM followed by bytes invalid in that encoding (truncated
    # or mislabeled crawl content) must decode with replacement, not
    # kill the task
    t = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         "payload": pa.array(
             [b"\xef\xbb\xbf\xffabc", b"\xff\xfe\x41\x00\x42"],
             pa.large_binary())}
    )
    out = detect_decode_batch(t).to_pylist()
    assert out[0]["charset"] == "utf-8-sig"
    assert "abc" in out[0]["text"] and "�" in out[0]["text"]
    assert out[1]["charset"] == "utf-16"  # odd byte count: truncated
    assert out[1]["text"].startswith("A")


def test_ray_e2e_roundtrip():
    import ray.data as rd

    rows = [{"doc_id": i, "text": f"doc {i} Ünïcode"} for i in range(40)]
    ds = rd.from_items(rows).repartition(4).map_batches(
        synthesize_encoded_batch, batch_format="pyarrow")
    out = detect_and_decode(ds).to_pandas().sort_values("doc_id")
    assert list(out["text"]) == [f"doc {i} Ünïcode{MARKER}" for i in range(40)]


def test_non_latin1_text_falls_back_to_utf8():
    # the Latin-1 slot can't carry CJK/em dashes — the synthesizer
    # picks UTF-8 instead (as a real encoder would) and the sniff
    # detects exactly that, text intact
    t = pa.table({"doc_id": pa.array([2, 6], pa.int64()),
                  "text": ["漢字 — test", "plain"]})
    out = detect_decode_batch(synthesize_encoded_batch(t)).to_pylist()
    assert out[0]["charset"] == "utf-8"
    assert out[0]["text"] == "漢字 — test" + MARKER
    assert out[1]["charset"] == "latin-1"  # still latin-1 when it fits
