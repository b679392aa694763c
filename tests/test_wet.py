"""WET extracted-text container (sources/wet.py): spec framing,
refers-to round trip, hash fallback for real-world URLs, file-level
Ray ingestion."""

from __future__ import annotations

import pyarrow as pa

from ocrd_cis_ray.sources.warc import parse_warc
from ocrd_cis_ray.sources.wet import (
    read_wet,
    texts_from_wet,
    wet_shards_from_text,
)


def _shard(rows):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "url": [r[1] for r in rows],
            "content_text": [r[2] for r in rows],
        }
    )
    return wet_shards_from_text(t)


def test_wet_shard_structure_and_roundtrip():
    rows = [
        (7, "https://corpus.example/doc/7", "seven words here"),
        (8, "https://corpus.example/doc/8", "unicode œ—☃ text"),
    ]
    shard = _shard(rows)
    assert shard.column_names == ["shard_key", "wet", "n_pages"]
    assert shard["shard_key"][0].as_py() == 7
    assert shard["n_pages"][0].as_py() == 2
    payload = shard["wet"][0].as_py()
    assert payload[:2] == b"\x1f\x8b"  # per-record gzip members
    recs = parse_warc(payload)
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "conversion", "conversion"]
    conv = recs[1]
    assert conv["content_type"].startswith("text/plain")
    assert conv["refers_to"] == "urn:graft:doc:7"  # Refers-To round trip
    assert conv["body"] == "seven words here"
    # split back: warcinfo skipped, text and ids exact
    out = texts_from_wet(shard).to_pylist()
    assert out == [
        {"doc_id": 7, "url": rows[0][1], "text": rows[0][2]},
        {"doc_id": 8, "url": rows[1][1], "text": rows[1][2]},
    ]


def test_wet_real_world_url_gets_stable_hash_id():
    shard = _shard([(1, "https://example.com/a/b.html", "x")])
    out = texts_from_wet(shard).to_pylist()
    assert out[0]["doc_id"] > 0 and out[0]["doc_id"] != 1  # hash, not tail
    again = texts_from_wet(_shard([(1, "https://example.com/a/b.html", "x")]))
    assert again.to_pylist()[0]["doc_id"] == out[0]["doc_id"]  # stable


def test_wet_empty_batch():
    t = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "url": pa.array([], pa.string()),
         "content_text": pa.array([], pa.string())}
    )
    shard = wet_shards_from_text(t)
    assert shard["shard_key"][0].as_py() == -1
    assert texts_from_wet(shard).num_rows == 0


def test_read_wet_file_ingestion(tmp_path):
    import ray.data as rd

    rows = [(i, f"https://corpus.example/doc/{i}", f"text {i}") for i in range(20)]
    for half in (rows[:10], rows[10:]):
        shard = _shard(half)
        p = tmp_path / f"part-{half[0][0]}.warc.wet.gz"
        p.write_bytes(shard["wet"][0].as_py())
    out = read_wet(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert len(out) == 20
    assert list(out["text"]) == [f"text {i}" for i in range(20)]
