"""WARC/1.0 container codec + distributed ingestion (sources/warc.py).

Pins the record framing (CRLF headers, Content-Length payloads, HTTP
envelopes), the Common Crawl per-record-gzip-member layout, writer
determinism, error handling on damaged containers, and the file-level
`read_warc` ingestion path through Ray."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ocrd_cis_ray.sources.warc import (
    parse_warc,
    records_from_warc,
    warc_shards_from_html,
    write_warc,
)

_RECS = [
    {"warc_type": "warcinfo", "record_id": "urn:x:info",
     "payload": "software: test\r\n"},
    {"warc_type": "response", "url": "https://a/1", "record_id": "urn:x:1",
     "date": "2026-01-01T00:00:00Z",
     "payload": "<html><body>hello (world) \r\n multi\r\nline</body></html>"},
    {"warc_type": "response", "url": "https://a/2", "record_id": "urn:x:2",
     "payload": ""},
]


def test_round_trip_gzip_and_plain():
    for gz in (True, False):
        out = parse_warc(write_warc(_RECS, gzip_per_record=gz))
        assert [r["warc_type"] for r in out] == ["warcinfo", "response", "response"]
        assert out[1]["url"] == "https://a/1"
        assert out[1]["http_status"] == 200
        assert out[1]["body"] == _RECS[1]["payload"]  # CRLFs inside survive framing
        assert out[2]["body"] == ""
        assert out[1]["record_id"] == "urn:x:1"
        assert out[1]["date"] == "2026-01-01T00:00:00Z"


def test_writer_is_deterministic():
    assert write_warc(_RECS) == write_warc(_RECS)


def test_gzip_members_are_individually_framed():
    buf = write_warc(_RECS, gzip_per_record=True)
    # three records -> three gzip magics
    assert buf.count(b"\x1f\x8b\x08") == 3
    # a reader can start at the second member (record-level seek)
    second = buf.index(b"\x1f\x8b\x08", 1)
    out = parse_warc(buf[second:])
    assert [r["record_id"] for r in out] == ["urn:x:1", "urn:x:2"]


def test_damaged_containers_raise():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_warc(b"not a warc")
    buf = write_warc(_RECS, gzip_per_record=True)
    with _pytest.raises(ValueError):
        parse_warc(buf[:-20])  # truncated final member


def test_shard_pack_and_explode_batch_udfs():
    batch = pa.table(
        {
            "doc_id": pa.array([3, 4, 5], pa.int64()),
            "html": pa.array(["<p>a</p>", "<p>b</p>", "<p>c</p>"]),
        }
    )
    shard = warc_shards_from_html(batch)
    assert shard["n_pages"].to_pylist() == [3]
    back = records_from_warc(shard)
    assert back["doc_id"].to_pylist() == [3, 4, 5]
    assert back["url"].to_pylist()[0] == "https://corpus.example/doc/3"
    assert back["html"].to_pylist() == ["<p>a</p>", "<p>b</p>", "<p>c</p>"]


def test_read_warc_files_via_ray(ray_session, tmp_path):
    import ray.data as rd

    from ocrd_cis_ray.sources.warc import read_warc
    from ocrd_cis_ray.stages.webextract import synthesize_html

    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": [f"doc {i} body words here" for i in range(40)],
        }
    )
    shards = (
        synthesize_html(rd.from_pandas(df).repartition(4))
        .map_batches(warc_shards_from_html, batch_format="pyarrow")
        .to_pandas()
    )
    assert len(shards) >= 4  # one shard row per block-batch
    for i, row in shards.iterrows():
        (tmp_path / f"shard-{i:04d}.warc.gz").write_bytes(row["warc"])
    out = read_warc(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == list(range(40))
    assert out["html"].str.contains("<html").all()


def test_records_from_warc_tolerates_real_world_urls():
    # read_warc is the generic ingestion entry: URLs that don't end in
    # an integer (every real crawl URL) and records without a
    # Target-URI must yield stable hashed doc_ids, not a ValueError
    import pyarrow as pa

    from ocrd_cis_ray.sources.warc import records_from_warc, write_warc

    shard = write_warc(
        [
            {
                "warc_type": "response",
                "url": "https://example.com/index.html",
                "date": "2026-01-01T00:00:00Z",
                "record_id": "urn:x:1",
                "payload": "<html>a</html>",
            },
            {
                "warc_type": "response",
                "date": "2026-01-01T00:00:00Z",
                "record_id": "urn:x:2",
                "payload": "<html>b</html>",
            },
            {  # the synthetic scheme still round-trips exactly
                "warc_type": "response",
                "url": "https://corpus.example/doc/41",
                "date": "2026-01-01T00:00:00Z",
                "record_id": "urn:graft:doc:41",
                "payload": "<html>c</html>",
            },
        ],
        gzip_per_record=True,
    )
    out = records_from_warc(pa.table({"warc": pa.array([shard], pa.large_binary())}))
    ids = out["doc_id"].to_pylist()
    assert len(ids) == 3 and len(set(ids)) == 3
    assert all(i >= 0 for i in ids)
    assert ids[2] == 41
    # determinism: same shard, same ids
    again = records_from_warc(
        pa.table({"warc": pa.array([shard], pa.large_binary())})
    )
    assert again["doc_id"].to_pylist() == ids
