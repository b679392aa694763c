"""CDX index tier: SURT keys, byte-exact member offsets, record seek."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocrd_cis_ray.sources.cdx import (
    cdx_index_batch,
    cdx_lines_batch,
    index_warc,
    iter_gzip_members,
    seek_record,
    surt,
)
from ocrd_cis_ray.sources.warc import write_warc


def _records(n=5, payload=lambda i: f"<html>doc {i}</html>"):
    recs = [
        {
            "warc_type": "warcinfo",
            "record_id": "urn:x:info",
            "payload": "software: test\r\n",
        }
    ]
    for i in range(n):
        recs.append(
            {
                "warc_type": "response",
                "url": f"https://corpus.example/doc/{i}",
                "date": "2026-01-01T00:00:00Z",
                "record_id": f"urn:x:{i}",
                "payload": payload(i),
            }
        )
    return recs


def test_surt_canonicalization():
    assert surt("https://www.Example.COM:443/A/b?z=1&a=2") == "com,example)/a/b?a=2&z=1"
    assert surt("http://example.com") == "com,example)/"
    assert surt("http://example.com:8080/x") == "com,example:8080)/x"
    assert surt("https://user:pw@sub.host.org/p#frag") == "org,host,sub)/p"
    assert surt("https://corpus.example/doc/7") == "example,corpus)/doc/7"
    # unparseable stays total and deterministic
    assert surt("not-a-url") == "not-a-url"
    assert surt("mailto:x@y.z") == "mailto:x@y.z"


def test_gzip_members_tile_the_shard_exactly():
    shard = write_warc(_records(4), gzip_per_record=True)
    members = list(iter_gzip_members(shard))
    assert len(members) == 5  # warcinfo + 4 responses
    pos = 0
    for off, length, plain in members:
        assert off == pos and length > 0
        assert plain.startswith(b"WARC/1.0")
        pos = off + length
    assert pos == len(shard)


def test_index_and_seek_roundtrip(tmp_path):
    shard = write_warc(_records(6), gzip_per_record=True)
    entries = [e for e in index_warc(shard) if e["warc_type"] == "response"]
    assert len(entries) == 6
    for i, e in enumerate(entries):
        assert e["urlkey"] == f"example,corpus)/doc/{i}"
        assert e["status"] == 200 and e["mime"] == "text/html"
        rec = seek_record(shard, e["offset"], e["length"])
        assert rec["url"] == f"https://corpus.example/doc/{i}"
        assert hashlib.sha256(rec["body"].encode()).hexdigest() == e["digest"]
    # range-request semantics against a FILE: seek(offset) + read(length)
    p = tmp_path / "shard.warc.gz"
    p.write_bytes(shard)
    e = entries[3]
    with open(p, "rb") as f:
        f.seek(e["offset"])
        member = f.read(e["length"])
    rec = seek_record(member, 0, len(member))
    assert rec["body"] == "<html>doc 3</html>"


def test_index_plain_uncompressed_warc():
    shard = write_warc(_records(3), gzip_per_record=False)
    entries = [e for e in index_warc(shard) if e["warc_type"] == "response"]
    assert [e["urlkey"] for e in entries] == [
        f"example,corpus)/doc/{i}" for i in range(3)
    ]
    for e in entries:
        rec = seek_record(shard, e["offset"], e["length"])
        assert hashlib.sha256(rec["body"].encode()).hexdigest() == e["digest"]


def test_truncated_member_raises():
    shard = write_warc(_records(2), gzip_per_record=True)
    with pytest.raises(ValueError):
        list(iter_gzip_members(shard[:-10]))


def test_cdx_index_batch_seek_ok_and_lines(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.sources.warc import warc_shards_from_html

    df = pd.DataFrame(
        {
            "doc_id": np.arange(20, dtype=np.int64),
            "html": [f"<html><p>page {i}</p></html>" for i in range(20)],
        }
    )
    idx = (
        rd.from_pandas(df)
        .repartition(4)
        .map_batches(warc_shards_from_html, batch_format="pyarrow")
        .map_batches(cdx_index_batch, batch_format="pyarrow")
    )
    out = idx.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == list(range(20))
    assert out["seek_ok"].all()
    assert (out["status"] == 200).all() and (out["mime"] == "text/html").all()
    assert (out["urlkey"] == [f"example,corpus)/doc/{i}" for i in range(20)]).all()
    lines = cdx_lines_batch(pa.Table.from_pandas(out))
    s = lines["cdx"].to_pylist()[0]
    assert s.startswith("example,corpus)/doc/0 200 text/html ")
    assert len(s.split(" ")) == 6
