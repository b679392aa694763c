"""HTML metadata extraction (stages/webmeta.py) and the sitemap XML
container (sources/sitemap.py): parser hazards the structural oracles
cannot see, escaping round trips, file ingestion."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ocrd_cis_ray.sources.sitemap import (
    parse_sitemap,
    read_sitemaps,
    sitemap_shards_from_urls,
    urls_from_sitemaps,
    write_sitemap,
)
from ocrd_cis_ray.stages.webmeta import _MetaParser, extract_metadata_batch


# ---------------------------------------------------------------------------
# metadata


def _meta(html: str) -> dict:
    return _MetaParser().feed_doc(html)


def test_title_normalized_and_entities():
    m = _meta("<title>  A &amp;\n  B </title>")
    assert m["title"] == "A & B"


def test_first_occurrence_wins():
    html = (
        '<meta name="author" content="First">'
        '<meta name="author" content="Second">'
        '<link rel="canonical" href="/one"><link rel="canonical" href="/two">'
    )
    m = _meta(html)
    assert m["author"] == "First" and m["canonical"] == "/one"


def test_property_vs_name_and_case():
    m = _meta('<META PROPERTY="og:type" CONTENT="article">')
    assert m["og_type"] == "article"  # HTMLParser lowercases tags/attrs


def test_first_title_element_wins():
    # inline-SVG titles later in the body must not append (browser rule)
    m = _meta("<title>Home</title><svg><title>menu icon</title></svg>")
    assert m["title"] == "Home"
    m2 = _meta("<title></title><title>second</title>")
    assert m2["title"] == ""  # first element wins even when empty


def test_missing_fields_empty():
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "html": ["<p>x</p>"]})
    row = extract_metadata_batch(t).to_pylist()[0]
    assert row == {"doc_id": 1, "title": "", "author": "",
                   "canonical": "", "og_type": ""}


def test_empty_content_meta_ignored():
    m = _meta('<meta name="author" content=""><meta name="author" content="X">')
    assert m["author"] == "X"


# ---------------------------------------------------------------------------
# sitemap


def test_sitemap_roundtrip_with_escaping():
    entries = [
        {"loc": "https://h.com/a?x=1&y=2", "lastmod": "2026-01-05",
         "priority": 0.7},
        {"loc": "https://h.com/<odd>", "lastmod": "", "priority": None},
    ]
    out = parse_sitemap(write_sitemap(entries))
    assert out[0] == {"loc": "https://h.com/a?x=1&y=2",
                      "lastmod": "2026-01-05", "priority": 0.7}
    assert out[1] == {"loc": "https://h.com/<odd>", "lastmod": "",
                      "priority": None}


def test_sitemap_namespace_required():
    xml = b'<?xml version="1.0"?><urlset><url><loc>x</loc></url></urlset>'
    assert parse_sitemap(xml) == []  # no-namespace urlset: entries invisible


def test_sitemap_malformed_raises():
    with pytest.raises(Exception):
        parse_sitemap(b"<urlset><url>")


def test_doc_id_recovery_rules():
    t = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "loc": ["https://h.com/7?a=1", "https://h.com/page"],
            "lastmod": ["", ""],
            "priority": pa.array([0.5, 0.5], pa.float64()),
        }
    )
    out = urls_from_sitemaps(sitemap_shards_from_urls(t)).to_pylist()
    assert out[0]["doc_id"] == 7  # trailing path int before query
    assert out[1]["doc_id"] == -1  # no int tail


def test_read_sitemaps_file_ingestion(tmp_path):
    for lo in (0, 10):
        t = pa.table(
            {
                "doc_id": pa.array(list(range(lo, lo + 10)), pa.int64()),
                "loc": [f"https://h.com/{i}" for i in range(lo, lo + 10)],
                "lastmod": ["2026-01-01"] * 10,
                "priority": pa.array([0.5] * 10, pa.float64()),
            }
        )
        shard = sitemap_shards_from_urls(t)
        (tmp_path / f"sitemap-{lo}.xml").write_bytes(
            shard["sitemap"][0].as_py())
    out = read_sitemaps(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert len(out) == 20 and list(out["doc_id"]) == list(range(20))
