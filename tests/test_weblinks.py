"""Outlink/anchor extraction (stages/weblinks.py): parser hazards the
q91 oracle cannot see, RFC 3986 href resolution, and the ray e2e path."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ocrd_cis_ray.stages.weblinks import (
    _LinkParser,
    extract_links,
    extract_links_batch,
    resolve_href,
)

BASE = "https://src3-news.com/articles/item/7?id=7"


# ---------------------------------------------------------------------------
# href resolution (RFC 3986 §5)


@pytest.mark.parametrize(
    "href,want",
    [
        ("https://other.com/x", "https://other.com/x"),  # absolute
        ("mailto:a@b.c", "mailto:a@b.c"),  # non-http scheme kept
        ("media://doc/3/fig0", "media://doc/3/fig0"),
        ("//cdn.example.com/a.js", "https://cdn.example.com/a.js"),
        ("/top", "https://src3-news.com/top"),  # root-relative
        ("next", "https://src3-news.com/articles/item/next"),  # relative
        ("../up", "https://src3-news.com/articles/up"),  # dot segments
        ("./here", "https://src3-news.com/articles/item/here"),
        ("?page=2", "https://src3-news.com/articles/item/7?page=2"),
        ("/a#frag", "https://src3-news.com/a"),  # fragment dropped
        # same-document reference: base URI INCLUDING its query (§5.3)
        ("#sec", "https://src3-news.com/articles/item/7?id=7"),
        ("/a/b/../../c", "https://src3-news.com/c"),
        ("/a/..", "https://src3-news.com/"),  # trailing .. keeps slash
    ],
)
def test_resolve_href(href, want):
    assert resolve_href(BASE, href) == want


def test_resolve_unparseable_base_keeps_href():
    assert resolve_href("not a url", "/x") == "/x"


# ---------------------------------------------------------------------------
# parser


def _links(html: str):
    return _LinkParser().feed_doc(html)


def test_anchor_text_normalized_and_escaped():
    got = _links('<a href="/x">  A &amp;\n  B </a>')
    assert got == [("a", "/x", "A & B")]


def test_nested_markup_inside_anchor():
    got = _links('<a href="/x">read <b>more</b> now</a>')
    assert got == [("a", "/x", "read more now")]


def test_img_inside_anchor_orders_anchor_first():
    got = _links('<a href="/x"><img src="/i.png" alt="pic">cap</a>')
    assert got == [("a", "/x", "cap"), ("img", "/i.png", "pic")]


def test_anchor_without_href_and_script_links_skipped():
    html = (
        '<a name="top">no link</a>'
        '<script>var a = \'<a href="/fake">x</a>\';</script>'
        '<a href="/real">ok</a>'
    )
    assert _links(html) == [("a", "/real", "ok")]


def test_img_without_src_skipped_and_missing_alt_empty():
    assert _links('<img alt="x"><img src="/i">') == [("img", "/i", "")]


def test_document_order_preserved():
    html = '<a href="/1">one</a><img src="/2"><a href="/3">three</a>'
    assert [h for _, h, _ in _links(html)] == ["/1", "/2", "/3"]


def test_unclosed_anchor_still_captured():
    got = _links('<p><a href="/x">dangling</p>')
    assert got == [("a", "/x", "dangling")]


# ---------------------------------------------------------------------------
# batch UDF + ray e2e


def test_extract_links_batch_schema_and_resolution():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "url": ["https://h.com/a/b", "https://h.com/"],
            "html": ['<a href="c">rel</a>', '<img src="/i.png" alt="z">'],
        }
    )
    out = extract_links_batch(t)
    assert out.column_names == [
        "doc_id", "link_no", "kind", "href", "url_target", "anchor",
    ]
    rows = out.to_pylist()
    assert rows[0]["url_target"] == "https://h.com/a/c"
    assert rows[0]["href"] == "c"  # raw attribute preserved
    assert rows[1] == {
        "doc_id": 2, "link_no": 0, "kind": "img", "href": "/i.png",
        "url_target": "https://h.com/i.png", "anchor": "z",
    }


def test_extract_links_ray_matches_local():
    import ray.data

    rows = [
        {"doc_id": i, "url": f"https://h{i}.com/d/p",
         "html": f'<a href="/l{i}">t{i}</a><img src="i{i}.png">'}
        for i in range(40)
    ]
    ds = ray.data.from_items(rows).repartition(4)
    got = sorted(
        extract_links(ds).to_pandas().itertuples(index=False),
        key=lambda r: (r.doc_id, r.link_no),
    )
    assert len(got) == 80
    for i in range(40):
        a, img = got[2 * i], got[2 * i + 1]
        assert (a.kind, a.url_target, a.anchor) == (
            "a", f"https://h{i}.com/l{i}", f"t{i}")
        assert (img.kind, img.url_target) == (
            "img", f"https://h{i}.com/d/i{i}.png")
