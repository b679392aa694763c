"""URL canonicalization + blocklist + URL-dedup (stages/urlfilter.py).

Pins each canonicalization rule individually (case-fold, www. strip,
default-port drop vs explicit-port keep, duplicate-slash collapse,
trailing-slash strip, utm_* removal with order-preserved survivors,
fragment drop), the synthesizer/oracle structural contract, and the
distributed operator end-to-end (blocklist + min-doc_id keeper)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ocrd_cis_ray.stages.urlfilter import (
    canonicalize_urls,
    synthesize_urls_batch,
    url_domain,
)


def _canon(u: str) -> str:
    return canonicalize_urls(pa.array([u])).to_pylist()[0]


def test_canonicalize_rules():
    assert _canon("HTTP://WWW.Example.COM/a") == "http://example.com/a"
    assert _canon("http://example.com:80/a") == "http://example.com/a"
    assert _canon("https://example.com:443/a") == "https://example.com/a"
    # non-default ports survive
    assert _canon("https://example.com:8443/a") == "https://example.com:8443/a"
    # http's default is not https's
    assert _canon("https://example.com:80/a") == "https://example.com:80/a"
    assert _canon("http://example.com//a///b/") == "http://example.com/a/b"
    assert _canon("https://example.com/") == "https://example.com"
    assert (
        _canon("https://example.com/a?utm_source=x&id=1&utm_b=2&z=3#frag")
        == "https://example.com/a?id=1&z=3"
    )
    # all-tracking query vanishes entirely (no dangling '?')
    assert _canon("https://example.com/a?utm_a=1&utm_b=2") == "https://example.com/a"
    # m. subdomain is NOT stripped (only www.)
    assert _canon("https://m.example.com/a") == "https://m.example.com/a"


def test_url_domain():
    canon = canonicalize_urls(
        pa.array(["https://a.example.com:8443/x?q=1", "http://b.org"])
    )
    assert url_domain(canon).to_pylist() == ["a.example.com", "b.org"]


def test_synthesizer_matches_structural_canon():
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(120, dtype=np.int64)),
            "source": pa.array([f"src{i % 6}" for i in range(120)]),
        }
    )
    s = synthesize_urls_batch(t)
    canon = canonicalize_urls(s["url"]).to_pylist()
    for did, c in zip(range(120), canon):
        scheme = "http" if did % 3 == 0 else "https"
        host = ("m." if did % 4 == 3 else "") + f"src{did % 6}-news.com"
        page = did % 50
        assert c == f"{scheme}://{host}/articles/item/{page}?id={page}"


def test_filter_urls_ray(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.urlfilter import filter_urls, synthesize_urls

    df = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "source": [f"src{i % 3}" for i in range(200)],
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    out = (
        filter_urls(synthesize_urls(ds), ["src1-news.com", "m.src1-news.com"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 200
    # blocklist: every src1 doc flagged, others kept
    assert (out["keep_url"] == ~out["domain"].str.contains("src1")).all()
    # keeper flag: exactly min doc_id per canonical URL
    want_first = out.groupby("url_canon")["doc_id"].transform("min")
    assert (out["is_canonical"] == (out["doc_id"] == want_first)).all()
    # canonical URLs genuinely collide (the dedup has real work)
    assert (~out["is_canonical"]).sum() > 0


def test_composed_gate_precedence(ray_session):
    """q88 semantics: first failing gate names the drop_stage, URL
    gates precede text gates (FineWeb pipeline order)."""
    import __ray_entry__ as m

    out = (
        m.queries()["q88_webcorpus_gates"]("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("doc_id")
    )
    assert set(out["drop_stage"]) <= {
        "url_blocked", "url_duplicate", "gopher", "repetition",
        "duplicate", "kept",
    }
    blocked = out[out["keep_url"] == 0]
    assert (blocked["drop_stage"] == "url_blocked").all()
    dup_url = out[(out["keep_url"] == 1) & (out["url_canonical"] == 0)]
    assert (dup_url["drop_stage"] == "url_duplicate").all()
    kept = out[out["keep"] == 1]
    assert (
        (kept[["keep_url", "url_canonical", "pass_gopher",
               "pass_repetition", "text_canonical"]] == 1)
        .all()
        .all()
    )


def test_userinfo_cannot_mask_the_real_host():
    # "blocked.com@evil.com" must parse host=evil.com (userinfo is
    # discarded), or a blocklist knowing evil.com is bypassed
    c = _canon("https://blocked.com@evil.com/x")
    assert c == "https://evil.com/x"
    assert url_domain(pa.array([c])).to_pylist() == ["evil.com"]
    c2 = _canon("https://user:pw@site.com:443/a")
    assert c2 == "https://site.com/a"


def test_unparseable_urls_fail_the_gate_not_the_dedup(ray_session):
    import ray.data as rd

    from ocrd_cis_ray.stages.urlfilter import filter_urls

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "url": [
                "https://ok.com/a",
                "not-a-url",  # unparseable -> keep_url False, NOT a dup
                "not-a-url",  # identical raw strings still dedup
                "mailto:x@y.z",  # no authority -> unparseable here
            ],
        }
    )
    out = (
        filter_urls(rd.from_pandas(df), ["blocked.com"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["keep_url"].tolist() == [True, False, False, False]
    # raw string is the fallback group key: rows keep a non-null canon
    assert out["url_canon"].notna().all()
    assert out.loc[1, "is_canonical"] and not out.loc[2, "is_canonical"]


def test_gate_chain_robots_branch_precedence(ray_session):
    """q97 semantics on the fused path: robots_blocked precedes every
    curation stage, robots gates the CANONICAL url (tracking params /
    explicit default port must not defeat a path rule), and kept
    implies every gate passed."""
    import ray.data as rd

    from ocrd_cis_ray.stages.curation import gate_chain

    # varied words: repeated-token text would fail the repetition gate
    good = " ".join(f"word{i}" for i in range(60))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [good, good + "x", good + "y", good + "z"],
            "url": [
                # noise forms of a robots-disallowed path: the rule
                # 'Disallow: /private/' must still match after canon
                "https://a.com:443/private/p?utm_source=x",
                "https://WWW.a.com/private//q",
                "https://a.com/open/r",
                "https://b.com/anything",  # no robots for b.com -> allowed
            ],
        }
    )
    robots = {"a.com": "User-Agent: *\nDisallow: /private/\n"}
    out = (
        gate_chain(
            rd.from_pandas(df),
            blocked_domains=["b.com"],
            robots_map=robots,
            gopher_kwargs={"min_stop_distinct": 0, "min_words": 5},
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["robots_allowed"].tolist() == [0, 0, 1, 1]
    # robots_blocked wins over url_blocked (doc 3 is BOTH robots-allowed
    # and blocklisted -> url_blocked; docs 0/1 robots-blocked)
    assert out["drop_stage"].tolist()[:2] == ["robots_blocked"] * 2
    assert out.loc[3, "drop_stage"] == "url_blocked"
    kept = out[out["keep"] == 1]
    assert (
        (kept[["robots_allowed", "keep_url", "url_canonical", "pass_gopher",
               "pass_repetition", "text_canonical"]] == 1).all().all()
    )
    assert out.loc[2, "keep"] == 1
