"""robots.txt gate (stages/robots.py): RFC 9309 parsing + matching
semantics the q92 oracle cannot see (wildcards, $ anchors, group
merging, unknown agents), the broadcast ceiling, and the ray e2e."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocrd_cis_ray.stages.robots import (
    _compile_rules,
    apply_robots,
    distinct_domains,
    evaluate_rules,
    parse_robots,
    select_group,
    synthesize_robots_txt,
)


def _verdict(txt: str, agent: str, path: str):
    grp = select_group(parse_robots(txt), agent)
    if not grp:
        return True, ""
    allowed, rule = evaluate_rules(
        _compile_rules(grp), np.array([path], object))
    return bool(allowed[0]), str(rule[0])


# ---------------------------------------------------------------------------
# parsing


def test_comments_blank_lines_mixed_case_crlf():
    txt = "# hi\r\nUser-AGENT: *\r\n\r\nDISALLOW: /a # inline\r\nallow: /a/b\r\n"
    grp = parse_robots(txt)["*"]
    assert grp == [(False, "/a"), (True, "/a/b")]


def test_consecutive_ua_lines_share_one_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    g = parse_robots(txt)
    assert g["a"] == g["b"] == [(False, "/x")]


def test_ua_after_rules_starts_new_group():
    txt = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    g = parse_robots(txt)
    assert g["a"] == [(False, "/x")] and g["b"] == [(False, "/y")]


def test_repeated_token_groups_combine():
    txt = "User-agent: a\nDisallow: /x\nUser-agent: a\nDisallow: /y\n"
    assert parse_robots(txt)["a"] == [(False, "/x"), (False, "/y")]


def test_empty_disallow_is_allow_all():
    assert parse_robots("User-agent: *\nDisallow:\n")["*"] == []


def test_utf8_bom_stripped():
    g = parse_robots("\ufeffUser-agent: *\nDisallow: /\n")
    assert g["*"] == [(False, "/")]


def test_sitemap_does_not_interrupt_ua_run():
    # RFC 9309 §2.2.4 / Google REP: non-group records must not split a
    # user-agent run — 'a' and 'b' form ONE group here
    txt = ("User-agent: a\nSitemap: https://e.com/s.xml\n"
           "User-agent: b\nDisallow: /x\nCrawl-delay: 5\nDisallow: /y\n")
    g = parse_robots(txt)
    assert g["a"] == g["b"] == [(False, "/x"), (False, "/y")]


# ---------------------------------------------------------------------------
# group selection + matching


def test_specific_group_overrides_star_not_merged():
    txt = "User-agent: ccbot\nDisallow: /only\nUser-agent: *\nDisallow: /\n"
    assert _verdict(txt, "CCBot/2.0", "/other") == (True, "")
    assert _verdict(txt, "ccbot", "/only/x")[0] is False
    # unknown agent falls back to * (blocked everywhere)
    assert _verdict(txt, "somebot", "/other")[0] is False


def test_longest_ua_token_wins():
    txt = ("User-agent: cc\nDisallow: /a\n"
           "User-agent: ccbot\nDisallow: /b\nUser-agent: *\nDisallow: /\n")
    assert _verdict(txt, "ccbot-news", "/a")[0] is True  # ccbot group only
    assert _verdict(txt, "ccbot-news", "/b")[0] is False


def test_no_rules_at_all_allows():
    assert _verdict("", "ccbot", "/x") == (True, "")
    assert _verdict("User-agent: googlebot\nDisallow: /\n", "ccbot", "/x")[0]


def test_longest_match_wins_and_tie_goes_to_allow():
    txt = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    assert _verdict(txt, "x", "/a/c") == (False, "disallow:/a")
    assert _verdict(txt, "x", "/a/b/c") == (True, "allow:/a/b")
    tie = "User-agent: *\nDisallow: /a/b\nAllow: /a/b\n"
    assert _verdict(tie, "x", "/a/b")[0] is True


def test_wildcard_and_dollar_anchor():
    txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/x\n"
    assert _verdict(txt, "x", "/docs/a.pdf")[0] is False
    assert _verdict(txt, "x", "/docs/a.pdf?dl=1")[0] is True  # $ anchored
    assert _verdict(txt, "x", "/tmp123/x")[0] is False
    assert _verdict(txt, "x", "/tmp123/y")[0] is True


# ---------------------------------------------------------------------------
# synthesizer parity spot checks (the q92 oracle's CASE table)


@pytest.mark.parametrize(
    "k,want",
    [
        (2, False),   # ccbot group: disallow all
        (1, False),   # k%4==1: item pages disallowed
        (9, True),    # k%4==1 AND k%3==0: equal-length tie -> allow
        (0, True),    # k%3==0: allow:/articles/item/ outranks /articles/
        (11, True),   # no matching rule
    ],
)
def test_synthesized_rules(k, want):
    txt = synthesize_robots_txt(f"src{k}-news.com")
    assert _verdict(txt, "ccbot", "/articles/item/5")[0] is want


def test_private_prefix_blocked_everywhere_except_full_block_hosts():
    txt = synthesize_robots_txt("src11-news.com")
    assert _verdict(txt, "ccbot", "/private/x")[0] is False


# ---------------------------------------------------------------------------
# distributed operator


def test_apply_robots_ray_and_unknown_host_allowed():
    import ray.data

    rows = [
        {"doc_id": 0, "url": "https://a.com/x/1"},
        {"doc_id": 1, "url": "https://a.com/y/1"},
        {"doc_id": 2, "url": "https://nobody.com/x/1"},
        {"doc_id": 3, "url": "not a url"},
    ]
    robots = {"a.com": "User-agent: *\nDisallow: /x\n"}
    out = (
        apply_robots(ray.data.from_items(rows).repartition(2), robots)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["allowed"]) == [False, True, True, True]
    assert out.loc[0, "rule"] == "disallow:/x"
    assert out.loc[3, "domain"] == ""  # unparseable URL: host empty, allowed


def test_apply_robots_matches_path_plus_query():
    import ray.data

    rows = [
        # $-anchored rule must NOT block when a query follows (§2.2.2:
        # the match unit is path + optional query)
        {"doc_id": 0, "url": "https://a.com/f.pdf?dl=1"},
        {"doc_id": 1, "url": "https://a.com/f.pdf"},
        # query-targeted rules must be matchable
        {"doc_id": 2, "url": "https://a.com/search?q=x"},
        {"doc_id": 3, "url": "https://a.com/search"},
    ]
    robots = {
        "a.com": "User-agent: *\nDisallow: /*.pdf$\nDisallow: /search?q=\n"
    }
    out = (
        apply_robots(ray.data.from_items(rows), robots)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["allowed"]) == [True, False, False, True]
    assert out.loc[2, "path"] == "/search"  # path column stays bare


def test_apply_robots_host_lookup_case_insensitive():
    import ray.data

    rows = [{"doc_id": 0, "url": "https://A.Com/private/x"}]
    robots = {"a.COM": "User-agent: *\nDisallow: /\n"}
    out = apply_robots(ray.data.from_items(rows), robots).to_pandas()
    assert not out.loc[0, "allowed"]
    assert out.loc[0, "domain"] == "a.com"


def test_apply_robots_broadcast_ceiling_raises():
    import ray.data

    ds = ray.data.from_items([{"doc_id": 0, "url": "https://a.com/"}])
    with pytest.raises(ValueError, match="broadcast ceiling"):
        apply_robots(ds, {"a.com": "x" * 100}, max_broadcast_bytes=10)


def test_distinct_domains_bounded():
    import ray.data

    ds = ray.data.from_items(
        [{"domain": f"d{i % 7}.com"} for i in range(100)]).repartition(4)
    assert distinct_domains(ds) == sorted({f"d{i}.com" for i in range(7)})
    with pytest.raises(ValueError, match="exceeds limit"):
        distinct_domains(ds, limit=3)
