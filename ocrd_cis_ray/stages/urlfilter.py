"""URL canonicalization, blocklist filtering, and URL-level dedup.

Web-corpus curation's first gate is the URL (FineWeb, Penedo et al.
2024 §3.1; C4/CCNet likewise): canonicalize each document's source URL
(case-fold scheme+host, strip ``www.``, drop default ports, collapse
duplicate path slashes, strip tracking query parameters, drop
fragments), drop documents from blocklisted domains, and keep only ONE
document per canonical URL (recrawls/mirrors of the same page).

Scale design: canonicalization is ONE ``pc.extract_regex`` pass plus a
fixed chain of RE2 kernels over zero-copy Arrow string columns — no
per-row Python in the hot path. The blocklist is broadcast once via
``ray.put`` and probed with ``pc.is_in``. URL dedup is a single
bucketed exchange keyed on the canonical URL (bounded partitions, skew
contained per bucket) with a vectorized per-bucket groupby-transform —
the same pattern as content-hash dedup in ``stages/dedup.py``.

The deterministic synthesizer builds messy-but-realistic URLs from
(doc_id, source) so the q84 oracle can recompute the canonical form
structurally in SQL while the engine genuinely parses and normalizes
the messy string.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# one-pass URL decomposition (RFC 3986 shape). Userinfo is matched and
# discarded, and '@' is excluded from the host class — otherwise
# "https://blocked.com@evil.com/x" would parse host="blocked.com@evil.com"
# and slip past a domain blocklist that knows "evil.com".
_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?:[^/?#@]*@)?(?P<host>[^/?#:@]+)"
    r"(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
#: public alias — the ONE URL decomposition other stages must reuse
#: (robots gate, link-graph host derivation) so the userinfo-spoofing
#: protection propagates everywhere from a single definition
URL_RE = _URL_RE

DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized URL canonicalization -> canonical URL string array.

    Rules (the standard crawl-dedup set): lowercase scheme and host,
    strip a leading ``www.``, drop the scheme's default port (keep
    explicit non-default ports), collapse ``//+`` in the path and strip
    a trailing slash, drop ``utm_*`` tracking parameters (other params
    keep their order), drop empty queries and all fragments."""
    parts = pc.extract_regex(urls, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    host = pc.replace_substring_regex(host, r"^www\.", "")
    port = pc.struct_field(parts, "port")
    path = pc.struct_field(parts, "path")
    query = pc.struct_field(parts, "query")

    # default-port drop: keep ":port" only when present AND different
    # from the scheme default (fill nulls first — pc.and_/or_ are
    # non-Kleene and would propagate the missing-port null)
    port = pc.fill_null(port, "")
    drop_port = pc.or_(
        pc.equal(port, ""),
        pc.or_(
            pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
            pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
        ),
    )
    port_part = pc.if_else(
        drop_port, "", pc.binary_join_element_wise(":", port, "")
    )

    # path normalization: collapse duplicate slashes, strip trailing
    # slash (root "/" collapses to "" and is re-added as bare root)
    path = pc.replace_substring_regex(pc.fill_null(path, ""), r"/{2,}", "/")
    path = pc.replace_substring_regex(path, r"/$", "")

    # tracking-param removal without lookbehind: prefix "&", strip all
    # "&utm_<...>" runs, then strip the leading "&" again
    q = pc.fill_null(query, "")
    q = pc.binary_join_element_wise("&", q, "")
    q = pc.replace_substring_regex(q, r"&utm_[^&]*", "")
    q = pc.replace_substring_regex(q, r"^&", "")
    query_part = pc.if_else(
        pc.equal(q, ""), "", pc.binary_join_element_wise("?", q, "")
    )

    out = pc.binary_join_element_wise(
        scheme, "://", host, port_part, path, query_part, ""
    )
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def url_domain(canon: pa.Array) -> pa.Array:
    """Canonical URL -> registrable host (the blocklist key)."""
    return pc.struct_field(
        pc.extract_regex(canon, r"^[a-z0-9+.-]+://(?P<host>[^/?:]+)"), "host"
    )


# ---------------------------------------------------------------------------
# deterministic synthesizer (documents -> messy URLs; q84 oracle mirror)


def synthesize_urls_batch(t: pa.Table) -> pa.Table:
    """(doc_id, source) -> (doc_id, source, url): deterministic messy
    URL whose CANONICAL form is structurally recomputable in SQL:

      scheme = http if doc_id%3==0 else https
      host   = ('m.' if doc_id%4==3 else '') || source || '-news.com'
      page   = doc_id % 50
      canon  = scheme://host/articles/item/<page>?id=<page>

    The messy variants vary case, www., explicit default ports,
    duplicate path slashes, utm_* params (both positions) and
    fragments — all of which canonicalization must strip."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    sources = t["source"].to_pylist()
    urls = []
    for did, src in zip(ids, sources):
        did = int(did)
        scheme = "http" if did % 3 == 0 else "https"
        sub = "m." if did % 4 == 3 else ("WWW." if did % 4 == 0 else "www.")
        host = f"{sub}{src}-News.COM" if did % 2 else f"{sub}{src}-news.com"
        if did % 4 == 3:  # the m. subdomain is canonical, keep it clean
            host = f"m.{src}-news.com"
        port = f":{DEFAULT_PORTS[scheme]}" if did % 5 == 0 else ""
        path = "/articles//item/" if did % 2 else "/articles/item/"
        page = did % 50
        if did % 2:
            q = f"?utm_source=feed&id={page}&utm_medium=email"
        else:
            q = f"?id={page}&utm_campaign=x"
        frag = "#section-2" if did % 7 == 0 else ""
        urls.append(f"{scheme}://{host}{port}{path}{page}{q}{frag}")
    # append, don't project: extra input columns (e.g. text for the
    # fused gate_chain) ride along untouched
    return t.append_column("url", pa.array(urls, pa.string()))


def synthesize_urls(ds):
    return ds.map_batches(synthesize_urls_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distributed operator


def url_gate_arrays(urls, blocked: list[str]):
    """The ONE url-gate kernel shared by ``filter_urls`` and the fused
    ``curation.gate_chain``: (canon_with_raw_fallback, domain,
    keep_url) arrays for a url column.

    Unparseable URLs (null canon — including userinfo-spoofed hosts,
    which the shared URL_RE refuses) fail the gate explicitly as
    keep_url=False; a null canon would otherwise vanish from the dedup
    groupby and surface as a bogus "url_duplicate" drop. Their canon
    falls back to the raw string so every row keeps a non-null group
    key (identical raw strings still dedup)."""
    canon = canonicalize_urls(urls)
    dom = url_domain(canon)
    blocked_hit = pc.is_in(dom, value_set=pa.array(blocked, pa.string()))
    keep = pc.and_(pc.is_valid(canon), pc.invert(blocked_hit))
    keep = pc.fill_null(keep, False)
    raw = urls
    if isinstance(raw, pa.ChunkedArray):
        raw = raw.combine_chunks()
    canon = pc.if_else(pc.is_valid(canon), canon, raw)
    return canon, dom, keep


def filter_urls(ds, blocked_domains: list[str], *, num_buckets: int | None = None):
    """(doc_id, url, ...) -> (doc_id, url_canon, domain, keep_url,
    is_canonical): canonicalize (vectorized), flag blocklisted domains
    (broadcast set + ``pc.is_in``), and flag the canonical keeper (min
    doc_id) per canonical URL via ONE bucketed exchange."""
    import ray

    from ..shuffle import bucketed_groupby

    blocked_ref = ray.put(sorted(set(blocked_domains)))

    def canon_batch(t: pa.Table) -> pa.Table:
        import ray as _ray

        canon, dom, keep = url_gate_arrays(t["url"], _ray.get(blocked_ref))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url_canon": canon,
                "domain": dom,
                "keep_url": keep,
            }
        )

    tagged = ds.map_batches(canon_batch, batch_format="pyarrow")

    def mark_canonical(df):
        first = df.groupby("url_canon", sort=False)["doc_id"].transform("min")
        return df.assign(is_canonical=df["doc_id"].to_numpy() == first.to_numpy())

    return bucketed_groupby(
        tagged, "url_canon", mark_canonical,
        num_buckets=num_buckets, whole_bucket=True,
    )
