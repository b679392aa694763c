"""robots.txt compliance gate (RFC 9309 / Google REP semantics).

A compliant web-corpus pipeline must honor per-host robots.txt before
a page's content may enter the corpus (Common Crawl fetches under the
CCBot token and honors it; C4/FineWeb inherit the contract from the
crawl). This stage makes the gate a first-class distributed operator:

  1. the per-host robots.txt bodies are PARSED ONCE on the driver
     (group selection by user-agent product token, rule list per
     group) and the compiled rule table is broadcast via ``ray.put``
     — the robots side is per-HOST, orders of magnitude smaller than
     the per-PAGE stream, so it is the canonical broadcast-side
     lookup. A hard byte ceiling raises loudly instead of OOMing a
     worker if someone feeds a per-page table by mistake (same
     convention as contamination.py's benchmark broadcast).
  2. each page batch is gated batch-locally: group rows by host,
     evaluate that host's (few) rules vectorized over the group's
     path array — numpy ``startswith`` for literal-prefix rules (the
     overwhelmingly common case), compiled regex only when the rule
     uses ``*``/``$`` wildcards. Zero shuffle.

Matching semantics (RFC 9309 §2.2.2 + Google REP):
  - the group whose user-agent token LONGEST case-insensitive
    prefix-matches our agent applies; groups do not merge. If no
    token matches, the ``*`` group applies; with no ``*`` group
    everything is allowed.
  - within the group, the rule with the LONGEST pattern that matches
    the URL path + optional '?query' (the §2.2.2 match unit) wins;
    equal-length ties go to ``allow`` (least restrictive). Empty
    ``Disallow:`` is allow-all (ignored).
  - ``*`` matches any char run, ``$`` anchors the pattern end.

At 100 TB the robots table for the full web (~400 M hosts × ~1 KB) no
longer broadcasts; the documented scale path is a hash-join of the
robots text onto the page stream keyed by host (``shuffle.hash_join``)
with a per-worker parsed-rules LRU — the gate math is identical, only
the delivery of the rule table changes.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

DEFAULT_AGENT = "ccbot"
MAX_BROADCAST_BYTES = 400 * 1024 * 1024  # same ceiling as contamination.py


# ---------------------------------------------------------------------------
# parser


def parse_robots(text: str) -> dict[str, list[tuple[bool, str]]]:
    """robots.txt body -> {agent_token_lower: [(is_allow, pattern)]}.

    Consecutive ``User-agent`` lines share one group (RFC 9309 §2.2.1);
    field names are case-insensitive; ``#`` starts a comment; a UTF-8
    BOM on the first line is stripped (§2.3 — BOM-prefixed robots.txt
    is common in the wild and must not hide the first field); an empty
    ``Disallow:`` value is allow-all and is dropped (no rule can match
    ""). Unrecognized records (Sitemap, Crawl-delay, ...) are ignored
    WITHOUT interrupting a user-agent run — per §2.2.4 / Google REP,
    'User-agent: a / Sitemap: ... / User-agent: b / Disallow: /' is ONE
    group disallowing both agents."""
    if text.startswith("\ufeff"):
        text = text[1:]
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] = []
    rules_started = True  # a UA line after rules starts a NEW group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if rules_started:
                current = []
                rules_started = False
            tok = value.lower()
            current.append(tok)
            groups.setdefault(tok, [])
        elif field in ("allow", "disallow"):
            rules_started = True
            if not current or not value:
                continue  # rule before any UA line, or empty disallow
            for tok in current:
                groups[tok].append((field == "allow", value))
        # any other record (Sitemap, Crawl-delay, unknown): ignored,
        # and it does NOT end the current user-agent run
    return groups


def select_group(
    groups: dict[str, list[tuple[bool, str]]], agent: str
) -> list[tuple[bool, str]] | None:
    """Pick the single applicable group: longest user-agent token that
    prefix-matches ``agent`` (case-insensitive); else the ``*`` group;
    else None (no rules -> everything allowed)."""
    agent = agent.lower()
    best_tok = None
    for tok in groups:
        if tok != "*" and agent.startswith(tok):
            if best_tok is None or len(tok) > len(best_tok):
                best_tok = tok
    if best_tok is not None:
        return groups[best_tok]
    return groups.get("*")


def _compile_rules(rules: list[tuple[bool, str]]):
    """Sort rules so a plain where-mask overwrite implements the spec:
    ascending (pattern length, is_allow) — longer patterns come later
    and overwrite, and at equal length the allow rule lands after the
    disallow rule (ties go to allow). Each entry: (is_allow, pattern,
    matcher) with matcher None for literal prefixes (numpy startswith)
    or a compiled regex for ``*``/``$`` patterns."""
    compiled = []
    for is_allow, pat in sorted(rules, key=lambda r: (len(r[1]), r[0])):
        if "*" in pat or pat.endswith("$"):
            body = pat[:-1] if pat.endswith("$") else pat
            rx = ".*".join(re.escape(p) for p in body.split("*"))
            if pat.endswith("$"):
                rx += "$"
            compiled.append((is_allow, pat, re.compile(rx)))
        else:
            compiled.append((is_allow, pat, None))
    return compiled


def evaluate_rules(compiled, paths: np.ndarray):
    """Vectorized longest-match evaluation over a host's match-target
    array (URL path + optional '?query' — the RFC 9309 §2.2.2 match
    unit). Returns (allowed: bool[n], rule: object[n] —
    'allow:<pat>' / 'disallow:<pat>' / '' when nothing matched)."""
    n = len(paths)
    allowed = np.ones(n, bool)
    rule = np.full(n, "", object)
    spaths = paths.astype(str)  # one conversion, reused by every rule
    for is_allow, pat, rx in compiled:
        if rx is None:
            mask = np.char.startswith(spaths, pat)
        else:
            mask = np.fromiter(
                (rx.match(p) is not None for p in paths), bool, n)
        if mask.any():
            allowed[mask] = is_allow
            rule[mask] = f"{'allow' if is_allow else 'disallow'}:{pat}"
    return allowed, rule


# ---------------------------------------------------------------------------
# deterministic synthesizer (domain -> robots.txt; q92 oracle mirror)


def synthesize_robots_txt(domain: str) -> str:
    """Deterministic robots body for a synthetic host. The source
    ordinal k (``src<k>-news.com``) drives structurally recomputable
    rules, and the body deliberately exercises parser hazards: a decoy
    googlebot group that must NOT apply, CRLF line ends, mixed-case
    field names, comments, and an agent-specific group that OVERRIDES
    (not merges with) the ``*`` group."""
    m = re.search(r"src(\d+)", domain)
    k = int(m.group(1)) if m else 0
    lines: list[str] = ["# synthetic robots for %s" % domain]
    if k % 2 == 0:
        lines += ["User-agent: googlebot", "Disallow: /", ""]
    if k % 5 == 2:
        lines += ["User-agent: CCBot", "disallow: /", ""]
    lines += ["User-Agent: *", "Disallow: /private/"]
    if k % 3 == 0:
        lines += ["Disallow: /articles/", "Allow: /articles/item/"]
    if k % 4 == 1:
        lines += ["DISALLOW: /articles/item/"]
    return "\r\n".join(lines) + "\r\n"


# ---------------------------------------------------------------------------
# distributed operator


def distinct_domains(ds, column: str = "domain", *, limit: int = 2_000_000):
    """Small-cardinality distinct without a shuffle: per-block unique
    partials reduced on the driver (bounded: blocks x uniques/block,
    the top-V-vocab precedent). Raises above ``limit`` — a distinct
    over a high-cardinality column belongs in a bucketed aggregate,
    not here."""
    def uniq_block(t: pa.Table) -> pa.Table:
        return pa.table({column: t[column].combine_chunks().unique()})

    parts = ds.map_batches(uniq_block, batch_format="pyarrow").take_all()
    out = sorted({r[column] for r in parts})
    if len(out) > limit:
        raise ValueError(
            f"distinct_domains: {len(out)} uniques exceeds limit={limit}; "
            "use a bucketed aggregate for high-cardinality keys")
    return out


def apply_robots(ds, robots_map: dict[str, str], *,
                 agent: str = DEFAULT_AGENT,
                 url_column: str = "url",
                 max_broadcast_bytes: int = MAX_BROADCAST_BYTES):
    """Gate a page stream against per-host robots.txt.

    ``ds``: rows with ``url_column`` (absolute URLs). ``robots_map``:
    {host: robots.txt body} — host keys are case-folded (hostnames are
    case-insensitive, RFC 3986 §3.2.2). Output adds (domain — the
    lowercased host, path — the URL path, allowed, rule). Rules match
    against path + optional '?query' (RFC 9309 §2.2.2: the match unit
    includes the query, so 'Disallow: /*.pdf$' does NOT block
    '/f.pdf?dl=1' and 'Disallow: /search?q=' works). Hosts absent from
    the map are allowed (no robots = no restriction, the crawl
    convention)."""
    import ray

    total = sum(len(k) + len(v) for k, v in robots_map.items())
    if total > max_broadcast_bytes:
        raise ValueError(
            f"apply_robots: robots table is {total/1e6:.0f} MB, above the "
            f"{max_broadcast_bytes/1e6:.0f} MB broadcast ceiling — deliver "
            "the rule table via a host-keyed hash_join instead")
    compiled_map = {}
    for dom, txt in robots_map.items():
        grp = select_group(parse_robots(txt), agent)
        compiled_map[dom.lower()] = _compile_rules(grp) if grp else []
    rules_ref = ray.put(compiled_map)

    def gate(t: pa.Table) -> pa.Table:
        rules = ray.get(rules_ref)
        import pyarrow.compute as pc

        # the shared one-pass URL decomposition (urlfilter._URL_RE)
        # carries the userinfo-spoofing protection; don't restate it
        from .urlfilter import URL_RE

        parts = pc.extract_regex(t[url_column], URL_RE)
        host = pc.utf8_lower(
            pc.fill_null(pc.struct_field(parts, "host"), "")
        )
        path = pc.fill_null(pc.struct_field(parts, "path"), "")
        query = pc.fill_null(pc.struct_field(parts, "query"), "")
        hosts = np.asarray(host.to_pylist(), object)
        paths = np.asarray(path.to_pylist(), object)
        paths[paths == ""] = "/"
        # match target = path[?query] (§2.2.2); the emitted `path`
        # column stays the bare URL path
        queries = np.asarray(query.to_pylist(), object)
        targets = paths.copy()
        has_q = queries != ""
        if has_q.any():
            targets[has_q] = np.char.add(
                np.char.add(targets[has_q].astype(str), "?"),
                queries[has_q].astype(str),
            ).astype(object)
        allowed = np.ones(len(t), bool)
        rule = np.full(len(t), "", object)
        # one sort-based grouping pass instead of a per-host scan
        uniq, inv = np.unique(hosts, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
        for u, dom in enumerate(uniq):
            compiled = rules.get(dom)
            if not compiled:
                continue
            idx = order[bounds[u]:bounds[u + 1]]
            a, r = evaluate_rules(compiled, targets[idx])
            allowed[idx] = a
            rule[idx] = r
        return t.append_column(
            "domain", pa.array(hosts, pa.string())
        ).append_column(
            "path", pa.array(paths, pa.string())
        ).append_column(
            "allowed", pa.array(allowed)
        ).append_column(
            "rule", pa.array(rule, pa.string())
        )

    return ds.map_batches(gate, batch_format="pyarrow")
