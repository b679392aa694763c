"""Staged crawl round: frontier discovery -> resumable frontier
artifact -> fetch schedule from the MATERIALIZED artifact.

The driver-contract queries (q101/q108) are self-contained by
requirement, so q108 recomputes its whole upstream inside the query;
this pipeline is the production shape (VERDICT r4 item 7): the
frontier is written ONCE via ``write_resumable`` (per-partition
manifest + fingerprint — a killed discovery run resumes, skipping
committed partitions), and scheduling reads the committed parquet
instead of re-running discovery. A recrawl round then diffs the next
snapshot against this artifact (stages/crawldiff.py) without
recomputation.

Scale shape: discovery is one url-keyed exchange
(stages/frontier.frontier_expand); the write partitions by url hash;
scheduling re-reads only the tiny (url, n_refs) artifact and pays one
host-keyed exchange.
"""

from __future__ import annotations


def run_crawl_round(
    sf_dir: str,
    out_dir: str,
    *,
    n_partitions: int = 8,
) -> dict:
    """Discover the frontier from the corpus's WAT outlinks, commit it
    under ``out_dir/frontier``, then schedule fetches from the
    committed artifact under ``out_dir/schedule``. Returns both write
    manifests plus row counts; rerunning with identical inputs commits
    nothing new (resume semantics of ``write_resumable``)."""
    import os

    import ray.data as rd

    from ..stages.frontier import fetch_schedule, outlink_frontier
    from ..state.manifest import write_resumable

    # the discovery input fingerprint is the corpus file identity —
    # same rule the webcorpus pipeline uses
    doc_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_path)
    fp = f"{doc_path}:{st.st_size}:{int(st.st_mtime)}"

    # q91's outlink extraction is corpus synthesis + real HTML parsing;
    # reuse the library stages directly (no driver import)
    links = _corpus_outlinks(sf_dir)
    docs = rd.read_parquet(doc_path, columns=["doc_id", "source"])
    frontier = outlink_frontier(links, docs)

    frontier_dir = os.path.join(out_dir, "frontier")
    res_frontier = write_resumable(
        frontier,
        frontier_dir,
        key="url",
        n_partitions=n_partitions,
        stage="frontier",
        input_fingerprint=fp,
    )

    # scheduling READS the committed artifact — no recomputation
    committed = rd.read_parquet(frontier_dir)
    schedule = fetch_schedule(committed)
    schedule_dir = os.path.join(out_dir, "schedule")
    res_schedule = write_resumable(
        schedule,
        schedule_dir,
        key="host",
        n_partitions=max(1, n_partitions // 2),
        stage="schedule",
        input_fingerprint=fp,
    )

    return {
        "frontier": res_frontier,
        "schedule": res_schedule,
        "frontier_dir": frontier_dir,
        "schedule_dir": schedule_dir,
    }


def _corpus_outlinks(sf_dir: str):
    """Outlink table of the synthesized corpus (the q91 composition as
    a library call): page HTML + canonical URL per document, then real
    <a>/<img> extraction with RFC 3986 resolution."""
    import pyarrow as pa
    import ray.data as rd

    from ..stages.urlfilter import canonicalize_urls, synthesize_urls_batch
    from ..stages.webextract import synthesize_html_batch
    from ..stages.weblinks import extract_links

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def page_with_url(t: pa.Table) -> pa.Table:
        u = synthesize_urls_batch(t.select(["doc_id", "source"]))
        html = synthesize_html_batch(t.select(["doc_id", "text"]))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": canonicalize_urls(u["url"]),
                "html": html["html"],
            }
        )

    return extract_links(ds.map_batches(page_with_url, batch_format="pyarrow"))
