"""Staged crawl round (pipelines/crawl.py): the frontier is a
materialized resumable artifact; scheduling reads the committed
parquet instead of recomputing discovery (VERDICT r4 item 7)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq


SF = "/root/testdata/sf0.001"


def _read_dir(d: str) -> pd.DataFrame:
    parts = []
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                parts.append(pq.read_table(os.path.join(root, f)).to_pandas())
    return pd.concat(parts, ignore_index=True)


def test_crawl_round_matches_queries_and_resumes(ray_session, tmp_path):
    from ocrd_cis_ray.pipelines.crawl import run_crawl_round

    import __ray_entry__ as entry

    out = str(tmp_path / "crawl")
    res = run_crawl_round(SF, out, n_partitions=4)
    assert res["frontier"]["completed"] == 4
    assert res["schedule"]["completed"] == 2

    # the committed artifacts equal the self-contained driver queries
    want_frontier = (
        entry.q101_crawl_frontier(SF)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    got_frontier = (
        _read_dir(res["frontier_dir"]).sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got_frontier[["url", "n_refs"]], want_frontier[["url", "n_refs"]]
    )

    want_sched = (
        entry.q108_fetch_schedule(SF).to_pandas().sort_values("url").reset_index(drop=True)
    )
    got_sched = _read_dir(res["schedule_dir"]).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_sched[want_sched.columns.tolist()], want_sched
    )

    # resume: identical inputs commit nothing new in either stage
    res2 = run_crawl_round(SF, out, n_partitions=4)
    assert res2["frontier"]["completed"] == 0 and res2["frontier"]["skipped"] == 4
    assert res2["schedule"]["completed"] == 0 and res2["schedule"]["skipped"] == 2
    assert res2["frontier"]["rows"] == res["frontier"]["rows"]


def test_crawl_round_kill_resume(ray_session, tmp_path):
    """A killed discovery run (simulated: wipe one partition's commit)
    resumes by rewriting ONLY the missing partition."""
    import shutil

    from ocrd_cis_ray.pipelines.crawl import run_crawl_round

    out = str(tmp_path / "crawl")
    res = run_crawl_round(SF, out, n_partitions=4)
    total = res["frontier"]["rows"]

    # kill: remove one committed frontier partition + its manifest entry
    fdir = res["frontier_dir"]
    victim = os.path.join(fdir, "part=00001")
    shutil.rmtree(victim)
    os.remove(os.path.join(fdir, "_manifest", "00001.json"))

    res2 = run_crawl_round(SF, out, n_partitions=4)
    assert res2["frontier"]["completed"] == 1 and res2["frontier"]["skipped"] == 3
    assert res2["frontier"]["rows"] == total
    assert os.path.isdir(victim)
