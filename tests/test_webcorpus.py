"""End-to-end web-corpus extraction pipeline: extraction inversion
through the full compose, curation consistency, and resumability."""

from __future__ import annotations

import pyarrow.parquet as pq


def test_webcorpus_end_to_end_and_resume(ray_session, tmp_path):
    import ray.data as rd

    from ocrd_cis_ray.pipelines.webcorpus import run_webcorpus

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "web")
    res = run_webcorpus(sf, out, n_partitions=3, gopher_kwargs={"min_stop_distinct": 1})

    n_docs = pq.read_table(f"{sf}/documents.parquet").num_rows
    assert sum(res["drop_stages"].values()) == n_docs
    kept = res["drop_stages"].get("kept", 0)
    assert 0 < kept < n_docs
    assert res["rows"] == kept

    got = rd.read_parquet(out).to_pandas()
    assert len(got) == kept
    # the extraction inversion holds through the whole compose: kept
    # text equals the whitespace-normalized source document
    src = pq.read_table(f"{sf}/documents.parquet").to_pandas().set_index("doc_id")
    for r in got.sample(min(20, len(got)), random_state=0).itertuples():
        assert r.text == " ".join(src.loc[r.doc_id, "text"].split())

    # resume: rerun with identical inputs commits nothing new
    res2 = run_webcorpus(sf, out, n_partitions=3, gopher_kwargs={"min_stop_distinct": 1})
    assert res2["completed"] == 0 and res2["skipped"] >= 1
