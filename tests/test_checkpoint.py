"""Resumable per-partition checkpoint manifests: a killed run must
resume without recomputing completed partitions (north_rule)."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from ocrd_cis_ray.state.manifest import (
    commit_partition,
    completed_partitions,
    doc_id_ranges,
    partition_dir,
    run_partitioned,
)


@pytest.fixture
def out_dir(tmp_path):
    return str(tmp_path / "stage_out")


def _make_ds_factory(sf_dir, calls):
    import ray.data as rd

    import pyarrow.compute as pc

    def make_ds(lo, hi):
        calls.append((lo, hi))
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

        def in_range(t):
            ids = pc.cast(t["doc_id"], "string")
            mask = pc.greater_equal(ids, lo) if lo else pc.equal(ids, ids)
            if hi:
                mask = pc.and_(mask, pc.less(ids, hi))
            return t.filter(mask)

        return ds.map_batches(in_range, batch_format="pyarrow")

    return make_ds


def test_doc_id_ranges_cover_keyspace():
    ranges = doc_id_ranges(4)
    assert ranges[0][0] == "" and ranges[-1][1] == ""
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi == lo


def test_run_and_resume(ray_session, sf_dir, out_dir):
    calls: list = []
    # partition driver doc_ids (stringified ints) into 4 lexicographic ranges
    parts = [("", "2"), ("2", "4"), ("4", "7"), ("7", "")]
    make_ds = _make_ds_factory(sf_dir, calls)

    res1 = run_partitioned(make_ds, out_dir, parts, stage="extract", input_fingerprint="fp1")
    assert res1["completed"] == 4 and res1["skipped"] == 0
    total_rows = res1["rows"]
    assert total_rows == 500  # all docs covered exactly once

    # simulate a killed run: delete ONE partition's manifest + output
    shutil.rmtree(partition_dir(out_dir, 2))
    os.remove(os.path.join(out_dir, "_manifest", "00002.json"))

    calls.clear()
    res2 = run_partitioned(make_ds, out_dir, parts, stage="extract", input_fingerprint="fp1")
    assert res2["completed"] == 1 and res2["skipped"] == 3
    assert res2["rows"] == total_rows
    # only the missing partition was recomputed
    assert calls == [("4", "7")]

    # all partition outputs readable, disjoint union == input
    n = 0
    for pid in range(4):
        d = partition_dir(out_dir, pid)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                n += pq.read_metadata(os.path.join(d, f)).num_rows
    assert n == 500


def test_resume_invalidates_on_changed_inputs_or_bounds(ray_session, sf_dir, out_dir):
    """A committed partition is reused ONLY when fingerprint AND key
    range match; changed inputs or re-derived bounds recompute instead
    of silently serving stale rows."""
    calls: list = []
    parts = [("", "5"), ("5", "")]
    make_ds = _make_ds_factory(sf_dir, calls)
    run_partitioned(make_ds, out_dir, parts, stage="x", input_fingerprint="fpA")

    # same fingerprint + same bounds -> all skipped
    calls.clear()
    r = run_partitioned(make_ds, out_dir, parts, stage="x", input_fingerprint="fpA")
    assert r["skipped"] == 2 and calls == []

    # changed fingerprint -> full recompute
    calls.clear()
    r = run_partitioned(make_ds, out_dir, parts, stage="x", input_fingerprint="fpB")
    assert r["completed"] == 2 and r["skipped"] == 0
    assert len(calls) == 2

    # changed bounds for one partition -> only that one recomputes
    calls.clear()
    parts2 = [("", "5"), ("5", "9")]  # second range re-derived differently
    r = run_partitioned(make_ds, out_dir, parts2, stage="x", input_fingerprint="fpB")
    assert r["completed"] == 1 and r["skipped"] == 1
    assert calls == [("5", "9")]


def test_ingest_fingerprint_tracks_listing(tmp_path):
    from ocrd_cis_ray.sources.ingest import _listing_fingerprint

    d = tmp_path / "in"
    d.mkdir()
    (d / "a.txt").write_text("one")
    fp1 = _listing_fingerprint(str(d))
    assert fp1 == _listing_fingerprint(str(d))  # stable
    (d / "b.txt").write_text("two")
    fp2 = _listing_fingerprint(str(d))
    assert fp2 != fp1  # new file changes it
    os.utime(d / "a.txt", ns=(1, 1))
    assert _listing_fingerprint(str(d)) != fp2  # touch changes it


def test_torn_manifest_ignored(out_dir):
    os.makedirs(os.path.join(out_dir, "_manifest"))
    with open(os.path.join(out_dir, "_manifest", "00000.json"), "w") as f:
        f.write('{"partition": 0, "status": "do')  # torn write
    assert completed_partitions(out_dir) == {}
    commit_partition(out_dir, 1, {"rows": 5})
    done = completed_partitions(out_dir)
    assert list(done) == [1] and done[1]["rows"] == 5


def test_write_resumable_generic_dataset(ray_session, sf_dir, tmp_path):
    """write_resumable: any Dataset checkpoints per key range; a killed
    run resumes recomputing only the missing partition."""
    import ray.data as rd

    from ocrd_cis_ray.state.manifest import write_resumable

    out = str(tmp_path / "sink")

    def make():
        return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    r1 = write_resumable(make(), out, key="doc_id", n_partitions=4, stage="extract",
                         input_fingerprint="fpX")
    assert r1["completed"] >= 3 and r1["rows"] == 500

    # simulate a kill: drop one committed partition + its manifest
    victim = sorted(os.listdir(os.path.join(out, "_manifest")))[1]
    pid = int(victim.split(".")[0])
    shutil.rmtree(partition_dir(out, pid))
    os.remove(os.path.join(out, "_manifest", victim))

    r2 = write_resumable(make(), out, key="doc_id", n_partitions=4, stage="extract",
                         input_fingerprint="fpX")
    assert r2["completed"] == 1 and r2["skipped"] == r1["completed"] - 1
    assert r2["rows"] == 500

    # disjoint union of partition outputs == input
    n = 0
    for name in os.listdir(out):
        if name.startswith("part="):
            for f in os.listdir(os.path.join(out, name)):
                if f.endswith(".parquet"):
                    n += pq.read_metadata(os.path.join(out, name, f)).num_rows
    assert n == 500


def test_write_resumable_tolerates_schemaless_empty_blocks(ray_session, tmp_path):
    """Ray's map_groups emits schema-less EMPTY pandas blocks for empty
    sort partitions; the sink must survive them (mixed with real
    blocks) and a dataset whose blocks are ALL empty must return a
    zero-row result instead of raising (seen live: webcorpus with
    default gopher thresholds drops every doc)."""
    import pandas as pd
    import ray.data as rd

    from ocrd_cis_ray.state.manifest import write_resumable

    base = rd.from_pandas(
        pd.DataFrame({"doc_id": range(40), "grp": [i % 4 for i in range(40)],
                      "text": ["x"] * 40})
    ).repartition(8)

    def keep_some(g: pd.DataFrame) -> pd.DataFrame:
        # two of four groups vanish -> empty output partitions
        return g[["doc_id", "text"]] if int(g["grp"].iloc[0]) < 2 else g.iloc[0:0][["doc_id", "text"]]

    mixed = base.groupby("grp").map_groups(keep_some, batch_format="pandas")
    out1 = str(tmp_path / "mixed")
    r = write_resumable(mixed, out1, key="doc_id", n_partitions=4, stage="s", input_fingerprint="f")
    assert r["rows"] == 20

    def keep_none(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[0:0][["doc_id", "text"]]

    empty = base.groupby("grp").map_groups(keep_none, batch_format="pandas")
    out2 = str(tmp_path / "empty")
    r = write_resumable(empty, out2, key="doc_id", n_partitions=4, stage="s", input_fingerprint="f")
    assert r == {"completed": 0, "skipped": 0, "rows": 0}
