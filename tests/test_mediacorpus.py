"""End-to-end multimodal corpus pipeline (pipelines/mediacorpus.py):
real codecs → sidecar → ref-only featurize → resumable features."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from ocrd_cis_ray.pipelines.mediacorpus import run_media_corpus


@pytest.fixture(scope="module")
def media_run(ray_session, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("mediacorpus")
    out = str(base / "features")
    cas = str(base / "cas")
    stats = run_media_corpus(sf_dir, out, sidecar_root=cas, n_partitions=4, concurrency=2)
    return stats, out, cas


def test_all_modalities_decode_ok(media_run):
    stats, _, _ = media_run
    mods = stats["modalities"]
    assert set(mods) == {"image", "audio", "video"}
    for m, c in mods.items():
        assert c["count"] > 0 and c["sum"] == c["count"], (m, c)  # every row ok=True


def test_feature_table_is_ref_only(media_run):
    """The written feature table carries cas:// refs, never payloads."""
    import glob

    stats, out, _ = media_run
    files = glob.glob(f"{out}/**/*.parquet", recursive=True)
    assert files
    t = pq.read_table(files[0])
    assert "payload" not in t.schema.names and "pixels" not in t.schema.names
    assert all(r.startswith("cas://") for r in t["media_ref"].to_pylist())
    assert stats["rows"] == stats["write"]["rows"]


def test_rerun_is_idempotent(media_run, sf_dir):
    """Second run: committed partitions skip, blob puts are stats, row
    count stable."""
    stats, out, cas = media_run
    from ocrd_cis_ray.state.mediastore import MediaStore

    blobs_before = MediaStore(cas).n_blobs()
    again = run_media_corpus(sf_dir, out, sidecar_root=cas, n_partitions=4, concurrency=2)
    assert again["write"]["skipped"] > 0 and again["write"]["completed"] == 0
    assert MediaStore(cas).n_blobs() == blobs_before  # content-addressed: no new blobs
    assert again["rows"] == stats["rows"]
