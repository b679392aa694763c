"""Raw-file corpus ingestion → interleaved schema, resumable writes."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from ocrd_cis_ray.sources.ingest import ingest_pages, ingest_resumable
from ocrd_cis_ray.stages.extract import extract_spans_batch


@pytest.fixture
def raw_dir(tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    for i in range(12):
        (d / f"doc{i:04d}.txt").write_text(f"first line of {i}\nsecond {i} here\n")
    return str(d)


def test_ingest_schema_and_invariant(ray_session, raw_dir):
    docs = ingest_pages(raw_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(docs) == 12
    spans = docs["spans"][0]
    kinds = [s["kind"] for s in spans]
    assert kinds[0] == "region" and "line" in kinds and "word" in kinds
    offs = [s["offset"] for s in spans]
    assert offs == list(range(len(offs)))
    # ingested docs already satisfy extraction normalization (idempotent)
    import pyarrow as pa

    tbl = pa.Table.from_pandas(docs[["doc_id", "spans"]])
    assert extract_spans_batch(tbl).to_pylist() == tbl.to_pylist()


def test_ingest_resumable_skips_done(ray_session, raw_dir, tmp_path):
    out = str(tmp_path / "ingested")
    r1 = ingest_resumable(raw_dir, out, n_partitions=4)
    assert r1["completed"] == 4 and r1["rows"] == 12
    # kill simulation: remove one partition + its manifest
    shutil.rmtree(os.path.join(out, "part=00001"))
    os.remove(os.path.join(out, "_manifest", "00001.json"))
    r2 = ingest_resumable(raw_dir, out, n_partitions=4)
    assert r2["completed"] == 1 and r2["skipped"] == 3
    n = sum(
        pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(out, "part=*", "*.parquet"))
    )
    assert n == 12


def test_external_ocr_importer_unions_into_alignment(ray_session, tmp_path):
    """External .pred.txt lines import as a variant source with the
    alignment schema; misnamed files are skipped (importer.py parity)."""
    from ocrd_cis_ray.sources.external import import_external_lines

    d = tmp_path / "lines"
    d.mkdir()
    (d / "doc1__0.pred.txt").write_text("externer text hier\n")
    (d / "doc1__1.pred.txt").write_text("zweite zeile")
    (d / "doc2__0.pred.txt").write_text("anderes dokument")
    (d / "garbage.txt").write_text("ignored")  # wrong suffix
    (d / "nounderscore.pred.txt").write_text("ignored too")  # unparseable

    out = import_external_lines(str(d), source="CALAMARI", conf=0.66).to_pandas()
    out = out.sort_values(["doc_id", "line_no"]).reset_index(drop=True)
    assert list(out.columns) == ["doc_id", "source", "line_no", "text", "conf"]
    assert len(out) == 3
    assert (out["source"] == "CALAMARI").all()
    assert out.loc[0, "text"] == "externer text hier"
    assert out.loc[1, "line_no"] == 1
    import numpy as np
    assert np.allclose(out["conf"], 0.66)


def test_corpus_io_dispatch(ray_session, sf_dir, tmp_path):
    """read_corpus: parquet paths stream with column pruning; .lance
    paths demand the lance package (absent here -> clear error)."""
    import pytest

    from ocrd_cis_ray.sources.corpus_io import lance_available, read_corpus

    ds = read_corpus(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    assert ds.count() == 500
    assert ds.schema().names == ["doc_id"]
    if not lance_available():
        with pytest.raises(RuntimeError, match="lance"):
            read_corpus(str(tmp_path / "corpus.lance"))
