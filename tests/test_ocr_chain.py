"""End-to-end OCR lifecycle: pages → degrade → preprocess → segment →
recognize → align/eval → post-correct. The Ray restatement of the
reference's aio super-pipeline (unpack → recognize per engine → align →
post-correct → stats)."""

from __future__ import annotations

import pandas as pd
import pytest

from ocrd_cis_ray.pipelines.ocr_chain import run_ocr_chain


@pytest.fixture(scope="module")
def chain_result(ray_session, sf_dir):
    return run_ocr_chain(sf_dir, concurrency=2)


def test_chain_produces_all_stages(chain_result):
    stages = set(zip(chain_result["stage"], chain_result["source"]))
    assert ("raw", "OCR-1") in stages
    assert ("raw", "OCR-2") in stages
    assert ("postcorrected", "OCR-2") in stages


def test_noisier_engine_has_higher_cer(chain_result):
    raw = chain_result[chain_result["stage"] == "raw"].set_index("source")
    assert raw.loc["OCR-2", "char_error_rate"] > raw.loc["OCR-1", "char_error_rate"]
    # both engines actually err (the degradation bites) but stay usable
    assert 0 < raw.loc["OCR-1", "char_error_rate"] < 0.15
    assert 0 < raw.loc["OCR-2", "char_error_rate"] < 0.30


def test_postcorrection_reduces_cer(chain_result):
    df = chain_result.set_index(["stage", "source"])
    before = df.loc[("raw", "OCR-2"), "char_error_rate"]
    after = df.loc[("postcorrected", "OCR-2"), "char_error_rate"]
    assert after < before  # the channel model + lexicon help
    assert df.loc[("postcorrected", "OCR-2"), "gt_chars"] == df.loc[("raw", "OCR-2"), "gt_chars"]


def test_chain_deterministic(ray_session, sf_dir, chain_result):
    again = run_ocr_chain(sf_dir, concurrency=2)
    a = chain_result.sort_values(["stage", "source"]).reset_index(drop=True)
    b = again.sort_values(["stage", "source"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_chain_writes_resumable_corrected_corpus(ray_session, sf_dir, tmp_path):
    import json
    import os

    out_dir = str(tmp_path / "corrected")
    res = run_ocr_chain(sf_dir, concurrency=2, out_dir=out_dir)
    stats = res.attrs["write"]
    assert stats["completed"] > 0 and stats["skipped"] == 0
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == stats["rows"] > 0
    # rerun resumes: every partition already committed -> nothing rewritten
    res2 = run_ocr_chain(sf_dir, concurrency=2, out_dir=out_dir)
    st2 = res2.attrs["write"]
    assert st2["completed"] == 0 and st2["skipped"] == stats["completed"]
    assert st2["rows"] == stats["rows"]
    # manifest sanity: one json per partition, carrying the stage tag
    mdir = os.path.join(out_dir, "_manifest")
    recs = [json.load(open(os.path.join(mdir, f))) for f in os.listdir(mdir)]
    assert recs and all(r.get("stage") == "postcorrect" for r in recs)


def test_eval_rollup_empty_gt_group_stays_finite(ray_session):
    """(book, source) groups whose GT is all-empty must yield finite
    accuracy (JSON-serializable report), not inf/NaN."""
    import json

    import numpy as np

    import pyarrow as pa
    import ray.data as rd

    from ocrd_cis_ray.stages.metrics import eval_rollup

    wide = rd.from_arrow(
        pa.table(
            {
                "book": pa.array(["b1", "b1", "b2"]),
                "doc_id": pa.array(["b1/p1", "b1/p2", "b2/p1"]),
                "line_no": pa.array([0, 0, 0], pa.int32()),
                "OCR-1": pa.array(["x", "y", ""]),
                "GT": pa.array(["", "", ""]),  # empty reference
            }
        )
    )
    out = eval_rollup(wide, sources=("OCR-1",))
    assert np.isfinite(out["accuracy"]).all()
    json.dumps(out.to_dict())  # strict-JSON serializable (no Infinity/NaN)
