"""Flagship end-to-end pipeline: corpus → extraction → variants →
n-way alignment → evaluation metrics.

Mirrors the reference's aio super-pipeline (ocrd_cis/aio/aio.py:
unpack → recognize per OCR engine → align → stats) as one lazy Ray
Data flow: every stage is a map_batches/groupby over the streaming
executor, nothing materializes the corpus on the driver.
"""

from __future__ import annotations

import pandas as pd

from ..corpus import synth_batch, synth_variants_batch
from ..stages.align import align_variants
from ..stages.extract import extract_spans_batch, flatten_spans_batch
from ..stages.metrics import cer_by_source


def raw_corpus(sf_dir: str, *, pages_per_doc: int = 1, seed: int = 42):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        synth_batch,
        batch_format="pyarrow",
        fn_kwargs={"seed": seed, "pages_per_doc": pages_per_doc, "raw": True},
    )


def extract_pipeline(sf_dir: str, *, pages_per_doc: int = 1, seed: int = 42):
    """read → synthesize raw interleaved docs → extract/normalize spans."""
    return raw_corpus(sf_dir, pages_per_doc=pages_per_doc, seed=seed).map_batches(
        extract_spans_batch, batch_format="pyarrow"
    )


def align_pipeline(sf_dir: str, *, pages_per_doc: int = 1, seed: int = 42, sources=("OCR-1", "OCR-2", "GT")):
    """extracted docs → per-source corrupted variant lines → n-way align."""
    docs = extract_pipeline(sf_dir, pages_per_doc=pages_per_doc, seed=seed)
    variants = docs.map_batches(
        synth_variants_batch, batch_format="pyarrow", fn_kwargs={"sources": tuple(sources), "seed": seed}
    )
    return align_variants(variants, list(sources))


def evaluate_pipeline(sf_dir: str, *, pages_per_doc: int = 1, seed: int = 42):
    """Full chain ending in per-source CER of aligned line variants vs GT.

    The aligned long form carries, per line, every source's text at its
    TextEquiv index; CER compares each OCR source against the GT entry
    (reference div/stats.py:31-91 semantics).
    """
    aligned = align_pipeline(sf_dir, pages_per_doc=pages_per_doc, seed=seed)

    def line_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        # whole hash bucket: all sources of every (doc, line) are
        # co-located because the bucket key is doc_id, so one vectorized
        # pivot per bucket pairs each OCR source with GT
        b = bucket[bucket["level"] == "line"]
        if b.empty:
            return pd.DataFrame({"source": [], "text": [], "gt_text": []})
        wide = b.pivot_table(
            index=["doc_id", "line_no"], columns="source", values="text", aggfunc="first"
        ).reset_index()
        out = []
        for src in ("OCR-1", "OCR-2"):
            if src not in wide.columns or "GT" not in wide.columns:
                continue
            out.append(
                pd.DataFrame(
                    {"source": src, "text": wide[src].fillna(""), "gt_text": wide["GT"].fillna("")}
                )
            )
        if not out:
            return pd.DataFrame({"source": [], "text": [], "gt_text": []})
        return pd.concat(out, ignore_index=True)

    from ..shuffle import bucketed_groupby

    pairs = bucketed_groupby(aligned, "doc_id", line_pairs, whole_bucket=True)
    return cer_by_source(pairs)


def flatten(ds):
    return ds.map_batches(flatten_spans_batch, batch_format="pyarrow")
