"""End-to-end multimodal corpus pipeline: synthesize REAL encoded
media (JPEG / PNG / FLAC / WAV / MJPEG-AVI / Y4M by doc), externalize
payloads to the content-addressed sidecar, featurize from refs inside
the actor pool, and write the feature table resumably.

This is the pipeline a multimodal-corpus user runs: media enters once
(ingest → sidecar write), every later stage and exchange moves only
``cas://`` refs, and the decode+featurize cost is paid inside the
consuming actor after all exchanges — the SURVEY §1.2 layout proven
end-to-end rather than stage-by-stage. All six codecs are the engine's
own (no external media library): ``sources/jpeg.py``, ``media.py``
(PNG/WAV/Y4M), ``flac.py``, ``avi.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def synth_media_batch(t: pa.Table, *, seed: int = 42) -> pa.Table:
    """documents(doc_id) → one REAL encoded media row per doc: modality
    and codec chosen by doc_id (deterministic), payloads produced by
    the engine's own encoders.

    doc_id % 6: 0 JPEG, 1 PNG (image) · 2 FLAC, 3 WAV (audio) ·
    4 MJPEG-AVI, 5 Y4M (video)."""
    import json

    from ..sources.avi import encode_mjpeg_avi
    from ..sources.flac import encode_flac
    from ..sources.jpeg import encode_jpeg
    from ..sources.media import encode_png, encode_wav, encode_y4m

    out = {"doc_id": [], "media_ref": [], "modality": [], "payload": [], "meta": []}
    for did in t["doc_id"].to_pylist():
        did = int(did)
        kind = did % 6
        if kind in (0, 1):
            h, w = 16 + did % 9, 16 + did % 17
            img = ((np.arange(w)[None, :] + np.arange(h)[:, None] + did) % 256).astype(np.uint8)
            payload = (
                encode_jpeg(np.full((h, w), did % 256, np.uint8), quality=95, subsampling="4:4:4")
                if kind == 0
                else encode_png(img)
            )
            modality, meta = "image", {"width": w, "height": h}
        elif kind in (2, 3):
            n = 400 + did % 300
            i = np.arange(n, dtype=np.int64)
            s = (((did * 31 + i * 7) % 4001) - 2000).astype(np.int16)
            payload = (
                encode_flac(s, 16_000) if kind == 2 else encode_wav(s / 32768.0, 16_000, sampwidth=2)
            )
            modality, meta = "audio", {"sample_rate": 16_000, "n_samples": n}
        else:
            nf, h, w = 2 + did % 4, 8 + did % 5, 16
            frames = np.stack([np.full((h, w), (did + 7 * f) % 256, np.uint8) for f in range(nf)])
            payload = (
                encode_mjpeg_avi(frames, fps=12, quality=95, subsampling="4:4:4")
                if kind == 4
                else encode_y4m(frames, fps=12, mono=True)
            )
            modality, meta = "video", {"frames": nf, "width": w, "height": h}
        out["doc_id"].append(str(did))
        out["media_ref"].append("")  # set by externalize_media (content address)
        out["modality"].append(modality)
        out["payload"].append(payload)
        out["meta"].append(json.dumps(meta))
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "modality": pa.array(out["modality"], pa.string()),
            "payload": pa.array(out["payload"], pa.large_binary()),
            "meta": pa.array(out["meta"], pa.string()),
        }
    )


def run_media_corpus(
    sf_dir: str,
    out_dir: str,
    *,
    sidecar_root: str,
    n_partitions: int = 16,
    concurrency: int = 8,
) -> dict:
    """documents → real encoded media → sidecar externalize → ref-only
    featurize (actor pool, lazy hydration) → resumable feature table.

    Returns {"rows", "write", "modalities"}. Re-running with the same
    ``out_dir`` skips committed partitions (write_resumable manifests)
    AND re-putting identical payloads is a metadata stat (content
    addressing) — the whole pipeline is idempotent."""
    import ray.data as rd

    from ..state.manifest import write_resumable
    from ..state.mediastore import externalize_media

    from ..stages.multimodal import featurize_media

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = docs.repartition(n_partitions).map_batches(synth_media_batch, batch_format="pyarrow")
    refs_only = externalize_media(media, sidecar_root, payload_col="payload")
    feats = featurize_media(refs_only, concurrency=concurrency, sidecar_root=sidecar_root).materialize()

    import pandas as pd

    def mod_counts(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"modality": t["modality"].to_pylist(), "ok": t["ok"].to_pylist()})
        return df.groupby("modality", sort=False)["ok"].agg(["count", "sum"]).reset_index()

    mods = (
        feats.map_batches(mod_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby("modality")[["count", "sum"]]
        .sum()
        .astype(int)
        .to_dict("index")
    )

    write_stats = write_resumable(feats, out_dir, key="doc_id", stage="media_features")
    return {"rows": feats.count(), "write": write_stats, "modalities": mods}
