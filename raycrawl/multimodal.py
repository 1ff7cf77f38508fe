"""Multimodal columns: opaque `binary` payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, clearly marked); everything Ray-side —
schema, actor-pool stage shape, batch sizing for large binaries, output
layout — is real and tested. Swapping `_decode_stub` for PIL/librosa is a
one-function change inside the actor.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("meta_json", pa.string()),
    ]
)


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """STUB decode: real codecs are unavailable in this container.
    Deterministic pseudo-features derived from md5(payload) — md5 so the
    DuckDB oracle can recompute them (sha1 is unavailable there); replace
    with PIL.Image.open / soundfile in a codec-equipped environment
    (raises NotImplementedError for unknown media types)."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown media type: {media_type}")
    digest = hashlib.md5(payload).digest()
    return {
        "n_bytes": len(payload),
        "digest_prefix": digest[:8].hex(),
        # fake dimensions, stable per payload
        "width": 64 + digest[0],
        "height": 64 + digest[1],
        "channels": 1 + digest[2] % 3,
    }


class MediaFeatureStage:
    """Actor-pool map_batches stage: decode/feature-extract binary payloads.

    Use with small batch_size (binary payloads are big):
        ds.map_batches(MediaFeatureStage, batch_size=64,
                       concurrency=(1, N), num_cpus=1,
                       batch_format="pyarrow", zero_copy_batch=True)
    Heavy model/codec init belongs in __init__ (once per actor).
    """

    def __init__(self) -> None:
        self.decode = _decode_stub  # swap point for a real codec

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        mtypes = t["media_type"].to_pylist()
        feats = [self.decode(p or b"", m) for p, m in zip(payloads, mtypes)]
        out = t.drop_columns(["payload"])  # binary leaves the pipeline here
        out = out.append_column("n_bytes", pa.array([f["n_bytes"] for f in feats], pa.int64()))
        out = out.append_column(
            "digest_prefix", pa.array([f["digest_prefix"] for f in feats], pa.string())
        )
        out = out.append_column("width", pa.array([f["width"] for f in feats], pa.int32()))
        out = out.append_column("height", pa.array([f["height"] for f in feats], pa.int32()))
        return out.append_column(
            "channels", pa.array([f["channels"] for f in feats], pa.int32())
        )


def media_features(ds: rd.Dataset, concurrency=None, batch_size: int = 64) -> rd.Dataset:
    from raycrawl.ioutil import cpu_pool

    return ds.map_batches(
        MediaFeatureStage,
        batch_size=batch_size,
        concurrency=concurrency or cpu_pool(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def synth_media_dataset(sf_dir: str) -> rd.Dataset:
    """Build a media table from documents (text bytes as opaque payloads)
    — exercises the binary-column plumbing on driver testdata."""
    import os

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = [x.encode("utf-8") for x in t["text"].to_pylist()]
        mt = ["image" if i % 3 == 0 else ("audio" if i % 3 == 1 else "video") for i in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(mt, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta_json": pa.array(["{}"] * len(ids), pa.string()),
            }
        )

    return docs.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


def media_pipeline(sf_dir: str) -> rd.Dataset:
    """queries() surface: synth media -> actor-pool feature extraction."""
    return media_features(synth_media_dataset(sf_dir)).select_columns(
        ["media_id", "media_type", "n_bytes", "width", "height", "channels"]
    )
