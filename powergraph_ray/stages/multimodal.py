"""Multimodal (image/audio/video) columns as opaque ``binary`` + metadata.

The container has no image/audio codecs, so the *decode* kernels are stubbed
(clearly-marked ``NotImplementedError`` behind ``backend="real"``) while every
piece of Ray-side plumbing — schema, actor-pool signature, batch sizing,
output layout — is real and tested with the deterministic fake backend:

- ``attach_blob``: documents → (doc_id, blob:binary, media_type, n_bytes)
  (the ingest shape: payload bytes + typed metadata),
- ``DecodeFeatures``: actor-pool ``map_batches`` stage (decoder state built
  once per actor in ``__init__``) → fixed-width feature vectors; small
  ``batch_size`` because each row carries a large payload,
- ``resize_stub`` / ``frame_sample_stub``: same actor shape for the other
  canonical media transforms.

Fake backend semantics (deterministic, test-oracle-able): "features" are a
``dim``-wide float32 vector derived from blake2b(blob) — stable across runs
and processes.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pyarrow as pa


def attach_blob(docs_ds, media_type: str = "image/fake"):
    """documents → (doc_id, blob, media_type, n_bytes); the blob is the
    utf-8 payload of the text column (stand-in for real image bytes)."""

    def to_blob(t: pa.Table) -> pa.Table:
        blobs = [x.encode("utf-8") for x in t["text"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "blob": pa.array(blobs, pa.binary()),
            "media_type": pa.array([media_type] * len(blobs), pa.string()),
            "n_bytes": pa.array([len(b) for b in blobs], pa.int64()),
        })

    return docs_ds.map_batches(to_blob, batch_format="pyarrow")


def _fake_features(blob: bytes, dim: int) -> np.ndarray:
    h = blake2b(blob, digest_size=dim).digest()
    return (np.frombuffer(h, np.uint8).astype(np.float32) - 127.5) / 128.0


class DecodeFeatures:
    """Actor-pool decode + feature-extract stage.

    ``backend="real"`` is the production slot (PIL/torchvision/ffmpeg — not
    present in this container → NotImplementedError); ``backend="fake"`` is a
    deterministic stand-in with identical schema and plumbing.
    """

    def __init__(self, dim: int = 16, backend: str = "fake") -> None:
        if backend == "real":
            raise NotImplementedError(
                "real image/audio decode requires codec libraries not present "
                "in this environment; the Ray plumbing is exercised via the "
                "deterministic 'fake' backend")
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [_fake_features(b, self.dim) for b in t["blob"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "media_type": t["media_type"],
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32(), self.dim)),
        })


def decode_features(blobs_ds, dim: int = 16, concurrency=(1, 12),
                    batch_size: int = 256):
    """Blob table → fixed-width feature vectors (actor pool; small batches
    because rows carry payloads)."""
    return blobs_ds.map_batches(DecodeFeatures, batch_format="pyarrow",
                                fn_constructor_kwargs={"dim": dim},
                                concurrency=concurrency, batch_size=batch_size)


class ResizeStub:
    """Image resize plumbing: binary in → binary out + new dims metadata.
    Fake backend: truncate/pad the payload to ``w*h`` bytes."""

    def __init__(self, w: int = 8, h: int = 8, backend: str = "fake") -> None:
        if backend == "real":
            raise NotImplementedError("real resize needs an image codec")
        self.n = w * h
        self.w, self.h = w, h

    def __call__(self, t: pa.Table) -> pa.Table:
        out = [b[: self.n].ljust(self.n, b"\0") for b in t["blob"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "blob": pa.array(out, pa.binary()),
            "width": pa.array([self.w] * len(out), pa.int32()),
            "height": pa.array([self.h] * len(out), pa.int32()),
        })


class FrameSampleStub:
    """Video frame-sampling plumbing: one row in → k frame rows out
    (flat-map shape). Fake backend: k byte-slices of the payload."""

    def __init__(self, k: int = 3, backend: str = "fake") -> None:
        if backend == "real":
            raise NotImplementedError("real frame sampling needs ffmpeg")
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for did, b in zip(t["doc_id"].to_pylist(), t["blob"].to_pylist()):
            step = max(1, len(b) // self.k)
            for i in range(self.k):
                ids.append(did)
                idxs.append(i)
                frames.append(b[i * step:(i + 1) * step])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "frame_idx": pa.array(idxs, pa.int32()),
                         "frame": pa.array(frames, pa.binary())})
