"""Multimodal (image/audio/video) columns as opaque ``binary`` + metadata.

The container has no image/video codecs, so those *decode* kernels are
stubbed (clearly-marked ``NotImplementedError`` behind ``backend="real"``)
while every piece of Ray-side plumbing — schema, actor-pool signature, batch
sizing, output layout — is real and tested with the deterministic fake
backend. The AUDIO path is fully real (round 5): PCM WAV needs only the
stdlib ``wave`` module, so :class:`AudioFeatures` / :class:`ResampleAudio` /
:class:`ClipSampleAudio` do actual byte-level decode, feature extraction,
resampling and clip sampling over the same actor-pool shape:

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


# ---------------------------------------------------------------------------
# REAL audio backend (round 5): WAV/PCM via the stdlib `wave` module.
# The container has no image/ffmpeg codecs (those slots stay stubbed), but
# PCM WAV needs none — so the audio half of the decode/resample/clip surface
# is a real byte-level implementation, exercised end-to-end.
# ---------------------------------------------------------------------------

def synth_wav(key: int, seconds: float = 0.25, rate: int = 8000) -> bytes:
    """Deterministic mono 16-bit PCM WAV: a sine at a key-derived frequency
    (110–990 Hz). The test corpus generator for the real audio path."""
    import io
    import wave

    freq = 110.0 + (key * 2654435761 % 2**32) % 881
    n = int(seconds * rate)
    t = np.arange(n, dtype=np.float64) / rate
    pcm = (np.sin(2 * np.pi * freq * t) * 32000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _parse_wav(blob: bytes):
    """WAV bytes → (float64 samples in [-1,1] — first channel, rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        nch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif width == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return x[::nch] if nch > 1 else x, rate


class AudioFeatures:
    """REAL actor-pool audio decode + feature-extract: WAV in →
    (duration_s, rms, peak, zero-crossing rate, ``dim-4`` log-energy FFT
    bands). Same actor/batch plumbing as :class:`DecodeFeatures` — decoder
    constants built once per actor, vectorized numpy per batch."""

    def __init__(self, dim: int = 16) -> None:
        if dim < 5:
            raise ValueError("dim must be >= 5 (4 scalars + >=1 band)")
        self.dim = dim

    def _one(self, blob: bytes) -> np.ndarray:
        x, rate = _parse_wav(blob)
        out = np.zeros(self.dim, np.float32)
        if not len(x):
            return out
        out[0] = len(x) / rate
        out[1] = float(np.sqrt(np.mean(x * x)))
        out[2] = float(np.max(np.abs(x)))
        out[3] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        spec = np.abs(np.fft.rfft(x)) ** 2
        nb = self.dim - 4
        bands = np.array_split(spec, nb)
        out[4:] = [np.log1p(b.sum()) for b in bands]
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [self._one(b) for b in t["blob"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "media_type": t["media_type"],
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32(), self.dim)),
        })


class ResampleAudio:
    """REAL audio resample (the audio analogue of image resize): WAV in →
    WAV out at ``target_rate`` (vectorized linear interpolation on the PCM
    samples), new rate/duration metadata columns."""

    def __init__(self, target_rate: int = 4000) -> None:
        self.rate = int(target_rate)

    def _one(self, blob: bytes) -> bytes:
        import io
        import wave

        x, rate = _parse_wav(blob)
        if rate != self.rate and len(x) > 1:
            n2 = max(1, int(round(len(x) * self.rate / rate)))
            x = np.interp(np.linspace(0.0, len(x) - 1.0, n2),
                          np.arange(len(x), dtype=np.float64), x)
        pcm = np.clip(x * 32768.0, -32768, 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(self.rate)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    def __call__(self, t: pa.Table) -> pa.Table:
        out = [self._one(b) for b in t["blob"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "blob": pa.array(out, pa.binary()),
            "rate": pa.array([self.rate] * len(out), pa.int32()),
            "n_bytes": pa.array([len(b) for b in out], pa.int64()),
        })


class ClipSampleAudio:
    """REAL audio clip sampling (the frame-sample shape for audio): one WAV
    row in → k evenly-spaced fixed-length WAV clips out (flat-map)."""

    def __init__(self, k: int = 3, clip_seconds: float = 0.05) -> None:
        self.k = int(k)
        self.clip_seconds = float(clip_seconds)

    def __call__(self, t: pa.Table) -> pa.Table:
        import io
        import wave

        ids, idxs, clips = [], [], []
        for did, blob in zip(t["doc_id"].to_pylist(), t["blob"].to_pylist()):
            x, rate = _parse_wav(blob)
            cn = max(1, int(self.clip_seconds * rate))
            starts = np.linspace(0, max(0, len(x) - cn), self.k).astype(np.int64)
            for i, s in enumerate(starts):
                pcm = np.clip(x[s:s + cn] * 32768.0, -32768, 32767).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(pcm.tobytes())
                ids.append(did)
                idxs.append(i)
                clips.append(buf.getvalue())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "clip_idx": pa.array(idxs, pa.int32()),
                         "clip": pa.array(clips, pa.binary())})


def attach_wav_blob(docs_ds, seconds: float = 0.25, rate: int = 8000):
    """documents → (doc_id, blob: REAL WAV bytes, media_type, n_bytes) —
    deterministic synthetic PCM keyed by doc_id (no external data)."""

    def to_blob(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], np.int64)
        blobs = [synth_wav(int(i), seconds, rate) for i in ids]
        return pa.table({
            "doc_id": pa.array(ids),
            "blob": pa.array(blobs, pa.binary()),
            "media_type": pa.array(["audio/wav"] * len(blobs), pa.string()),
            "n_bytes": pa.array([len(b) for b in blobs], pa.int64()),
        })

    return docs_ds.map_batches(to_blob, batch_format="pyarrow")


def audio_features(blobs_ds, dim: int = 16, concurrency=(1, 12),
                   batch_size: int = 256):
    """WAV blob table → real audio feature vectors (actor pool)."""
    return blobs_ds.map_batches(AudioFeatures, batch_format="pyarrow",
                                fn_constructor_kwargs={"dim": dim},
                                concurrency=concurrency, batch_size=batch_size)
