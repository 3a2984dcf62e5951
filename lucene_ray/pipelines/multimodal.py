"""Multimodal columns — opaque binary payloads with typed metadata, processed
by actor-pool ``map_batches`` stages.

The DECODE step is REAL: PNG payloads decode through the in-repo pure-python
codec (functions/png.py — zlib + all five row filters), WAV payloads through
the stdlib ``wave`` module, and PIL/soundfile are preferred when importable
(never in this container). Payloads in formats none of those handle fall
back to a deterministic fake decoder (clearly marked) so the plumbing stays
testable on arbitrary bytes.

Scale notes baked in: binary payloads are wide — stages take small
``batch_size`` and keep ``batch_format="pyarrow"`` end-to-end (binary
columns don't round-trip pandas well); features come out as fixed-width
``list<float>`` columns ready for the knn pipeline.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_FEATURE_DIM = 64
AUDIO_FRAME_FEATURES = 16

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_RIFF_MAGIC = b"RIFF"


def _deterministic_pixels(payload: bytes, h: int = 8, w: int = 8) -> np.ndarray:
    """Fake decode for UNRECOGNIZED formats: payload bytes → pseudo-pixels,
    stable across runs (keeps the plumbing testable on arbitrary bytes)."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _decode_image(payload: bytes) -> np.ndarray:
    try:  # pragma: no cover - PIL not present in this container
        import io

        from PIL import Image  # noqa: F401

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        pass
    if payload[:8] == _PNG_MAGIC:
        from lucene_ray.functions.png import decode_png

        px = decode_png(payload)
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        return px[:, :, :3]  # drop alpha
    return _deterministic_pixels(payload)


def _decode_audio(payload: bytes, sr: int = 16_000) -> np.ndarray:
    try:  # pragma: no cover - soundfile not present in this container
        import io

        import soundfile  # noqa: F401

        data, _ = soundfile.read(io.BytesIO(payload))
        return np.asarray(data, dtype=np.float32)
    except ImportError:
        pass
    if payload[:4] == _RIFF_MAGIC:
        from lucene_ray.functions.png import decode_wav

        x, _sr = decode_wav(payload)
        return x
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(sr // 10).astype(np.float32)  # 100 ms fake


def synthesize_media_batch(batch: pa.Table, *, kind: str = "image") -> pa.Table:
    """documents rows → REAL media rows: each doc's text deterministically
    seeds a small PNG image (kind='image') or a WAV tone mix (kind='audio'),
    so downstream decode stages exercise true format parsing. Stands in for
    reading a WARC/media lake."""
    from lucene_ray.functions.png import encode_png, encode_wav

    ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    payloads = []
    for t in texts:
        seed = int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        if kind == "audio":
            f0 = 100.0 + float(rng.integers(0, 900))
            ts = np.arange(1600) / 16_000.0
            payloads.append(encode_wav(
                0.5 * np.sin(2 * np.pi * f0 * ts)
                + 0.25 * np.sin(2 * np.pi * 2 * f0 * ts)))
        else:
            payloads.append(encode_png(
                rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)))
    return pa.table(
        {
            "media_id": ids,
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array([kind] * len(texts), type=pa.string()),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


class ImageFeatures:
    """Actor-pool stage: decode → resize(8×8) → 64-dim grayscale feature.

    __init__ is where a real model/codec would load (once per actor)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch.column(self.payload_col).to_pylist():
            px = _decode_image(p)  # (h, w, 3) uint8
            gray = px.astype(np.float32).mean(axis=2)
            # nearest-neighbor resize to 8×8 (vectorized index grid)
            h, w = gray.shape
            yi = (np.arange(8) * h // 8).clip(0, h - 1)
            xi = (np.arange(8) * w // 8).clip(0, w - 1)
            feats.append((gray[np.ix_(yi, xi)].ravel() / 255.0).astype(np.float32))
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "feature": pa.array([f.tolist() for f in feats],
                                    type=pa.list_(pa.float32(), IMAGE_FEATURE_DIM)),
            }
        )


class AudioFrameSample:
    """Actor-pool stage: decode → frame-sample → per-frame RMS features."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 n_frames: int = AUDIO_FRAME_FEATURES):
        self.payload_col = payload_col
        self.id_col = id_col
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch.column(self.payload_col).to_pylist():
            wav = _decode_audio(p)
            frames = np.array_split(wav, self.n_frames)
            feats.append(np.array([float(np.sqrt((f**2).mean())) if len(f) else 0.0
                                   for f in frames], dtype=np.float32))
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "frame_rms": pa.array([f.tolist() for f in feats],
                                      type=pa.list_(pa.float32(), self.n_frames)),
            }
        )


def image_features(ds, *, concurrency: int = 4, batch_size: int = 256):
    """Small batch_size on purpose: payloads are wide binary."""
    return ds.map_batches(ImageFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=(1, concurrency))


def audio_features(ds, *, concurrency: int = 4, batch_size: int = 256):
    return ds.map_batches(AudioFrameSample, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=(1, concurrency))
