"""Minimal pure-python PNG codec (zlib + numpy, no external imaging libs).

Spec subset (PNG 1.2): 8-bit depth, color types 0 (grayscale), 2 (RGB),
6 (RGBA); interlace 0; all five row filters on decode (None/Sub/Up/
Average/Paeth); encode writes filter-0 rows. Enough to make the multimodal
decode stages REAL in containers without PIL — the reference's analogous
role is the demo HTML/doc parsing done with in-tree code
(demo/.../DemoHTMLParser.java): self-contained format handling, no codec
dependency.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) | (h, w, 3) | (h, w, 4) → PNG bytes (filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    rows[:, 1:] = a.reshape(h, w * channels)
    idat = zlib.compress(rows.tobytes(), 6)
    return (_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) for grayscale, (h, w, C) otherwise."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload))
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (1 + stride):
        raise ValueError("IDAT length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel (8-bit depth)
    for y in range(height):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, dtype=np.int64)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 1:  # Sub — per-channel cumulative sum
            rec = cur.copy()
            for c in range(bpp):
                rec[c::bpp] = np.cumsum(cur[c::bpp]) % 256
        elif ftype == 2:  # Up
            rec = (cur + prev) % 256
        elif ftype == 3:  # Average
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up_left = prev[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + _paeth(int(left), int(prev[x]), int(up_left))) % 256
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


# ------------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float array in [-1, 1] → 16-bit PCM mono WAV bytes (stdlib wave)."""
    import io
    import wave

    pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
           * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 samples in [-1, 1] mono-mixed, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        sr = w.getframerate()
        frames = w.readframes(w.getnframes())
    if sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr
