"""Pure stdlib+numpy codecs for the multimodal stages: PNG (8-bit
gray/RGB/RGBA, non-interlaced) and PCM WAV (16-bit).

The container ships no PIL/ffmpeg/soundfile, but PNG is zlib + per-row
byte filters and WAV is a stdlib module — so the image/audio stages can
do REAL decode/resize/feature work on real formats, keeping the
PIL-gated path only for formats that genuinely need a codec library
(JPEG, MP4). Encoders are deterministic (fixed zlib level, filter 0
rows) so payload bytes are stable across runs and engines.

Scale note: decode is inherently per-payload; the stages keep it inside
actor-pool map_batches with small batch sizes (batch × concurrency
payloads per worker heap). Within one image, filter reconstruction is
vectorized per row (None/Up) or per channel-lane cumsum (Sub); only
Average/Paeth walk pixels, and our own encoder emits filter 0, so
self-produced payloads decode at memcpy speed.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type → channels


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 → PNG bytes.
    Filter 0 on every row; fixed zlib level → deterministic bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 3: 2, 4: 6}.get(c)
    if color is None:
        raise ValueError(f"png_encode: unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = np.empty((h, 1 + w * c), np.uint8)
    raw[:, 0] = 0  # filter type None per row
    raw[:, 1:] = a.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), level)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced gray/gray+A/RGB/RGBA PNG → uint8
    array (HxW or HxWxC). Handles all five row filters."""
    if data[:8] != _PNG_SIG:
        raise ValueError("png_decode: not a PNG (bad signature)")
    pos = 8
    w = h = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,), tag = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or interlace != 0 or color not in _COLOR_CHANNELS:
                raise ValueError(
                    f"png_decode: unsupported PNG (depth={depth}, "
                    f"color={color}, interlace={interlace}) — 8-bit "
                    "non-interlaced gray/GA/RGB/RGBA only")
            channels = _COLOR_CHANNELS[color]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("png_decode: missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = w * channels
    raw = raw.reshape(h, 1 + stride)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), np.int64)
    bpp = channels
    for y in range(h):
        f = filters[y]
        cur = rows[y]
        up = out[y - 1] if y else np.zeros(stride, np.int64)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: recon[x] = cur[x] + recon[x-bpp] → lane cumsum
            lanes = cur.reshape(-1, bpp)
            out[y] = np.cumsum(lanes, axis=0).reshape(-1) & 0xFF
        elif f == 2:  # Up
            out[y] = (cur + up) & 0xFF
        elif f == 3:  # Average (left dependency → per-pixel walk)
            row = out[y]
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (cur[x] + (left + up[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            row = out[y]
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                ul = up[x - bpp] if x >= bpp else 0
                row[x] = (cur[x] + _paeth(int(left), int(up[x]),
                                          int(ul))) & 0xFF
        else:
            raise ValueError(f"png_decode: bad filter {f} on row {y}")
    img = out.astype(np.uint8).reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


def resize_bilinear(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized bilinear resample of HxW[xC] uint8 (align-corners=False,
    the conventional pixel-center mapping)."""
    a = arr.astype(np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if arr.ndim == 2 else out


def ahash64(arr: np.ndarray) -> int:
    """Average hash: grayscale → 8×8 bilinear → 1 bit per cell
    (above/below mean), MSB-first — the classic perceptual near-dup key
    (identical content re-encoded hashes equal; hamming distance ≈
    visual distance)."""
    a = arr
    if a.ndim == 3:  # luma without a colorspace lib
        a = (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
             + 0.114 * a[:, :, 2]).astype(np.uint8)
    small = resize_bilinear(a, 8, 8).astype(np.float64)
    bits = (small > small.mean()).reshape(-1)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def wav_encode(samples: np.ndarray, rate: int = 16_000,
               channels: int = 1) -> bytes:
    """int16 PCM samples (frames×channels interleaved or 1-D mono) →
    WAV bytes via the stdlib wave module."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes → (int16 samples [frames×channels], rate, channels)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("wav_decode: 16-bit PCM only")
        rate = f.getframerate()
        ch = f.getnchannels()
        frames = f.readframes(f.getnframes())
    s = np.frombuffer(frames, np.int16)
    if ch > 1:
        s = s.reshape(-1, ch)
    return s, rate, ch
