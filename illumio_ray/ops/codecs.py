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
    """Encode HxW (gray), HxWx2 (gray+alpha), HxWx3 (RGB) or HxWx4
    (RGBA) uint8 → PNG bytes. Filter 0 on every row; fixed zlib level →
    deterministic bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
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
    if a.ndim == 3 and a.shape[2] >= 3:  # luma without a colorspace lib
        a = (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
             + 0.114 * a[:, :, 2]).astype(np.uint8)
    elif a.ndim == 3:  # gray+alpha: hash the gray channel
        a = a[:, :, 0]
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


# ---------------------------------------------------------------------------
# GIF (animated, palette-indexed) — LZW in pure Python/numpy
# ---------------------------------------------------------------------------

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW over palette indices (variable code width,
    CLEAR/END codes, dict capped at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def reset():
        return {(i,): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = reset()
    out_bits.append((clear, width))
    buf: tuple = ()
    for px in indices.tolist():
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            out_bits.append((clear, width))
            table, next_code, width = reset()
        buf = (px,)
    if buf:
        out_bits.append((table[buf], width))
    out_bits.append((end, width))
    # pack LSB-first
    acc = 0
    nbits = 0
    by = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            by.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        by.append(acc & 0xFF)
    return bytes(by)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif lzw: truncated code stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif lzw: code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap a byte stream into GIF ≤255-byte sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_encode(frames: list[np.ndarray], palette: np.ndarray,
               delay_cs: int = 4) -> bytes:
    """Animated GIF89a from palette-index frames (each HxW uint8 indices
    into ``palette`` (K≤256 rows of RGB)). Deterministic bytes."""
    if not frames:
        raise ValueError("gif_encode: no frames")
    h, w = frames[0].shape
    pal = np.ascontiguousarray(palette, np.uint8)
    k = len(pal)
    depth = max(2, int(np.ceil(np.log2(max(k, 2)))))  # table size ≥ 4
    table = np.zeros((1 << depth, 3), np.uint8)
    table[:k] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4)
                       | (depth - 1), 0, 0)
    out += table.tobytes()
    # NETSCAPE loop extension (loop forever) — the standard animation marker
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, depth)
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("gif_encode: frames must share dimensions")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(f.reshape(-1), min_code))
    out += b"\x3b"
    return bytes(out)


def gif_decode(data: bytes):
    """Decode a GIF87a/89a (non-interlaced) → (frames [HxW uint8 index
    arrays], palettes [Kx3 uint8, one per frame], delays_cs). Partial
    frames composite onto the PREVIOUS canvas ("do not dispose" — the
    common delta-encoding); disposal methods 2/3 (restore background /
    previous) raise a clear error rather than decoding wrong pixels.
    Each frame's palette is its local color table when present, else the
    global one; the per-frame GCE delay applies to its own frame only."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif_decode: not a GIF")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_pal = np.zeros((0, 3), np.uint8)
    if flags & 0x80:
        k = 2 << (flags & 0x07)
        global_pal = np.frombuffer(data[pos:pos + 3 * k],
                                   np.uint8).reshape(k, 3).copy()
        pos += 3 * k
    frames: list[np.ndarray] = []
    palettes: list[np.ndarray] = []
    delays: list[int] = []
    delay = 0
    canvas = np.zeros((h, w), np.uint8)
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:
                gce_flags = data[pos + 1]
                disposal = (gce_flags >> 2) & 0x07
                if disposal in (2, 3):
                    raise ValueError(
                        "gif_decode: disposal method "
                        f"{disposal} (restore background/previous) "
                        "unsupported — frames would decode wrong")
                delay = struct.unpack("<H", data[pos + 2:pos + 4])[0]
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            fx, fy, fw, fh, iflags = struct.unpack("<HHHHB",
                                                   data[pos:pos + 9])
            pos += 9
            if iflags & 0x40:
                raise ValueError("gif_decode: interlaced GIFs unsupported")
            pal = global_pal
            if iflags & 0x80:  # local color table: THIS frame only
                k = 2 << (iflags & 0x07)
                pal = np.frombuffer(data[pos:pos + 3 * k],
                                    np.uint8).reshape(k, 3).copy()
                pos += 3 * k
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos]:
                ln = data[pos]
                stream += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(stream), min_code, fw * fh)
            canvas = canvas.copy()  # composite onto the previous frame
            canvas[fy:fy + fh, fx:fx + fw] = idx.reshape(fh, fw)
            frames.append(canvas)
            palettes.append(pal)
            delays.append(delay)
            delay = 0  # a GCE applies to exactly one following image
        else:
            raise ValueError(f"gif_decode: unexpected block 0x{b0:02x}")
    return frames, palettes, delays
