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


# ---------------------------------------------------------------------------
# JPEG (ITU-T T.81 baseline sequential DCT) — pure numpy/stdlib
# ---------------------------------------------------------------------------
# Encoder: 8-bit gray or RGB, 4:4:4 (no subsampling), fixed quality,
# standard Annex-K quantization + Huffman tables → deterministic bytes.
# Decoder: table-driven from the stream (DQT/DHT/SOF0 parsed from the
# file), baseline sequential only, 1- or 3-component, arbitrary h/v
# sampling factors in {1,2} (so 4:2:0 camera output decodes too);
# progressive (SOF2), arithmetic coding and restart intervals raise a
# clear ValueError — honest fail-fast, same policy as the MP4 stub.

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], np.int64)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.float64).reshape(8, 8)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.float64).reshape(8, 8)

# Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                 list(range(12)))
_DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                   list(range(12)))
_AC_LUMA_SPEC = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA_SPEC = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    # Orthonormal 8-point DCT-II basis: C[u,x] = a(u)·cos((2x+1)uπ/16)
    x = np.arange(8)
    u = x[:, None]
    c = np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    c *= np.sqrt(2.0 / 8)
    c[0] *= np.sqrt(0.5)
    return c


_DCT_C = _dct_matrix()


def _huff_codes(spec) -> dict[int, tuple[int, int]]:
    """BITS/HUFFVAL → {symbol: (code, length)} (canonical order)."""
    bits, vals = spec
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = np.floor((base * scale + 50) / 100)
    return np.clip(t, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (size, amplitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """H×W (multiple of 8) → (n_blocks_y, n_blocks_x, 8, 8) view order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def jpeg_encode(arr: np.ndarray, quality: int = 75,
                subsampling: str = "444") -> bytes:
    """Encode H×W (gray) or H×W×3 (RGB) uint8 → baseline JFIF JPEG,
    standard Annex-K tables scaled at ``quality`` — deterministic bytes
    (fixed tables, fixed rounding). ``subsampling``: "444" (no chroma
    subsampling) or "420" (2×2 box-averaged chroma, the camera default —
    also exercises the decoder's upsampling path)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("jpeg_encode: expected HxW gray or HxWx3 RGB")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("jpeg_encode: empty image")
    # pad to multiples of 8 by edge replication
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        a = np.pad(a, ((0, ph), (0, pw)) + (() if gray else ((0, 0),)),
                   mode="edge")
    sub420 = (not gray) and subsampling == "420"
    if subsampling not in ("444", "420"):
        raise ValueError("jpeg_encode: subsampling must be '444' or '420'")
    if gray:
        comps = [(a.astype(np.float64) - 128.0, 1, 1)]
    else:
        r = a[:, :, 0].astype(np.float64)
        g = a[:, :, 1].astype(np.float64)
        b = a[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub420:
            # pad the full-res planes to multiples of 16 so the Y block
            # grid is 2x2 per MCU and the box-averaged chroma grid is 8-
            # aligned to the same MCU count
            ph2, pw2 = (-y.shape[0]) % 16, (-y.shape[1]) % 16
            if ph2 or pw2:
                y, cb, cr = (np.pad(p, ((0, ph2), (0, pw2)), mode="edge")
                             for p in (y, cb, cr))
            cb = cb.reshape(cb.shape[0] // 2, 2,
                            cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2,
                            cr.shape[1] // 2, 2).mean(axis=(1, 3))
            comps = [(y - 128.0, 2, 2), (cb - 128.0, 1, 1),
                     (cr - 128.0, 1, 1)]
        else:
            comps = [(y - 128.0, 1, 1), (cb - 128.0, 1, 1),
                     (cr - 128.0, 1, 1)]

    qs = [_scaled_q(_Q_LUMA, quality), _scaled_q(_Q_CHROMA, quality)]
    # vectorized DCT + quantize per plane; keep each component's blocks
    # as a (BY, BX, 8, 8) grid for MCU-ordered entropy coding
    grids = []
    for ci, (p, hf, vf) in enumerate(comps):
        blocks = _blocks_of(p)
        d = np.einsum("ux,nxy,vy->nuv", _DCT_C, blocks, _DCT_C)
        q = qs[0 if ci == 0 else 1]
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        grids.append(np.round(d / q).astype(np.int64).reshape(by, bx, 8, 8))

    dc_tabs = [_huff_codes(_DC_LUMA_SPEC), _huff_codes(_DC_CHROMA_SPEC)]
    ac_tabs = [_huff_codes(_AC_LUMA_SPEC), _huff_codes(_AC_CHROMA_SPEC)]

    bw = _BitWriter()
    hmax = max(hf for _, hf, _ in comps)
    vmax = max(vf for _, _, vf in comps)
    mcuy = grids[0].shape[0] // comps[0][2]
    mcux = grids[0].shape[1] // comps[0][1]
    pred = [0] * len(comps)
    zz_r, zz_c = _ZIGZAG // 8, _ZIGZAG % 8
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_, hf, vf) in enumerate(comps):
                for iy in range(vf):
                    for ix in range(hf):
                        _put_block(bw, grids[ci][my * vf + iy, mx * hf + ix],
                                   dc_tabs[0 if ci == 0 else 1],
                                   ac_tabs[0 if ci == 0 else 1],
                                   pred, ci, zz_r, zz_c)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qs[: 1 if gray else 2]):
        zzq = q[zz_r, zz_c].astype(np.uint8)
        out += seg(0xFFDB, bytes([tid]) + zzq.tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (_, hf, vf) in enumerate(comps):
        sof += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    specs = ([(0x00, _DC_LUMA_SPEC), (0x10, _AC_LUMA_SPEC)] if gray else
             [(0x00, _DC_LUMA_SPEC), (0x10, _AC_LUMA_SPEC),
              (0x01, _DC_CHROMA_SPEC), (0x11, _AC_CHROMA_SPEC)])
    for tc, (bits, vals) in specs:
        out += seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _put_block(bw: "_BitWriter", blk: np.ndarray, dc_tab, ac_tab,
               pred: list, ci: int, zz_r, zz_c) -> None:
    zz = blk[zz_r, zz_c]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size, amp = _magnitude(diff)
    code, ln = dc_tab[size]
    bw.put(code, ln)
    if size:
        bw.put(amp, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        size, amp = _magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.put(code, ln)
        bw.put(amp, size)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.put(code, ln)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("jpeg_decode: truncated scan")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _huff_decoder(bits, vals):
    """BITS/HUFFVAL → {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_read(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg_decode: invalid Huffman code")


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG → H×W (gray) or H×W×3 (RGB)
    uint8. Table-driven from the stream; h/v sampling factors in {1,2}
    (4:4:4, 4:2:2, 4:2:0); raises ValueError on progressive (SOF2),
    arithmetic coding, >8-bit precision, or restart intervals."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg_decode: not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    scan = None
    zz_r, zz_c = _ZIGZAG // 8, _ZIGZAG % 8
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg_decode: marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2: pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ValueError("jpeg_decode: 16-bit DQT unsupported")
                tab = np.zeros((8, 8), np.float64)
                tab[zz_r, zz_c] = np.frombuffer(body, np.uint8, 64, b + 1)
                qtabs[tq] = tab
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1: b + 17])
                n = sum(bits)
                vals = list(body[b + 17: b + 17 + n])
                htabs[(tc, th)] = _huff_decoder(bits, vals)
                b += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("jpeg_decode: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise ValueError("jpeg_decode: progressive JPEG unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg_decode: non-baseline frame unsupported")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", body, 0)
            if ri:
                raise ValueError("jpeg_decode: restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sel = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0xF)
            # entropy data runs from pos to the next real marker
            end = pos
            while end < len(data) - 1:
                if data[end] == 0xFF and data[end + 1] not in (0x00,) \
                        and not (0xD0 <= data[end + 1] <= 0xD7):
                    break
                end += 1
            raw = data[pos:end]
            scan = (sel, raw.replace(b"\xff\x00", b"\xff"))
            pos = end
        # APPn / COM / others: skipped via length
    if frame is None or scan is None:
        raise ValueError("jpeg_decode: missing SOF/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(c["h"] in (1, 2) and c["v"] in (1, 2) for c in comps):
        raise ValueError("jpeg_decode: sampling factors beyond 2 unsupported")
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    sel, raw = scan
    br = _BitReader(raw)
    # per-component coefficient planes (padded to MCU grid)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               np.float64))
    pred = [0] * len(comps)
    coef_blocks = [[] for _ in comps]
    block_pos = [[] for _ in comps]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                td, ta = sel[c["id"]]
                dct = htabs[(0, td)]
                act = htabs[(1, ta)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.float64)
                        size = _huff_read(br, dct)
                        diff = _extend(br.read(size), size) if size else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k <= 63:
                            rs = _huff_read(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "jpeg_decode: AC index out of range")
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        coef_blocks[ci].append(zz)
                        block_pos[ci].append(
                            (my * c["v"] + by, mx * c["h"] + bx))
    # dequantize + IDCT vectorized per component, then place blocks
    out_planes = []
    for ci, c in enumerate(comps):
        q = qtabs[c["tq"]]
        zz = np.array(coef_blocks[ci])
        blk = np.zeros((len(zz), 8, 8), np.float64)
        blk[:, zz_r, zz_c] = zz
        blk *= q
        pix = np.einsum("xu,nuv,yv->nxy", _DCT_C.T, blk, _DCT_C.T)
        pix += 128.0
        p = planes[ci]
        for bi, (by, bx) in enumerate(block_pos[ci]):
            p[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = pix[bi]
        # upsample to full MCU-grid resolution, crop to image
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
