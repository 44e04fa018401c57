"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Two tiers:
  - REAL decode for PNG images and PCM WAV audio via the stdlib codecs
    in ``ops/codecs.py`` (``DecodeImagePNG`` / ``ResizeImagePNG`` /
    ``AudioFeatureWav``) — actual pixels/samples, perceptual ahash,
    bilinear resize with re-encode, RMS energy features;
  - deterministic STUBS for formats that need a codec library the
    container doesn't ship (JPEG via PIL — gated, fail-fast; MP4 frame
    sampling). Same schemas and actor-pool shapes, so swapping in a real
    codec is a constructor change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import hash64

def _resolve_pil():
    """Lazy PIL import (not present in this container). Resolved at actor
    construction, not module import, so a full environment — or a test
    injecting a fake into sys.modules — exercises the real branch with no
    code change."""
    try:
        from PIL import Image  # type: ignore
        return Image
    except ImportError:
        return None


class DecodeImageStub:
    """Actor-pool stage: binary column → (width, height, n_bytes, phash).

    ``real=True``: decode with PIL (``Image.open`` per payload — the decode
    itself is inherently per-image; everything around it stays columnar).
    Raises at CONSTRUCTION time when PIL is absent, so a misconfigured
    pipeline fails fast instead of per batch. ``real=False`` (default here,
    since the container ships no image libs): deterministic fake decode with
    dimensions derived from the payload hash — same schema, same actor-pool
    shape. Keep ``batch_size`` small for large payloads — batch_size ×
    concurrency payloads live in worker heaps.
    """

    def __init__(self, binary_col: str = "payload", real: bool = False):
        self.binary_col = binary_col
        self.pil = None
        if real:
            self.pil = _resolve_pil()
            if self.pil is None:
                raise NotImplementedError(
                    "real image decode requires PIL, which this container "
                    "does not ship; use the deterministic stub (real=False)"
                )

    def _decode(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        width = (h % np.uint64(1920)).astype(np.int64) + 16
        height = (h // np.uint64(7) % np.uint64(1080)).astype(np.int64) + 16
        return width, height

    def _decode_real(self, payload) -> tuple[np.ndarray, np.ndarray]:
        import io

        widths = np.empty(len(payload), dtype=np.int64)
        heights = np.empty(len(payload), dtype=np.int64)
        for i, buf in enumerate(payload):
            with self.pil.open(io.BytesIO(buf.as_py())) as img:
                widths[i], heights[i] = img.size
        return widths, heights

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch[self.binary_col]
        n_bytes = pa.compute.cast(pa.compute.binary_length(payload), pa.int64())
        h = hash64(payload)
        if self.pil is not None:
            width, height = self._decode_real(
                payload.combine_chunks() if isinstance(payload, pa.ChunkedArray)
                else payload)
        else:
            width, height = self._decode(h)
        return (
            batch.drop_columns([self.binary_col])
            .append_column("n_bytes", n_bytes)
            .append_column("width", pa.array(width, pa.int64()))
            .append_column("height", pa.array(height, pa.int64()))
            .append_column("phash", pa.array(h.astype(np.int64), pa.int64()))
        )


def decode_binary_metadata(ds: rd.Dataset, binary_col: str,
                           concurrency=(1, 4), batch_size: int = 256,
                           real: bool = False) -> rd.Dataset:
    """Run the decode actor pool over a dataset with a binary column."""
    return ds.map_batches(
        DecodeImageStub,
        fn_constructor_kwargs={"binary_col": binary_col, "real": real},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ResizeImageStub:
    """Actor-pool stage: (payload, width, height) → resized payload metadata.

    Deterministic fake resize: output dims are the requested box preserving
    the stub aspect ratio; payload is replaced by a content-derived digest
    (a real deployment writes the resized bytes instead). Plumbing —
    signature, small batch size, actor pool — is the real shape."""

    def __init__(self, binary_col: str = "payload", max_w: int = 256,
                 max_h: int = 256):
        self.binary_col = binary_col
        self.max_w = max_w
        self.max_h = max_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch[self.binary_col]
        h64 = hash64(payload)
        w = (h64 % np.uint64(1920)).astype(np.float64) + 16
        h = (h64 // np.uint64(7) % np.uint64(1080)).astype(np.float64) + 16
        scale = np.minimum(1.0, np.minimum(self.max_w / w, self.max_h / h))
        out_w = np.maximum(1, np.floor(w * scale)).astype(np.int64)
        out_h = np.maximum(1, np.floor(h * scale)).astype(np.int64)
        return (
            batch.drop_columns([self.binary_col])
            .append_column("out_width", pa.array(out_w, pa.int64()))
            .append_column("out_height", pa.array(out_h, pa.int64()))
            .append_column("resized_digest",
                           pa.array((h64 ^ np.uint64(0x9E3779B97F4A7C15))
                                    .astype(np.int64), pa.int64()))
        )


class FrameSampleStub:
    """Actor-pool stage: video payload → one row per sampled frame
    (flat_map-shaped output: input rows expand). Frame count is derived
    deterministically from the payload hash; a real build decodes with
    ffmpeg/pyav here."""

    def __init__(self, binary_col: str = "payload", every_n: int = 10,
                 max_frames: int = 8):
        self.binary_col = binary_col
        self.every_n = every_n
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch[self.binary_col]
        h64 = hash64(payload)
        n_frames = (h64 % np.uint64(300)).astype(np.int64) + 1  # fake length
        sampled = np.minimum((n_frames + self.every_n - 1) // self.every_n,
                             self.max_frames)
        idx = np.repeat(np.arange(len(batch)), sampled)
        frame_no = np.concatenate(
            [np.arange(s) * self.every_n for s in sampled]
        ) if len(batch) else np.array([], np.int64)
        out = batch.drop_columns([self.binary_col]).take(pa.array(idx))
        return (
            out.append_column("frame_no", pa.array(frame_no, pa.int64()))
            .append_column("frame_digest", pa.array(
                (h64[idx] + frame_no.astype(np.uint64)).astype(np.int64),
                pa.int64()))
        )


class AudioFeatureStub:
    """Actor-pool stage: audio payload → fixed-length frame-energy vector
    (list<float32>) + duration. The feature layout (N windows of RMS
    energy — what a VAD / audio-quality gate consumes) is real; the
    decode is a deterministic stand-in that treats the payload bytes as
    the sample stream, since no audio codec ships in this container. A
    real build decodes with ffmpeg/soundfile in ``__init__``-loaded
    state, keeping this exact signature."""

    def __init__(self, binary_col: str = "payload", n_windows: int = 16,
                 sample_rate: int = 16_000):
        self.binary_col = binary_col
        self.n_windows = n_windows
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.binary_col].to_pylist()
        nw = self.n_windows
        feats = np.zeros((len(payloads), nw), np.float32)
        durations = np.zeros(len(payloads), np.float64)
        for i, p in enumerate(payloads):
            b = np.frombuffer(p or b"", np.uint8).astype(np.float32)
            durations[i] = len(b) / self.sample_rate
            if not len(b):
                continue
            # RMS energy per window over the "sample" stream
            splits = np.array_split(b - b.mean(), nw)
            feats[i] = [np.sqrt(np.mean(s * s)) if len(s) else 0.0
                        for s in splits]
        energy = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), nw)
        out = batch.drop_columns([self.binary_col])
        return (out.append_column("duration_sec",
                                  pa.array(durations, pa.float64()))
                .append_column("frame_energy", energy))


def audio_features(ds: rd.Dataset, binary_col: str, n_windows: int = 16,
                   concurrency=(1, 4), batch_size: int = 128) -> rd.Dataset:
    return ds.map_batches(
        AudioFeatureStub,
        fn_constructor_kwargs={"binary_col": binary_col,
                               "n_windows": n_windows},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


def resize_binary(ds: rd.Dataset, binary_col: str, max_w: int = 256,
                  max_h: int = 256, concurrency=(1, 4),
                  batch_size: int = 256) -> rd.Dataset:
    return ds.map_batches(
        ResizeImageStub,
        fn_constructor_kwargs={"binary_col": binary_col, "max_w": max_w,
                               "max_h": max_h},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


def frame_sample(ds: rd.Dataset, binary_col: str, every_n: int = 10,
                 max_frames: int = 8, concurrency=(1, 4),
                 batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(
        FrameSampleStub,
        fn_constructor_kwargs={"binary_col": binary_col, "every_n": every_n,
                               "max_frames": max_frames},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


# ---------------------------------------------------------------------------
# REAL decode stages (stdlib codecs — ops/codecs.py): PNG and PCM WAV
# ---------------------------------------------------------------------------
# The deterministic stubs above remain the plumbing for formats that need
# a codec library (JPEG, MP4 — PIL-gated). For PNG and WAV nothing
# beyond zlib/wave/numpy is required, so these stages decode, resize,
# hash and feature REAL payload bytes end-to-end in this container.


class DecodeImagePNG:
    """Actor-pool stage: PNG payload → (width, height, channels, n_bytes,
    ahash). ahash is the 64-bit average perceptual hash of the DECODED
    pixels — the image near-dup key (re-encoded identical content hashes
    equal, unlike a byte hash). Decode is inherently per-payload; keep
    batch_size small so batch × concurrency payloads fit worker heaps."""

    def __init__(self, binary_col: str = "payload"):
        from . import codecs
        self.codecs = codecs
        self.binary_col = binary_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch[self.binary_col]
        n = batch.num_rows
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        ch = np.zeros(n, np.int64)
        ah = np.zeros(n, np.int64)
        for i, buf in enumerate(payload.to_pylist()):
            img = self.codecs.png_decode(buf)
            hh, ww = img.shape[:2]
            w[i], h[i] = ww, hh
            ch[i] = 1 if img.ndim == 2 else img.shape[2]
            # uint64 ahash reinterpreted as int64 for arrow
            ah[i] = np.uint64(self.codecs.ahash64(img)).astype(np.int64)
        nb = pa.compute.cast(pa.compute.binary_length(payload), pa.int64())
        return (batch.drop_columns([self.binary_col])
                .append_column("n_bytes", nb)
                .append_column("width", pa.array(w, pa.int64()))
                .append_column("height", pa.array(h, pa.int64()))
                .append_column("channels", pa.array(ch, pa.int64()))
                .append_column("ahash", pa.array(ah, pa.int64())))


class ResizeImagePNG:
    """Actor-pool stage: PNG payload → RESIZED PNG payload (bilinear,
    aspect-preserving fit into max_w × max_h; images already inside the
    box pass through re-encoded) + output dims."""

    def __init__(self, binary_col: str = "payload", max_w: int = 64,
                 max_h: int = 64):
        from . import codecs
        self.codecs = codecs
        self.binary_col = binary_col
        self.max_w = max_w
        self.max_h = max_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload = []
        out_w = np.zeros(batch.num_rows, np.int64)
        out_h = np.zeros(batch.num_rows, np.int64)
        for i, buf in enumerate(batch[self.binary_col].to_pylist()):
            img = self.codecs.png_decode(buf)
            hh, ww = img.shape[:2]
            scale = min(1.0, self.max_w / ww, self.max_h / hh)
            tw = max(1, int(ww * scale))
            th = max(1, int(hh * scale))
            resized = self.codecs.resize_bilinear(img, tw, th)
            out_payload.append(self.codecs.png_encode(resized))
            out_w[i], out_h[i] = tw, th
        return (batch.drop_columns([self.binary_col])
                .append_column("payload", pa.array(out_payload, pa.binary()))
                .append_column("out_width", pa.array(out_w, pa.int64()))
                .append_column("out_height", pa.array(out_h, pa.int64())))


class AudioFeatureWav:
    """Actor-pool stage: PCM WAV payload → duration (from the REAL header)
    + n_windows RMS-energy vector over the decoded samples (mono-mixed) —
    what a VAD / audio-quality gate consumes."""

    def __init__(self, binary_col: str = "payload", n_windows: int = 16):
        from . import codecs
        self.codecs = codecs
        self.binary_col = binary_col
        self.n_windows = n_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        nw = self.n_windows
        n = batch.num_rows
        feats = np.zeros((n, nw), np.float32)
        durations = np.zeros(n, np.float64)
        rates = np.zeros(n, np.int64)
        for i, buf in enumerate(batch[self.binary_col].to_pylist()):
            s, rate, ch = self.codecs.wav_decode(buf)
            if ch > 1:
                s = s.mean(axis=1)
            x = s.astype(np.float64) / 32768.0
            rates[i] = rate
            durations[i] = len(x) / rate
            if len(x):
                for j, seg in enumerate(np.array_split(x, nw)):
                    feats[i, j] = np.sqrt(np.mean(seg * seg)) if len(seg) \
                        else 0.0
        energy = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), nw)
        return (batch.drop_columns([self.binary_col])
                .append_column("sample_rate", pa.array(rates, pa.int64()))
                .append_column("duration_sec",
                               pa.array(durations, pa.float64()))
                .append_column("frame_energy", energy))


def decode_png_metadata(ds: rd.Dataset, binary_col: str = "payload",
                        concurrency=(1, 4),
                        batch_size: int = 128) -> rd.Dataset:
    return ds.map_batches(
        DecodeImagePNG, fn_constructor_kwargs={"binary_col": binary_col},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


def resize_png(ds: rd.Dataset, binary_col: str = "payload",
               max_w: int = 64, max_h: int = 64, concurrency=(1, 4),
               batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(
        ResizeImagePNG,
        fn_constructor_kwargs={"binary_col": binary_col, "max_w": max_w,
                               "max_h": max_h},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


def wav_features(ds: rd.Dataset, binary_col: str = "payload",
                 n_windows: int = 16, concurrency=(1, 4),
                 batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(
        AudioFeatureWav,
        fn_constructor_kwargs={"binary_col": binary_col,
                               "n_windows": n_windows},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


def synth_png_payloads(ids: np.ndarray) -> list[bytes]:
    """Deterministic real PNG payloads for tests/queries: per id, a small
    RGB gradient+sinusoid pattern with id-derived dimensions. ids with
    equal value produce byte-identical payloads (ahash dup pairs)."""
    from . import codecs
    out = []
    for i in ids:
        i = int(i)
        w = 24 + (i * 7) % 40
        h = 20 + (i * 11) % 32
        yy, xx = np.mgrid[0:h, 0:w]
        r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
        g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
        b = ((np.sin(xx / 3.0 + i) + 1) * 127).astype(np.uint8)
        out.append(codecs.png_encode(np.stack([r, g, b], axis=2)))
    return out


def synth_wav_payloads(ids: np.ndarray, rate: int = 8000) -> list[bytes]:
    """Deterministic real WAV payloads: per id, a tone at an id-derived
    frequency and duration."""
    from . import codecs
    out = []
    for i in ids:
        i = int(i)
        freq = 110.0 * (1 + (i % 16))
        dur = 0.25 + (i % 4) * 0.125
        t = np.arange(int(rate * dur)) / rate
        s = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
        out.append(codecs.wav_encode(s, rate, 1))
    return out


class FrameSampleGIF:
    """Actor-pool stage: REAL animated-GIF payload → one row per sampled
    frame (every_n-th, capped at max_frames; flat_map-shaped output).
    Per frame: its index, delay (centiseconds, from the real Graphic
    Control Extensions) and the perceptual ahash of the decoded RGB
    frame — the key a video near-dup / scene-cut pass consumes."""

    def __init__(self, binary_col: str = "payload", every_n: int = 2,
                 max_frames: int = 8):
        from . import codecs
        self.codecs = codecs
        self.binary_col = binary_col
        self.every_n = every_n
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx_rows: list[int] = []
        frame_no: list[int] = []
        delays_out: list[int] = []
        hashes: list[int] = []
        n_frames_out: list[int] = []
        for i, buf in enumerate(batch[self.binary_col].to_pylist()):
            frames, palettes, delays = self.codecs.gif_decode(buf)
            take = list(range(0, len(frames), self.every_n))[
                :self.max_frames]
            for fno in take:
                # index → RGB via the frame's own palette
                rgb = palettes[fno][frames[fno]]
                idx_rows.append(i)
                frame_no.append(fno)
                delays_out.append(delays[fno])
                hashes.append(int(np.uint64(self.codecs.ahash64(rgb))
                                  .astype(np.int64)))
                n_frames_out.append(len(frames))
        out = batch.drop_columns([self.binary_col]) \
            .take(pa.array(idx_rows, pa.int64()))
        return (out
                .append_column("n_frames", pa.array(n_frames_out, pa.int64()))
                .append_column("frame_no", pa.array(frame_no, pa.int64()))
                .append_column("delay_cs", pa.array(delays_out, pa.int64()))
                .append_column("frame_ahash", pa.array(hashes, pa.int64())))


def gif_frame_sample(ds: rd.Dataset, binary_col: str = "payload",
                     every_n: int = 2, max_frames: int = 8,
                     concurrency=(1, 4), batch_size: int = 32) -> rd.Dataset:
    return ds.map_batches(
        FrameSampleGIF,
        fn_constructor_kwargs={"binary_col": binary_col, "every_n": every_n,
                               "max_frames": max_frames},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


def synth_gif_payloads(ids: np.ndarray) -> list[bytes]:
    """Deterministic real animated GIFs: per id, a moving-bar animation
    with id-derived frame count (3-8), dims and palette."""
    from . import codecs
    out = []
    for i in ids:
        i = int(i)
        w = 20 + (i * 5) % 24
        h = 16 + (i * 3) % 16
        n_frames = 3 + i % 6
        pal = np.array([[(16 * j) % 256, (32 * j) % 256, (64 * j) % 256]
                        for j in range(16)], np.uint8)
        frames = []
        for f in range(n_frames):
            fr = np.full((h, w), (i + f) % 4, np.uint8)
            bar = (f * w // n_frames) % w
            fr[:, bar] = 8 + (f % 8)
            frames.append(fr)
        out.append(codecs.gif_encode(frames, pal, delay_cs=4 + i % 5))
    return out


class KeyframeSelectGIF:
    """Actor-pool stage: REAL animated-GIF payload → the top-k KEYFRAMES
    by scene-change energy (mean |ΔRGB| vs the previous decoded frame;
    frame 0 always scores +inf as the opening shot). The shot-boundary
    selection a video-curation pass runs before embedding: only the
    frames where the picture actually changes move downstream, not an
    every-n-th blind sample. One row per kept frame with its change
    energy and decoded-pixel ahash."""

    def __init__(self, binary_col: str = "payload", k: int = 3):
        from . import codecs
        self.codecs = codecs
        self.binary_col = binary_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx_rows: list[int] = []
        frame_no: list[int] = []
        energy: list[float] = []
        hashes: list[int] = []
        for i, buf in enumerate(batch[self.binary_col].to_pylist()):
            frames, palettes, _delays = self.codecs.gif_decode(buf)
            rgbs = [palettes[f_i][fr].astype(np.int16)
                    for f_i, fr in enumerate(frames)]
            if not rgbs:
                continue
            e = np.empty(len(rgbs))
            e[0] = np.inf
            for j in range(1, len(rgbs)):
                e[j] = float(np.abs(rgbs[j] - rgbs[j - 1]).mean())
            # top-k by (energy desc, frame asc) — deterministic ties
            order = np.lexsort((np.arange(len(e)), -e))[:self.k]
            for fno in sorted(int(x) for x in order):
                idx_rows.append(i)
                frame_no.append(fno)
                energy.append(float(e[fno]) if np.isfinite(e[fno])
                              else -1.0)  # opening frame sentinel
                hashes.append(int(np.uint64(
                    self.codecs.ahash64(palettes[fno][frames[fno]]))
                    .astype(np.int64)))
        out = batch.drop_columns([self.binary_col]) \
            .take(pa.array(idx_rows, pa.int64()))
        return (out
                .append_column("frame_no", pa.array(frame_no, pa.int64()))
                .append_column("change_energy",
                               pa.array(energy, pa.float64()))
                .append_column("frame_ahash", pa.array(hashes, pa.int64())))


def gif_keyframes(ds: rd.Dataset, binary_col: str = "payload", k: int = 3,
                  concurrency=(1, 4), batch_size: int = 32) -> rd.Dataset:
    return ds.map_batches(
        KeyframeSelectGIF,
        fn_constructor_kwargs={"binary_col": binary_col, "k": k},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


class DecodeImageJPEG:
    """Actor-pool stage: baseline JPEG payload → (width, height, channels,
    n_bytes, ahash of the DECODED pixels). REAL decode via the pure
    numpy/stdlib baseline-sequential codec in ops/codecs.py (table-driven
    from the stream: DQT/DHT parsed per file; 4:4:4 / 4:2:2 / 4:2:0) — no
    PIL. Same shape and contract as DecodeImagePNG; the PIL-gated
    DecodeImageStub remains only for formats that genuinely need a codec
    library (progressive JPEG, WebP, MP4)."""

    def __init__(self, binary_col: str = "payload"):
        from . import codecs
        self.codecs = codecs
        self.binary_col = binary_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch[self.binary_col]
        n = batch.num_rows
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        ch = np.zeros(n, np.int64)
        ah = np.zeros(n, np.int64)
        for i, buf in enumerate(payload.to_pylist()):
            img = self.codecs.jpeg_decode(buf)
            hh, ww = img.shape[:2]
            w[i], h[i] = ww, hh
            ch[i] = 1 if img.ndim == 2 else img.shape[2]
            ah[i] = np.uint64(self.codecs.ahash64(img)).astype(np.int64)
        nb = pa.compute.cast(pa.compute.binary_length(payload), pa.int64())
        return (batch.drop_columns([self.binary_col])
                .append_column("n_bytes", nb)
                .append_column("width", pa.array(w, pa.int64()))
                .append_column("height", pa.array(h, pa.int64()))
                .append_column("channels", pa.array(ch, pa.int64()))
                .append_column("ahash", pa.array(ah, pa.int64())))


def decode_jpeg_metadata(ds: rd.Dataset, binary_col: str = "payload",
                         concurrency=(1, 4),
                         batch_size: int = 128) -> rd.Dataset:
    return ds.map_batches(
        DecodeImageJPEG, fn_constructor_kwargs={"binary_col": binary_col},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


def synth_jpeg_payloads(ids: np.ndarray) -> list[bytes]:
    """Deterministic real baseline-JPEG payloads for tests/queries: per
    id, an RGB gradient+sinusoid with id-derived dimensions; even ids
    encode 4:4:4, odd ids 4:2:0 (so a corpus exercises both decode
    paths). Equal ids produce byte-identical payloads."""
    from . import codecs
    out = []
    for i in ids:
        i = int(i)
        w = 24 + (i * 7) % 40
        h = 20 + (i * 11) % 32
        yy, xx = np.mgrid[0:h, 0:w]
        r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
        g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
        b = ((np.sin(xx / 3.0 + i) + 1) * 127).astype(np.uint8)
        img = np.stack([r, g, b], axis=2)
        out.append(codecs.jpeg_encode(
            img, 75, subsampling="444" if i % 2 == 0 else "420"))
    return out


class ResizeImageJPEG:
    """Actor-pool stage: baseline JPEG payload → RESIZED JPEG payload
    (bilinear, aspect-preserving fit into max_w × max_h; images already
    inside the box pass through re-encoded) + output dims. Decode and
    re-encode both ride the pure numpy/stdlib baseline codec; output
    bytes are deterministic (fixed tables/quality/subsampling)."""

    def __init__(self, binary_col: str = "payload", max_w: int = 64,
                 max_h: int = 64, quality: int = 75):
        from . import codecs
        self.codecs = codecs
        self.binary_col = binary_col
        self.max_w = max_w
        self.max_h = max_h
        self.quality = quality

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload = []
        out_w = np.zeros(batch.num_rows, np.int64)
        out_h = np.zeros(batch.num_rows, np.int64)
        for i, buf in enumerate(batch[self.binary_col].to_pylist()):
            img = self.codecs.jpeg_decode(buf)
            hh, ww = img.shape[:2]
            scale = min(1.0, self.max_w / ww, self.max_h / hh)
            tw = max(1, int(ww * scale))
            th = max(1, int(hh * scale))
            resized = self.codecs.resize_bilinear(img, tw, th)
            out_payload.append(self.codecs.jpeg_encode(
                resized, self.quality))
            out_w[i], out_h[i] = tw, th
        return (batch.drop_columns([self.binary_col])
                .append_column("payload", pa.array(out_payload, pa.binary()))
                .append_column("out_width", pa.array(out_w, pa.int64()))
                .append_column("out_height", pa.array(out_h, pa.int64())))


def resize_jpeg(ds: rd.Dataset, binary_col: str = "payload",
                max_w: int = 64, max_h: int = 64,
                concurrency=(1, 4), batch_size: int = 128) -> rd.Dataset:
    return ds.map_batches(
        ResizeImageJPEG,
        fn_constructor_kwargs={"binary_col": binary_col, "max_w": max_w,
                               "max_h": max_h},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)
