"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Ray-side plumbing (schema, actor-pool stage signature, small batch
sizes for large payloads, output layout) is real and tested; the actual
codec work is stubbed because no image/audio libraries ship in this
container. ``DecodeImageStub`` produces a deterministic fake decode so
pipelines and tests are end-to-end runnable; swap ``_decode`` for a real
PIL/ffmpeg call in a full environment.
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
