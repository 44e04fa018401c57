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

try:  # real decoder gated behind an import-try (not present in sandbox)
    import PIL.Image  # type: ignore  # noqa: F401
    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


class DecodeImageStub:
    """Actor-pool stage: binary column → (width, height, n_bytes, phash).

    Deterministic fake: dimensions derived from the payload hash. A real
    deployment overrides ``_decode``. Keep ``batch_size`` small for large
    payloads — batch_size × concurrency payloads live in worker heaps.
    """

    def __init__(self, binary_col: str = "payload", real: bool = False):
        self.binary_col = binary_col
        if real:
            if not _HAS_PIL:
                raise NotImplementedError(
                    "real image decode requires PIL, which this container "
                    "does not ship; use the deterministic stub (real=False)"
                )
            raise NotImplementedError("real decode path not wired up yet")

    def _decode(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        width = (h % np.uint64(1920)).astype(np.int64) + 16
        height = (h // np.uint64(7) % np.uint64(1080)).astype(np.int64) + 16
        return width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch[self.binary_col]
        n_bytes = pa.compute.cast(pa.compute.binary_length(payload), pa.int64())
        h = hash64(payload.to_pandas())
        width, height = self._decode(h)
        return (
            batch.drop_columns([self.binary_col])
            .append_column("n_bytes", n_bytes)
            .append_column("width", pa.array(width, pa.int64()))
            .append_column("height", pa.array(height, pa.int64()))
            .append_column("phash", pa.array(h.astype(np.int64), pa.int64()))
        )


def decode_binary_metadata(ds: rd.Dataset, binary_col: str,
                           concurrency=(1, 4), batch_size: int = 256) -> rd.Dataset:
    """Run the decode actor pool over a dataset with a binary column."""
    return ds.map_batches(
        DecodeImageStub,
        fn_constructor_kwargs={"binary_col": binary_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
