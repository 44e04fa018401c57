"""Deterministic vectorized hashing (salting, content hashes, sketches).

All hashes are stable across processes and Python versions (no builtin
``hash`` — PYTHONHASHSEED-dependent). Used for: skew-defusing salts
(SURVEY.md §4), lineage content hashes (≙ reference state manifest,
app/s3_manager.py:253-267), dedup keys, MinHash/SimHash sketches.
"""

from __future__ import annotations

import os

# Per-batch hash calls are small; polars' default Rust thread pool is one
# thread per CPU per PROCESS, and 32 Ray workers x 32 threads oversubscribes
# the box. Must be set before the first polars import in the process.
os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def hash64(values, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hash of a string/bytes/numeric array → uint64 ndarray.

    Vectorized end-to-end: Arrow columns enter polars zero-copy and hash in
    Rust (xxhash family). The earlier implementation routed every column
    through ``pandas.to_numpy(dtype=object)`` + per-object ``hash_array`` —
    ~80× slower on 2M strings — and sat under the flagship sink's content
    hashes and every dedup operator. Values are deterministic across
    processes/runs for the pinned polars version (no builtin ``hash`` —
    PYTHONHASHSEED-dependent)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(values)
    elif isinstance(values, pd.Series):
        s = pl.from_pandas(values)
    else:
        s = pl.Series(values)
    if len(s) == 0:
        return np.array([], dtype=np.uint64)
    return s.hash(seed=seed).to_numpy()


def salt_column(urls, num_salts: int = 16) -> np.ndarray:
    """Skew-defusing salt: hash(url) % K as int32 (SURVEY.md §4 'skew')."""
    return (hash64(urls) % np.uint64(num_salts)).astype(np.int32)


def combine_unordered(hashes: np.ndarray) -> int:
    """Order-insensitive combiner (sum mod 2^64) for partition content
    hashes — equal row-sets hash equal regardless of block order."""
    return int(np.bitwise_and(np.add.reduce(hashes.astype(np.uint64), initial=np.uint64(0)), _MASK64))


def minhash_signatures(token_sets: list[np.ndarray], num_perm: int = 64,
                       seed: int = 7) -> np.ndarray:
    """MinHash signatures over pre-hashed token arrays.

    For each doc: sig[j] = min over tokens of (a_j * h + b_j mod 2^61).
    Vectorized per document over all permutations at once.
    """
    rng = np.random.default_rng(seed)
    mersenne = np.uint64((1 << 61) - 1)
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    out = np.full((len(token_sets), num_perm), mersenne, dtype=np.uint64)
    for i, toks in enumerate(token_sets):
        if len(toks) == 0:
            continue
        # (T,1)*(P,) broadcasting; values fit: (2^61-1)*(2^61-1) overflows u64,
        # so reduce token hashes into 61-bit space first.
        t = (toks.astype(np.uint64) & mersenne)[:, None]
        v = (t * a + b) % mersenne
        out[i] = v.min(axis=0)
    return out


def simhash64(token_sets: list[np.ndarray], weights: list[np.ndarray] | None = None) -> np.ndarray:
    """64-bit SimHash per document from pre-hashed tokens."""
    n = len(token_sets)
    out = np.zeros(n, dtype=np.uint64)
    bits = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, toks in enumerate(token_sets):
        if len(toks) == 0:
            continue
        t = toks.astype(np.uint64)
        w = weights[i] if weights is not None else np.ones(len(t))
        # (T, 64) sign matrix
        signs = ((t[:, None] & bits[None, :]) != 0).astype(np.float64) * 2 - 1
        agg = (signs * w[:, None]).sum(axis=0)
        out[i] = np.bitwise_or.reduce(bits[agg > 0], initial=np.uint64(0)) if (agg > 0).any() else np.uint64(0)
    return out
