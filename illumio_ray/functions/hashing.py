"""Deterministic vectorized hashing (salting, content hashes, sketches).

All hashes are stable across processes and Python versions (no builtin
``hash`` — PYTHONHASHSEED-dependent). Used for: skew-defusing salts
(SURVEY.md §4), lineage content hashes (≙ reference state manifest,
app/s3_manager.py:253-267), dedup keys, MinHash/SimHash sketches.

hash64 vs stable_hash64 — WHICH KEYS WHICH PERSISTED ARTIFACT:
  hash64 (polars xxhash — stable only within one polars version, pinned
  in requirements.txt) may key only state whose lifetime is ONE run:
    - in-flight exchange buckets (grouped_agg/dedup/exchange salts);
    - flagship content-addressed part filenames + manifest content_hash
      (pipelines/flagship.py): retry-safety needs within-run stability
      only — uncommitted shards are swept wholesale on resume, committed
      shards are never recomputed, so a polars upgrade between runs
      cannot break exactly-once.
  stable_hash64 (pinned splitmix/FNV path in THIS file) must key anything
  written in one run and re-read by a later one:
    - bucketed layouts + upsert/vacuum/point lookups (ops/bucketing.py);
    - the persisted shingle index (ops/dedup.py, with its scheme marker);
    - z-order cell keys where persisted (ops/relational.py callers).
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


# ---------------------------------------------------------------------------
# version-stable hashing for PERSISTED artifacts
# ---------------------------------------------------------------------------
# polars documents Series.hash as stable only within a polars version, so
# hash64 must never decide anything that outlives the current process tree
# (a bucketed layout written under one polars and joined under another
# would silently drop join rows). stable_hash64 is pinned by THIS code:
# a polynomial rolling hash over the raw bytes (natural uint64 wraparound)
# with a splitmix64 finalizer, vectorized via Arrow buffers + cumsum.

_FNV_PRIME = np.uint64(0x100000001B3)
_POW_CACHE = np.array([1], dtype=np.uint64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return x ^ (x >> np.uint64(31))


def _powers(n: int) -> np.ndarray:
    global _POW_CACHE
    if len(_POW_CACHE) < n:
        m = max(n, 2 * len(_POW_CACHE))
        _POW_CACHE = np.concatenate(
            [np.array([1], np.uint64),
             np.cumprod(np.full(m - 1, _FNV_PRIME, np.uint64))])  # wraps mod 2^64
    return _POW_CACHE


def stable_hash64(values, seed: int = 0) -> np.ndarray:
    """Version-stable 64-bit hash → uint64 ndarray. Same contract as
    hash64 but with values guaranteed stable across library upgrades —
    REQUIRED for anything persisted and re-read later (bucketed layouts:
    same key must land in the same bucket in any run of any build).
    ~3-5x slower than the polars path; use hash64 for within-run keys."""
    if isinstance(values, pd.Series):
        values = pa.Array.from_pandas(values)
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(values)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if len(values) == 0:
        return np.array([], dtype=np.uint64)
    sd = _splitmix64(np.array([seed], np.uint64))[0]
    if pa.types.is_integer(values.type) or pa.types.is_floating(values.type):
        v = values.cast(pa.int64(), safe=False) if pa.types.is_integer(values.type) else values
        raw = np.ascontiguousarray(
            v.to_numpy(zero_copy_only=False)).view(np.uint64) \
            if pa.types.is_floating(values.type) else \
            v.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        return _splitmix64(raw ^ sd)
    b = values.cast(pa.large_binary()) if not pa.types.is_large_binary(values.type) else values
    offsets = np.frombuffer(b.buffers()[1], dtype=np.int64,
                            count=b.offset + len(b) + 1)[b.offset:]
    lens = np.diff(offsets)
    flat = np.frombuffer(b.buffers()[2], dtype=np.uint8,
                         count=int(offsets[-1]))[offsets[0]:].astype(np.uint64)
    starts = (offsets[:-1] - offsets[0]).astype(np.int64)
    n_bytes = len(flat)
    if n_bytes:
        pos = np.arange(n_bytes, dtype=np.int64) - np.repeat(starts, lens)
        exp = np.repeat(lens, lens) - 1 - pos
        terms = flat * _powers(int(lens.max()))[exp]     # wraps mod 2^64
        c = np.concatenate([np.zeros(1, np.uint64), np.cumsum(terms)])
        h = c[starts + lens] - c[starts]                 # modular segment sums
    else:
        h = np.zeros(len(lens), dtype=np.uint64)
    return _splitmix64(h ^ _splitmix64(lens.astype(np.uint64) ^ sd))
