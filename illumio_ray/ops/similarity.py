"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k — per-batch numpy matmul against a
  broadcast query matrix, local top-k per batch, tiny global reduce.
- SignLSHIndex / lsh_topk: the scale path — random-hyperplane sign buckets;
  queries probe their own bucket plus hamming-1 neighbors, so each query
  touches a small fraction of the corpus. Approximate by design; tests
  measure recall against brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.rounding import round_np


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Exact top-k by cosine similarity to one query vector."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    ref = ray.put(q)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        sims = v @ ray.get(ref)
        out = pd.DataFrame({id_col: batch[id_col], "score": round_np(sims, 6)})
        # local top-k: only k rows per batch survive to the global sort;
        # tie-break must match the global order (score desc, id asc)
        return out.sort_values(["score", id_col], ascending=[False, True]).head(k)

    scored = ds.map_batches(score, batch_format="pandas")
    return scored.sort(["score", id_col], descending=[True, False]).limit(k)


class SignLSHIndex:
    """Random-hyperplane LSH over unit vectors: bucket = sign bits of
    (v @ H). Deterministic (fixed seed)."""

    def __init__(self, dim: int, n_bits: int = 8, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((dim, n_bits))
        self.n_bits = n_bits

    def buckets(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.h) > 0
        return (bits @ (1 << np.arange(self.n_bits))).astype(np.int64)

    def probe_set(self, q: np.ndarray) -> np.ndarray:
        """Query bucket + all hamming-1 neighbors (n_bits+1 buckets)."""
        b = int(self.buckets(q[None, :])[0])
        return np.array([b] + [b ^ (1 << i) for i in range(self.n_bits)], dtype=np.int64)


def add_lsh_bucket(ds: rd.Dataset, index: SignLSHIndex,
                   vec_col: str = "embedding", out_col: str = "lsh_bucket") -> rd.Dataset:
    ref = ray.put(index)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        idx = ray.get(ref)
        v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        batch[out_col] = idx.buckets(v)
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def lsh_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int,
             index: SignLSHIndex | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Approximate top-k: score only rows whose LSH bucket is in the query's
    probe set. At scale the bucket column is a parquet partition key and the
    probe is a partition-pruned read instead of a filter."""
    q = np.asarray(query_vec, dtype=np.float64)
    if index is None:
        index = SignLSHIndex(dim=len(q))
    probes = set(index.probe_set(q / max(np.linalg.norm(q), 1e-12)).tolist())
    bucketed = add_lsh_bucket(ds, index, vec_col)
    cand = bucketed.map_batches(
        lambda b: b[b["lsh_bucket"].isin(probes)], batch_format="pandas"
    )
    return brute_force_topk(cand, q, k, id_col, vec_col)


class IVFIndex:
    """IVF (inverted-file) coarse quantizer: k-means centroids learned
    driver-side from a sample, vectors assigned to their nearest centroid.
    Queries probe the ``nprobe`` nearest cells only — at scale the cell id
    is a parquet partition key and a probe is a partition-pruned read.

    Deterministic: fixed seed, fixed iteration count (Lloyd's)."""

    def __init__(self, sample: np.ndarray, n_cells: int = 16, iters: int = 10,
                 seed: int = 29):
        m = _normalize(np.asarray(sample, dtype=np.float64))
        rng = np.random.default_rng(seed)
        n_cells = min(n_cells, len(m))
        self.centroids = m[rng.choice(len(m), n_cells, replace=False)]
        for _ in range(iters):
            assign = (m @ self.centroids.T).argmax(axis=1)
            for c in range(n_cells):
                members = m[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        self.centroids[c] = v / n

    def assign(self, m: np.ndarray) -> np.ndarray:
        return (m @ self.centroids.T).argmax(axis=1).astype(np.int64)

    def probe_cells(self, q: np.ndarray, nprobe: int) -> np.ndarray:
        sims = self.centroids @ q
        return np.argsort(-sims)[:nprobe].astype(np.int64)


def ivf_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int,
             n_cells: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             train_sample_rows: int = 4096) -> rd.Dataset:
    """Approximate top-k via IVF: train centroids on a driver-side sample,
    score only vectors whose cell is among the query's ``nprobe`` nearest
    cells. Recall is tested against brute force."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)

    sample = ds.limit(train_sample_rows).to_pandas()
    index = IVFIndex(np.stack(sample[vec_col].to_numpy()), n_cells=n_cells)
    probes = set(index.probe_cells(q, nprobe).tolist())
    ref = ray.put(index)

    def cell_filter(batch: pd.DataFrame) -> pd.DataFrame:
        idx = ray.get(ref)
        v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        cells = idx.assign(v)
        return batch[np.isin(cells, list(probes))]

    cand = ds.map_batches(cell_filter, batch_format="pandas")
    return brute_force_topk(cand, q, k, id_col, vec_col)
