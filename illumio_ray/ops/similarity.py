"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k — per-batch numpy matmul against a
  broadcast query matrix, local top-k per batch, tiny global reduce.
- SignLSHIndex / lsh_topk: the scale path — random-hyperplane sign buckets;
  queries probe their own bucket plus hamming-1 neighbors, so each query
  touches a small fraction of the corpus. Approximate by design; tests
  measure recall against brute force.

All per-batch kernels run in Arrow batch format: the list<float> column's
flat values buffer is reshaped to an (n, dim) matrix directly (no
per-row Python objects, no pandas object-dtype np.stack).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.rounding import round_np


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def vecs_from_arrow(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> / fixed_size_list<float> column → (n, dim) float64
    matrix via the flat child buffer (zero-copy up to the final dtype
    cast). Requires rectangular, null-free lists — the embedding-table
    contract."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), np.float64)
    if isinstance(arr, pa.ExtensionArray):
        # Ray's ArrowTensorArray (fixed-shape tensor extension): already a
        # contiguous (n, dim) block
        m = np.asarray(arr.to_numpy(zero_copy_only=False))
        if m.dtype == object:
            m = np.stack(m)
        return m.astype(np.float64, copy=False)
    if arr.null_count:
        raise ValueError("embedding column contains nulls")
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
    else:
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offsets)
        dim = int(lens[0])
        if not np.all(lens == dim):
            raise ValueError("embedding lists are ragged")
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, dim).astype(np.float64, copy=False)


def brute_force_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Exact top-k by cosine similarity to one query vector."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    ref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t[id_col],
                             "score": pa.array([], pa.float64())})
        v = _normalize(vecs_from_arrow(t[vec_col]))
        sims = round_np(v @ ray.get(ref), 6)
        ids = t[id_col].combine_chunks()
        # local top-k: only k rows per batch survive to the global sort;
        # tie-break must match the global order (score desc, id asc)
        order = np.lexsort((ids.to_numpy(zero_copy_only=False), -sims))[:k]
        idx = pa.array(order, pa.int64())
        return pa.table({id_col: ids.take(idx),
                         "score": pa.array(sims[order], pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
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

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        idx = ray.get(ref)
        v = _normalize(vecs_from_arrow(t[vec_col]))
        return t.append_column(out_col, pa.array(idx.buckets(v), pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lsh_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int,
             index: SignLSHIndex | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Approximate top-k: score only rows whose LSH bucket is in the query's
    probe set. At scale the bucket column is a parquet partition key and the
    probe is a partition-pruned read instead of a filter."""
    q = np.asarray(query_vec, dtype=np.float64)
    if index is None:
        index = SignLSHIndex(dim=len(q))
    probes = pa.array(
        index.probe_set(q / max(np.linalg.norm(q), 1e-12)), pa.int64())
    bucketed = add_lsh_bucket(ds, index, vec_col)

    def probe_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_in(t["lsh_bucket"], value_set=probes))

    cand = bucketed.map_batches(probe_filter, batch_format="pyarrow",
                                zero_copy_batch=True)
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
    """Approximate top-k via IVF: train centroids on a driver-side sample
    (bounded rows), score only vectors whose cell is among the query's
    ``nprobe`` nearest cells. Recall is tested against brute force."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)

    sample = ds.limit(train_sample_rows).take_batch(
        train_sample_rows, batch_format="pyarrow")
    index = IVFIndex(vecs_from_arrow(sample[vec_col]), n_cells=n_cells)
    probes = index.probe_cells(q, nprobe)
    ref = ray.put(index)

    def cell_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = ray.get(ref)
        v = _normalize(vecs_from_arrow(t[vec_col]))
        mask = np.isin(idx.assign(v), probes)
        return t.filter(pa.array(mask))

    cand = ds.map_batches(cell_filter, batch_format="pyarrow",
                          zero_copy_batch=True)
    return brute_force_topk(cand, q, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# persisted IVF index (build once, query with cell pruning)
# ---------------------------------------------------------------------------

_IVF_META = "_ivf_meta.json"
_IVF_CENTROIDS = "_centroids.npy"


def build_ivf_index(ds: rd.Dataset, id_col: str, vec_col: str,
                    out_dir: str, *, n_cells: int = 16,
                    train_sample_rows: int = 4096) -> dict:
    """Persist an IVF layout for a vector corpus: centroids trained on a
    bounded driver-side sample, every vector written into its nearest
    cell's hive partition (``out_dir/__cell=i/``). Queries then open ONLY
    their probed cells — index build amortizes across every later query,
    the same persisted-layout contract as the shingle index and
    write_bucketed."""
    import json
    from pathlib import Path

    sample = ds.limit(train_sample_rows).take_batch(
        train_sample_rows, batch_format="pyarrow")
    index = IVFIndex(vecs_from_arrow(sample[vec_col]), n_cells=n_cells)
    ref = ray.put(index)

    def assign_cell(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__cell", pa.array([], pa.int32()))
        idx = ray.get(ref)
        v = _normalize(vecs_from_arrow(t[vec_col]))
        return t.append_column(
            "__cell", pa.array(idx.assign(v).astype(np.int32), pa.int32()))

    ds.map_batches(assign_cell, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        str(out_dir), partition_cols=["__cell"])
    out = Path(out_dir)
    np.save(out / _IVF_CENTROIDS, index.centroids)
    meta = {"n_cells": int(len(index.centroids))}
    (out / _IVF_META).write_text(json.dumps(meta))
    return meta


def ivf_index_topk(index_dir: str, query_vec: np.ndarray, k: int,
                   nprobe: int = 4, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> rd.Dataset:
    """Top-k against a PERSISTED IVF index: rank cells by centroid
    similarity, read only the ``nprobe`` nearest cell directories
    (partition pruning at the storage layer — untouched cells cost
    nothing), exact cosine inside. nprobe == n_cells is an exhaustive,
    EXACT search (oracle-checked); smaller nprobe trades recall for I/O."""
    from pathlib import Path

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    centroids = np.load(Path(index_dir) / _IVF_CENTROIDS)
    probes = np.argsort(-(centroids @ q))[:nprobe]
    files = [str(f) for c in probes
             for f in sorted(Path(index_dir, f"__cell={c}").glob("*.parquet"))]
    if not files:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "score": pa.array([], pa.float64())}))
    cand = rd.read_parquet(files, columns=[id_col, vec_col])
    return brute_force_topk(cand, q, k, id_col, vec_col)


def brute_force_topk_multi(ds: rd.Dataset, query_ids, query_mat: np.ndarray,
                           k: int, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> rd.Dataset:
    """Batched retrieval: exact cosine top-k for EACH of M broadcast query
    vectors in ONE pass over the corpus — the serving shape (a request
    batch against the whole index), not M separate scans. Per batch the
    kernel is a single (B×D)·(D×M) matmul; the local prune keeps k rows
    per (query, batch) with the global tie order (score desc, id asc), so
    only M×k narrow rows per batch reach the per-query top-k reduce
    (rel.topk_per_group — combiner-before-shuffle). M is a request batch
    (≲ thousands): the M×k×blocks reduce input stays tiny while the scan
    cost is shared across all M queries."""
    from .relational import topk_per_group

    Q = _normalize(np.asarray(query_mat, np.float64))
    qids = np.asarray(query_ids, np.int64)
    ref = ray.put(Q.T)  # D×M, one object-store copy read by every task

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        v = _normalize(vecs_from_arrow(t[vec_col]))
        s = round_np(v @ ray.get(ref), 6)            # B × M
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        kk = min(k, len(ids))
        out_q, out_i, out_s = [], [], []
        for m in range(len(qids)):                   # M small by contract
            order = np.lexsort((ids, -s[:, m]))[:kk]
            out_q.append(np.full(kk, qids[m], np.int64))
            out_i.append(ids[order])
            out_s.append(s[order, m])
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_i)),
                         "score": pa.array(np.concatenate(out_s),
                                           pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
    return topk_per_group(scored, ["qid"], ["score", id_col], k,
                          descending=[True, False])


# ---------------------------------------------------------------------------
# k-nearest-neighbor JOIN (every left row → its top-k right rows)
# ---------------------------------------------------------------------------

def knn_join(left: rd.Dataset, right: rd.Dataset, k: int,
             left_id: str = "qid", right_id: str = "vec_id",
             left_vec: str = "embedding", right_vec: str = "embedding",
             out_score: str = "score",
             score_band: tuple[float, float] | None = None) -> rd.Dataset:
    """EXACT cosine k-NN JOIN: for EVERY left row, the top-k right rows by
    cosine (ties: score desc, right id asc) — both sides are Datasets,
    neither broadcasts to the driver. The semantic-dedup / RAG-linking
    primitive where the "queries" are themselves a table, not a request
    batch (that case is brute_force_topk_multi).

    Scale shape: the right corpus pins ONCE in the object store as Arrow
    block refs; one map task per LEFT block streams the right blocks
    through a (B_l x D) . (D x B_r) matmul, folding a running per-row
    top-k after each block — task memory is O(left block + ONE right
    block + B_l x k) and shuffle volume is ZERO (each left block sees the
    whole right side, so no per-query reduce exists). O(L x R) flops is
    inherent to exactness; ``ivf_knn_join`` is the approximate path that
    prunes the cross product to probed IVF cells.

    ``score_band=(lo, hi)`` keeps only neighbors whose ROUNDED cosine
    falls in [lo, hi] — hard-negative mining (near-but-not-duplicate
    pairs for contrastive training): the band masks INSIDE the fold, so
    the result is the top-k among in-band neighbors, not a post-filter
    of the unbanded top-k. Rows with fewer than k in-band neighbors emit
    fewer rows."""
    if score_band is not None and not (score_band[0] <= score_band[1]):
        raise ValueError(
            f"knn_join: score_band must be (lo, hi) with lo <= hi, got "
            f"{score_band} — a reversed band would silently mask every "
            "neighbor")
    rrefs = right.select_columns([right_id, right_vec]).to_arrow_refs()
    rrefs_ref = ray.put(list(rrefs))

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table({
            left_id: pa.array([], t.schema.field(left_id).type
                              if left_id in t.schema.names else pa.int64()),
            right_id: pa.array([], pa.int64()),
            out_score: pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        q = _normalize(vecs_from_arrow(t[left_vec]))
        qids = t[left_id].combine_chunks()
        B = len(q)
        best_s = np.full((B, 0), -2.0)
        best_i = np.full((B, 0), -1, np.int64)
        for ref in ray.get(rrefs_ref):
            blk = ray.get(ref)
            if blk.num_rows == 0:
                continue
            v = _normalize(vecs_from_arrow(blk[right_vec]))
            rids = blk[right_id].combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            s = round_np(q @ v.T, 6)                       # B x B_r
            if score_band is not None:
                s = np.where((s >= score_band[0]) & (s <= score_band[1]),
                             s, -2.0)
            kk = min(k, s.shape[1])
            # block-local top-k (argpartition), then fold into the running
            # candidates and re-rank — candidates stay at <= 2k per row
            part = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
            cand_s = np.concatenate(
                [best_s, np.take_along_axis(s, part, axis=1)], axis=1)
            cand_i = np.concatenate([best_i, rids[part]], axis=1)
            order = np.lexsort((cand_i, -cand_s), axis=1)[:, :k]
            best_s = np.take_along_axis(cand_s, order, axis=1)
            best_i = np.take_along_axis(cand_i, order, axis=1)
        kk = best_s.shape[1]
        if kk == 0:
            return empty
        out_q = pc.take(qids, pa.array(np.repeat(np.arange(B), kk),
                                       pa.int64()))
        out = pa.table({
            left_id: out_q,
            right_id: pa.array(best_i.ravel(), pa.int64()),
            out_score: pa.array(best_s.ravel(), pa.float64()),
        })
        if score_band is not None:
            # drop band-masked sentinel slots (queries with < k in-band)
            out = out.filter(pc.greater(out[out_score], -1.5))
        return out

    return left.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


def ivf_knn_join(left: rd.Dataset, right: rd.Dataset, k: int,
                 n_cells: int = 16, nprobe: int = 2,
                 left_id: str = "qid", right_id: str = "vec_id",
                 left_vec: str = "embedding", right_vec: str = "embedding",
                 train_sample_rows: int = 4096) -> rd.Dataset:
    """Approximate k-NN join — the 10^12-row path: both sides assign to
    IVF cells (centroids trained once on a bounded sample), left rows
    replicate to their ``nprobe`` nearest cells, ONE hash exchange
    co-locates each cell, the in-cell matmul emits per-(query, cell)
    top-k, and a tiny per-query reduce keeps the global k. The cross
    product prunes from L x R to sum-over-cells(L_probe_c x R_c); recall
    vs knn_join is pinned by tests."""
    from .relational import topk_per_group

    sample = right.limit(train_sample_rows).take_batch(
        train_sample_rows, batch_format="pyarrow")
    index = IVFIndex(vecs_from_arrow(sample[right_vec]), n_cells=n_cells)
    ref = ray.put(index)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {"__cell": pa.array([], pa.int32()), "__side": pa.array([], pa.int8()),
                "id": pa.array([], pa.int64()),
                "vec": pa.array([], t.schema.field(right_vec).type)}
        if t.num_rows == 0:
            return pa.table(cols)
        idx = ray.get(ref)
        v = _normalize(vecs_from_arrow(t[right_vec]))
        return pa.table({
            "__cell": pa.array(idx.assign(v).astype(np.int32), pa.int32()),
            "__side": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
            "id": pc.cast(t[right_id], pa.int64()),
            "vec": t[right_vec],
        })

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {"__cell": pa.array([], pa.int32()), "__side": pa.array([], pa.int8()),
                "id": pa.array([], pa.int64()),
                "vec": pa.array([], t.schema.field(left_vec).type)}
        if t.num_rows == 0:
            return pa.table(cols)
        idx = ray.get(ref)
        v = _normalize(vecs_from_arrow(t[left_vec]))
        sims = v @ idx.centroids.T                     # B x C
        probes = np.argsort(-sims, axis=1)[:, :nprobe]
        B = t.num_rows
        rep = pa.array(np.repeat(np.arange(B), nprobe), pa.int64())
        return pa.table({
            "__cell": pa.array(probes.ravel().astype(np.int32), pa.int32()),
            "__side": pa.array(np.zeros(B * nprobe, np.int8), pa.int8()),
            "id": pc.take(pc.cast(t[left_id], pa.int64()), rep),
            "vec": pc.take(t[left_vec], rep),
        })

    merged = left.map_batches(tag_left, batch_format="pyarrow",
                              zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format="pyarrow",
                          zero_copy_batch=True))

    def in_cell(g: pa.Table) -> pa.Table:
        is_l = pc.equal(g["__side"], pa.scalar(0, pa.int8()))
        lt, rt = g.filter(is_l), g.filter(pc.invert(is_l))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             right_id: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        q = _normalize(vecs_from_arrow(lt["vec"]))
        v = _normalize(vecs_from_arrow(rt["vec"]))
        rids = rt["id"].combine_chunks().to_numpy(zero_copy_only=False)
        s = round_np(q @ v.T, 6)
        kk = min(k, s.shape[1])
        part = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
        ps = np.take_along_axis(s, part, axis=1)
        pi = rids[part]
        order = np.lexsort((pi, -ps), axis=1)
        ps = np.take_along_axis(ps, order, axis=1)
        pi = np.take_along_axis(pi, order, axis=1)
        B = len(q)
        return pa.table({
            "qid": pc.take(lt["id"].combine_chunks(),
                           pa.array(np.repeat(np.arange(B), kk), pa.int64())),
            right_id: pa.array(pi.ravel(), pa.int64()),
            "score": pa.array(ps.ravel(), pa.float64()),
        })

    scored = merged.groupby("__cell").map_groups(in_cell,
                                                 batch_format="pyarrow")
    out = topk_per_group(scored, ["qid"], ["score", right_id], k,
                         descending=[True, False])
    return out.rename_columns({"qid": left_id}) if left_id != "qid" else out


# ---------------------------------------------------------------------------
# product quantization (the RAM-compression scale path)
# ---------------------------------------------------------------------------

class PQCodec:
    """Product quantizer over unit vectors: split the dim into ``m``
    subspaces, learn a ``k``-entry k-means codebook per subspace from a
    sample (driver-side — O(k·dim) floats total), and encode every
    vector as m uint8 codes. A float32 corpus shrinks dim·4 → m bytes
    per vector (64-dim → 8 B at m=8, 32×), which is what lets a
    10^12-vector index live in cluster RAM at all.

    Queries score with ADC (asymmetric distance computation): one
    (m × k) lookup table of per-subspace inner products with the RAW
    query, then score = Σ_j LUT[j, code_j] — codes are never decoded.
    Deterministic (fixed seed, fixed Lloyd iterations), same contract
    as IVFIndex; approximate by design — tests measure recall@k against
    brute force."""

    def __init__(self, sample: np.ndarray, m: int = 8, k: int = 256,
                 iters: int = 10, seed: int = 37):
        s = _normalize(np.asarray(sample, dtype=np.float64))
        n, dim = s.shape
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        self.m, self.dsub = m, dim // m
        if k > 256:
            # codes are uint8 — a larger codebook would silently wrap
            # argmin indices and corrupt every code
            raise ValueError(f"k={k} exceeds uint8 code range (max 256)")
        self.k = min(k, n)
        rng = np.random.default_rng(seed)
        self.codebooks = np.empty((m, self.k, self.dsub))
        for j in range(m):
            sub = s[:, j * self.dsub:(j + 1) * self.dsub]
            cb = sub[rng.choice(n, self.k, replace=False)].copy()
            for _ in range(iters):
                # nearest centroid by L2 (expansion-free form: one GEMM)
                d2 = (sub ** 2).sum(1)[:, None] - 2 * sub @ cb.T \
                    + (cb ** 2).sum(1)[None, :]
                assign = d2.argmin(axis=1)
                for c in range(self.k):
                    members = sub[assign == c]
                    if len(members):
                        cb[c] = members.mean(axis=0)
            self.codebooks[j] = cb

    def encode(self, vecs: np.ndarray) -> np.ndarray:
        """(n, dim) floats → (n, m) uint8 codes (nearest centroid per
        subspace; expansion-free distance form)."""
        v = _normalize(np.asarray(vecs, dtype=np.float64))
        codes = np.empty((len(v), self.m), np.uint8)
        for j in range(self.m):
            sub = v[:, j * self.dsub:(j + 1) * self.dsub]
            cb = self.codebooks[j]
            d2 = (sub ** 2).sum(1)[:, None] - 2 * sub @ cb.T \
                + (cb ** 2).sum(1)[None, :]
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return codes

    def lut(self, query_vec: np.ndarray) -> np.ndarray:
        """(m, k) table of per-subspace inner products with the query."""
        q = np.asarray(query_vec, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        return np.stack([
            self.codebooks[j] @ q[j * self.dsub:(j + 1) * self.dsub]
            for j in range(self.m)])


def add_pq_codes(ds: rd.Dataset, codec: PQCodec,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> rd.Dataset:
    """→ (id, pq_code fixed_size_list<uint8, m>): the persistable
    compressed index rows (what you'd write once and scan forever)."""
    ref = ray.put(codec)

    m = codec.m

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: t[id_col],
                "pq_code": pa.array([], pa.list_(pa.uint8(), m))})
        codec_ = ray.get(ref)
        codes = codec_.encode(vecs_from_arrow(t[vec_col]))
        return pa.table({
            id_col: t[id_col],
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), pa.uint8()), m),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pq_topk_codes(codes: rd.Dataset, codec: PQCodec,
                  query_vec: np.ndarray, k: int,
                  id_col: str = "vec_id") -> rd.Dataset:
    """Approximate top-k over PQ codes by ADC: per batch, score =
    Σ_j LUT[j, code_j] (two numpy gathers over uint8 codes — the corpus
    floats never load), local top-k, tiny global reduce. Same output
    shape/tie-break as brute_force_topk."""
    lut = codec.lut(query_vec)
    ref = ray.put(lut)
    m = codec.m  # capture the int, NOT the codec — the closure would
    # otherwise ship the full codebooks into every task spec, defeating
    # the ray.put of the (much smaller) LUT

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t[id_col],
                             "score": pa.array([], pa.float64())})
        lut_ = ray.get(ref)
        c = t["pq_code"].combine_chunks()
        arr = c.values.to_numpy(zero_copy_only=False) \
            .reshape(len(c), m)
        sims = round_np(
            lut_[np.arange(m)[None, :], arr].sum(axis=1), 6)
        ids = t[id_col].combine_chunks()
        order = np.lexsort((ids.to_numpy(zero_copy_only=False),
                            -sims))[:k]
        idx = pa.array(order, pa.int64())
        return pa.table({id_col: ids.take(idx),
                         "score": pa.array(sims[order], pa.float64())})

    scored = codes.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)
    return scored.sort(["score", id_col],
                       descending=[True, False]).limit(k)


def ivfpq_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int,
               n_cells: int = 16, nprobe: int = 4, m: int = 8,
               pq_k: int = 64, id_col: str = "vec_id",
               vec_col: str = "embedding",
               train_sample_rows: int = 4096) -> rd.Dataset:
    """IVF+PQ — the standard web-scale index layout: an IVF coarse
    quantizer prunes to ``nprobe`` cells (at scale: partition-pruned
    reads of a cell-partitioned CODE layout), then ADC over uint8 PQ
    codes scores only the surviving rows. Corpus float vectors are
    touched exactly once (encode); queries read m bytes/vector from
    ≈ nprobe/n_cells of the corpus. Both quantizers train driver-side
    on one bounded sample. Approximate twice over (cell pruning × PQ
    distortion) — recall pinned by the unit test."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)

    sample = ds.limit(train_sample_rows).take_batch(
        train_sample_rows, batch_format="pyarrow")
    svecs = vecs_from_arrow(sample[vec_col])
    index = IVFIndex(svecs, n_cells=n_cells)
    codec = PQCodec(svecs, m=m, k=pq_k)
    probes = index.probe_cells(q, nprobe)
    iref, cref = ray.put(index), ray.put(codec)

    def encode_probed(t: pa.Table) -> pa.Table:
        """Filter to probed cells and replace floats with codes — the
        one pass that reads vectors (≙ the build step of a persisted
        IVFPQ layout)."""
        if t.num_rows == 0:
            return pa.table({id_col: t[id_col],
                             "pq_code": pa.array([], pa.list_(pa.uint8(), m))})
        idx, cdc = ray.get(iref), ray.get(cref)
        v = _normalize(vecs_from_arrow(t[vec_col]))
        mask = np.isin(idx.assign(v), probes)
        codes = cdc.encode(v[mask])
        ids = t[id_col].combine_chunks().filter(pa.array(mask))
        return pa.table({
            id_col: ids,
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), pa.uint8()), m),
        })

    cand = ds.map_batches(encode_probed, batch_format="pyarrow",
                          zero_copy_batch=True)
    # ADC scoring + local-top-k + global reduce is exactly the PQ query
    # path — one implementation, shared tie-break and rounding
    return pq_topk_codes(cand, codec, query_vec, k, id_col)


def kcenter_select(ds: rd.Dataset, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   metric: str = "euclidean") -> pa.Table:
    """Greedy k-center coreset (Gonzalez 2-approximation): repeatedly
    pick the point FARTHEST from the centers chosen so far — the
    diversity-subset selection an active-learning / data-pruning pass
    runs over an embedding corpus. Returns (order, id, dist) — dist is
    the point's distance to the previous centers at selection time
    (center 0: inf sentinel → -1).

    Distributed shape: the running min-distance-to-centers RIDES THE
    DATASET as a column (materialized per round, the components-loop
    lesson); each round is ONE map_batches pass that folds in the newest
    center (broadcast, O(d)) plus a per-block argmax partial — the
    driver only ever holds k centers and one row per block. k passes
    total, never k×centers distance work (each pairwise distance is
    computed exactly once). Deterministic: ties break to the smallest
    id; center 0 is the smallest id in the corpus."""
    if metric not in ("euclidean", "cosine"):
        raise ValueError(f"unknown metric: {metric}")
    if k <= 0:
        return pa.table({"order": pa.array([], pa.int64()),
                         "id": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.float64())})

    def prep(t: pa.Table) -> pa.Table:
        v = vecs_from_arrow(t[vec_col])
        if metric == "cosine":
            v = _normalize(v)
        return pa.table({
            "id": pc.cast(t[id_col], pa.int64()),
            "v": pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(v, np.float32).ravel(),
                         pa.float32()), v.shape[1] if v.size else 0),
            "dmin": pa.array(np.full(t.num_rows, np.inf))})

    state = ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    first = state.min("id")
    if first is None:
        return pa.table({"order": pa.array([], pa.int64()),
                         "id": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.float64())})
    chosen: list[tuple[int, float]] = [(int(first), -1.0)]

    def fold_and_top1(t: pa.Table, cref) -> pa.Table:
        """Fold the newest center into dmin AND emit this block's argmax
        (id, dmin, vector) — one fused pass, no second scan per round."""
        cvec = ray.get(cref)
        ids = t["id"].to_numpy(zero_copy_only=False)
        if t.num_rows == 0:
            return pa.table({"kind": pa.array([], pa.string()),
                             "id": pa.array([], pa.int64()),
                             "dmin": pa.array([], pa.float64()),
                             "v": t["v"]})
        d = len(cvec)
        flat = t["v"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        v = flat.reshape(-1, d).astype(np.float64)
        if metric == "euclidean":
            dist = np.sqrt(np.maximum(
                ((v - cvec[None, :]) ** 2).sum(1), 0.0))
        else:
            dist = 1.0 - v @ cvec
        nd = np.minimum(t["dmin"].to_numpy(zero_copy_only=False), dist)
        best = int(np.lexsort((ids, -nd))[0])  # farthest, min-id ties
        state_rows = pa.table({
            "kind": pa.array(["s"] * t.num_rows, pa.string()),
            "id": t["id"], "dmin": pa.array(nd), "v": t["v"]})
        top_row = pa.table({
            "kind": pa.array(["t"], pa.string()),
            "id": pa.array([ids[best]], pa.int64()),
            "dmin": pa.array([nd[best]]),
            "v": t["v"].combine_chunks().slice(best, 1)})
        return pa.concat_tables([state_rows, top_row])

    # center 0's vector: ONE filtered pull (later centers ride the
    # per-round argmax partials — no extra scans)
    c0 = state.map_batches(
        lambda t: t.filter(pc.equal(t["id"],
                                    pa.scalar(chosen[0][0], pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True).take_all()
    next_vec = np.asarray(c0[0]["v"], np.float64)

    for _ in range(1, k):
        cref = ray.put(next_vec)
        both = state.map_batches(
            lambda t, r=cref: fold_and_top1(t, r), batch_format="pyarrow",
            zero_copy_batch=True).materialize()
        # ONE materialization per round: the kind-split stays lazy and
        # fuses into the next round's fold / the tiny tops pull
        state = both.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], "s")).drop(["kind"]),
            batch_format="pyarrow", zero_copy_batch=True)
        tops = both.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], "t")),
            batch_format="pyarrow", zero_copy_batch=True).take_all()
        if not tops:
            break
        nxt = max(tops, key=lambda r: (r["dmin"], -r["id"]))
        if nxt["dmin"] <= 0.0:
            break  # every remaining point coincides with a center
        chosen.append((int(nxt["id"]), float(nxt["dmin"])))
        next_vec = np.asarray(nxt["v"], np.float64)

    return pa.table({
        "order": pa.array(range(len(chosen)), pa.int64()),
        "id": pa.array([c for c, _ in chosen], pa.int64()),
        "dist": pa.array([d for _, d in chosen], pa.float64())})


# ---------------------------------------------------------------------------
# random projection (Johnson-Lindenstrauss)
# ---------------------------------------------------------------------------

def random_projection_matrix(in_dim: int, out_dim: int,
                             seed: int = 7) -> np.ndarray:
    """Deterministic Gaussian JL matrix, rows scaled by 1/sqrt(out_dim)
    so squared distances are preserved in expectation."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((out_dim, in_dim)) / np.sqrt(out_dim)


def random_project(ds: rd.Dataset, vec_col: str = "embedding",
                   out_dim: int = 8, seed: int = 7,
                   out_col: str = "proj",
                   in_dim: int | None = None) -> rd.Dataset:
    """Johnson-Lindenstrauss dimensionality reduction: project each
    vector through one shared Gaussian matrix (ray.put once, one matmul
    per batch). The standard pre-step that makes downstream ANN / dedup
    / clustering exchanges move out_dim floats per row instead of the
    full embedding — at 100 TB the exchange shrinks by in_dim/out_dim
    while pairwise distances distort by only O(sqrt(log n / out_dim))."""
    if in_dim is None:
        sample = ds.take(1)
        if not sample:
            return ds
        in_dim = len(sample[0][vec_col])
    ref = ray.put(random_projection_matrix(in_dim, out_dim, seed))

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.list_(pa.float64())))
        r = ray.get(ref)
        m = vecs_from_arrow(t[vec_col]).astype(np.float64)
        p = m @ r.T
        return t.append_column(
            out_col, pa.FixedSizeListArray.from_arrays(
                pa.array(p.reshape(-1), pa.float64()), out_dim))

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


def random_projection_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int,
                           out_dim: int = 8, seed: int = 7,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> rd.Dataset:
    """Exact top-k by PROJECTED dot product <Rv, Rq>: the JL-compressed
    similarity search (score desc, id asc — same tie contract as
    brute_force_topk). Batch-local top-k prune before the global sort,
    so only k rows per block reach the exchange."""
    from ..functions.rounding import round_np

    q = np.asarray(query_vec, dtype=np.float64)
    r = random_projection_matrix(len(q), out_dim, seed)
    pq_ref = ray.put((r, r @ q))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t[id_col],
                             "score": pa.array([], pa.float64())})
        rm, pquery = ray.get(pq_ref)
        pv = vecs_from_arrow(t[vec_col]).astype(np.float64) @ rm.T
        sims = round_np(pv @ pquery, 6)
        ids = t[id_col].combine_chunks()
        order = np.lexsort((ids.to_numpy(zero_copy_only=False), -sims))[:k]
        idx = pa.array(order, pa.int64())
        return pa.table({id_col: ids.take(idx),
                         "score": pa.array(sims[order], pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["score", id_col], descending=[True, False]).limit(k)
