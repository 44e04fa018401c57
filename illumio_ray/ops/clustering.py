"""Distributed clustering / decomposition over an embedding column.

- kmeans_fit: Lloyd's iterations where each pass is ONE ``map_batches``
  emitting per-batch partials (k×d sums + k counts + scalar SSE); the
  driver combines partials and holds ONLY the k×d centroid matrix between
  passes. Nothing per-row ever reaches the driver, so the fit scales to
  any corpus size — the bounded-state pattern, same as the flagship's
  partial aggregates.
- kmeans_assign: broadcast centroids (``ray.put`` once), per-batch argmax
  assignment — shuffle-free.
- semdedup: SemDeDup shape (Abbas et al. 2023, arXiv:2303.09540): cluster
  first, then cosine near-dup only WITHIN each cluster, shrinking the
  all-pairs matmul from O(N²) to O(Σ|cluster|²) and making each cluster a
  shuffle partition (``groupby(cluster)``). Partitioning assumption: a
  single cluster's members fit in one task's heap — size k so that
  N/k × d floats is comfortably sub-block (the fit's SSE output lets the
  caller grow k when clusters get fat).
- pca_fit / pca_project: distributed PCA via per-batch second-moment
  partials (d×d Gram + d sum + count → driver eigh on the d×d covariance);
  projection is a broadcast matmul. Driver state is O(d²), never O(N).

No reference counterpart (the reference has no vector ops); these are the
brief's training-data-pipeline extensions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .similarity import vecs_from_arrow

__all__ = ["kmeans_fit", "kmeans_assign", "semdedup", "pca_fit",
           "pca_project", "logreg_fit_hashed", "logreg_score_hashed"]


def _init_centroids(ds: rd.Dataset, k: int, vec_col: str,
                    sample_rows: int, seed: int) -> np.ndarray:
    """Deterministic seeded init from a bounded head sample (same bounded
    pattern as IVFIndex training, ops/similarity.py)."""
    sample = ds.limit(sample_rows).take_batch(sample_rows,
                                              batch_format="pyarrow")
    m = vecs_from_arrow(sample[vec_col])
    if len(m) < k:
        raise ValueError(f"k={k} exceeds sample of {len(m)} rows")
    rng = np.random.default_rng(seed)
    return m[rng.choice(len(m), k, replace=False)].astype(np.float64)


def kmeans_fit(ds: rd.Dataset, k: int, iters: int = 10,
               vec_col: str = "embedding", sample_rows: int = 4096,
               seed: int = 47, tol: float = 1e-7) -> tuple[np.ndarray, dict]:
    """Distributed Lloyd's k-means. Returns ``(centroids, info)`` where
    ``info`` has per-iteration SSE and final cluster counts.

    One data pass per iteration; per-batch output is a single row of
    flattened partials (k×d + k + 1 floats), so the driver combine is
    O(batches × k × d) regardless of corpus size. Empty clusters are
    re-seeded deterministically from the init sample."""
    cents = _init_centroids(ds, k, vec_col, sample_rows, seed)
    reseed_pool = _init_centroids(ds, min(4 * k, sample_rows), vec_col,
                                  sample_rows, seed + 1)
    d = cents.shape[1]
    sse_hist: list[float] = []
    counts = np.zeros(k, np.int64)

    for it in range(iters):
        ref = ray.put(cents)

        def partials(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            out_sums = np.zeros((k, d), np.float64)
            out_cnt = np.zeros(k, np.int64)
            sse = 0.0
            if t.num_rows:
                x = vecs_from_arrow(t[vec_col])
                # argmin ||x-c||² == argmax x·c − ½||c||²
                scores = x @ c.T - 0.5 * (c * c).sum(axis=1)
                a = scores.argmax(axis=1)
                # scatter-add via one matmul per batch (k×n indicator)
                ind = np.zeros((k, len(x)), np.float64)
                ind[a, np.arange(len(x))] = 1.0
                out_sums = ind @ x
                out_cnt = np.bincount(a, minlength=k).astype(np.int64)
                # ||x−c_a||² = ||x||² − 2·max_score (the ½||c||² terms cancel)
                sse = float((x * x).sum() - 2 * scores.max(axis=1).sum())
            return pa.table({
                "sums": pa.array([out_sums.ravel()],
                                 pa.list_(pa.float64())),
                "counts": pa.array([out_cnt], pa.list_(pa.int64())),
                "sse": pa.array([sse], pa.float64()),
            })

        part = ds.map_batches(partials, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
        sums = np.zeros((k, d), np.float64)
        counts = np.zeros(k, np.int64)
        sse = 0.0
        for row in part:
            sums += np.asarray(row["sums"], np.float64).reshape(k, d)
            counts += np.asarray(row["counts"], np.int64)
            sse += row["sse"]
        sse_hist.append(sse)

        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        for i in np.flatnonzero(~nz):  # deterministic empty-cluster reseed
            new[i] = reseed_pool[i % len(reseed_pool)]
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift <= tol:
            break

    return cents, {"sse": sse_hist, "counts": counts}


def kmeans_assign(ds: rd.Dataset, centroids: np.ndarray,
                  vec_col: str = "embedding",
                  out_col: str = "cluster") -> rd.Dataset:
    """Nearest-centroid assignment; centroids broadcast once via ray.put,
    per-batch argmax — shuffle-free."""
    c = np.asarray(centroids, np.float64)
    ref = ray.put(c)

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        cc = ray.get(ref)
        x = vecs_from_arrow(t[vec_col])
        a = (x @ cc.T - 0.5 * (cc * cc).sum(axis=1)).argmax(axis=1)
        return t.append_column(out_col, pa.array(a.astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def semdedup(ds: rd.Dataset, k: int = 16, threshold: float = 0.97,
             iters: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding") -> rd.Dataset:
    """Semantic dedup: k-means partition, then within-cluster cosine
    near-dup; of each near-dup pair the LARGER id drops (deterministic —
    keeps the earliest row, matching exact-dedup's keep-first rule).
    Returns the kept ``(id_col, cluster)`` rows.

    Scale shape: the expensive matmul runs per cluster inside
    ``groupby(cluster).map_groups`` — each group is one shuffle partition
    of ~N/k rows, never the whole corpus."""
    from .dedup import _ids_and_matrix

    cents, _ = kmeans_fit(ds, k, iters=iters, vec_col=vec_col)
    assigned = kmeans_assign(ds, cents, vec_col=vec_col)

    def in_cluster(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        order = pa.compute.sort_indices(g[id_col])
        g = g.take(order)
        ids, x = _ids_and_matrix(g, id_col, vec_col)  # already normalized
        sims = x @ x.T
        iu = np.triu_indices(len(ids), k=1)
        dup_j = np.unique(iu[1][sims[iu] >= threshold])
        keep = np.ones(len(ids), bool)
        keep[dup_j] = False
        mask = pa.array(keep)
        return pa.table({id_col: g[id_col].filter(mask),
                         "cluster": g["cluster"].filter(mask)})

    return (assigned.groupby("cluster")
            .map_groups(in_cluster, batch_format="pyarrow"))


def pca_fit(ds: rd.Dataset, n_components: int,
            vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """Distributed PCA: one pass of per-batch (Gram d×d, sum d, count)
    partials → driver covariance + eigh. Returns ``(mean, components)``
    with components as rows, sorted by descending eigenvalue. Driver
    state is O(d²); sign fixed so each component's largest-|.| entry is
    positive (deterministic across BLAS builds)."""
    def partials(t: pa.Table) -> pa.Table:
        x = vecs_from_arrow(t[vec_col]) if t.num_rows else None
        if x is None or len(x) == 0:
            return pa.table({"gram": pa.array([], pa.list_(pa.float64())),
                             "vsum": pa.array([], pa.list_(pa.float64())),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "gram": pa.array([(x.T @ x).ravel()], pa.list_(pa.float64())),
            "vsum": pa.array([x.sum(axis=0)], pa.list_(pa.float64())),
            "n": pa.array([len(x)], pa.int64()),
        })

    rows = ds.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    if not rows:
        raise ValueError("pca_fit on empty dataset")
    d = int(np.sqrt(len(rows[0]["gram"])))
    gram = np.zeros((d, d), np.float64)
    vsum = np.zeros(d, np.float64)
    n = 0
    for r in rows:
        gram += np.asarray(r["gram"], np.float64).reshape(d, d)
        vsum += np.asarray(r["vsum"], np.float64)
        n += int(r["n"])
    mean = vsum / n
    cov = gram / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending
    comps = v[:, ::-1][:, :n_components].T.copy()
    flip = np.abs(comps).argmax(axis=1)
    signs = np.sign(comps[np.arange(len(comps)), flip])
    comps *= np.where(signs == 0, 1.0, signs)[:, None]
    return mean, comps


def pca_project(ds: rd.Dataset, mean: np.ndarray, components: np.ndarray,
                vec_col: str = "embedding",
                out_col: str = "pca") -> rd.Dataset:
    """Project onto fitted components — broadcast (mean, components) once,
    per-batch matmul; output is a fixed_size_list column."""
    ref = ray.put((np.asarray(mean, np.float64),
                   np.asarray(components, np.float64)))
    p = components.shape[0]

    def fn(t: pa.Table) -> pa.Table:
        mu, comp = ray.get(ref)
        if t.num_rows == 0:
            return t.append_column(
                out_col, pa.array([], pa.list_(pa.float64(), p)))
        x = vecs_from_arrow(t[vec_col])
        proj = (x - mu) @ comp.T
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(proj.ravel(), pa.float64()), p)
        return t.append_column(out_col, col)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# quality classifier: logistic regression over hashed token features
# ---------------------------------------------------------------------------
# The fastText-style linear quality/domain classifier a curation pass
# trains on its own corpus (e.g. "looks like reference text" vs "looks
# like crawl noise") and then scores every document with. Same bounded-
# state iterative shape as kmeans_fit: each full-batch gradient-descent
# epoch is ONE map_batches pass emitting per-batch partials (a dim-sized
# gradient vector + loss/count scalars); the driver combines partials and
# holds ONLY the weight vector between passes. Scoring is a broadcast of
# the weights and a row-local pass. No reference counterpart (brief's
# training-data extension).

def _hashed_token_features(texts: pa.Array | pa.ChunkedArray, dim: int):
    """(row_of, feat) index pairs for every token: feature id =
    stable_hash64(token) % dim, empty tokens dropped. Vectorized: one
    split_pattern + one hash pass over the flat token array.
    stable_hash64, NOT hash64: the fitted (w, b) is a model ARTIFACT a
    caller may persist and reuse in a later run — feature slots must
    survive library upgrades (see the artifact table in
    functions/hashing.py)."""
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(pc.cast(texts, pa.string()), " ")
    offs = lists.offsets.to_numpy()
    flat = lists.flatten()
    row_of = np.repeat(np.arange(len(lists)), np.diff(offs))
    ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    row_of = row_of[ok]
    toks = flat.filter(pa.array(ok))
    feat = (stable_hash64(toks) % np.uint64(dim)).astype(np.int64) \
        if len(toks) else np.array([], np.int64)
    return row_of, feat


def logreg_fit_hashed(ds: rd.Dataset, text_col: str, label_col: str,
                      dim: int = 1 << 16, epochs: int = 10,
                      lr: float = 1.0, l2: float = 1e-6):
    """Fit a binary logistic-regression classifier on hashed
    bag-of-token-counts features with full-batch gradient descent.
    ``label_col`` must be 0/1 int (or bool). Returns
    ``(w, b, history)`` — weights (dim,), bias, and per-epoch
    [(loss, accuracy), ...].

    Scale shape: one map_batches pass per epoch; each batch emits a
    single partial row holding its dense gradient (dim float64s — 0.5 MB
    at the default 2^16), loss sum, correct count and row count. Driver
    state is O(dim), never O(rows) — and full-batch GD makes the fit
    deterministic under any partitioning (per-batch partials sum).
    Feature hashing bounds the model size regardless of vocabulary
    (hash collisions fold rare features together — the standard
    hashing-trick trade)."""
    w = np.zeros(dim, np.float64)
    b = 0.0
    history: list[tuple[float, float]] = []
    for _ in range(epochs):
        ref = ray.put((w, b))

        def partials(t: pa.Table, ref=ref) -> pa.Table:
            ww, bb = ray.get(ref)
            y = t[label_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            row_of, feat = _hashed_token_features(t[text_col], dim)
            z = np.full(t.num_rows, bb)
            if len(feat):
                np.add.at(z, row_of, ww[feat])
            p = 1.0 / (1.0 + np.exp(-z))
            resid = p - y
            g = np.zeros(dim, np.float64)
            if len(feat):
                np.add.at(g, feat, resid[row_of])
            eps = 1e-12
            loss = -np.sum(y * np.log(p + eps)
                           + (1 - y) * np.log(1 - p + eps))
            correct = int(np.sum((p >= 0.5) == (y >= 0.5)))
            return pa.table({
                "g": pa.array([g], pa.list_(pa.float64())),
                "gb": pa.array([float(resid.sum())]),
                "loss": pa.array([float(loss)]),
                "correct": pa.array([correct], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            })

        g = np.zeros(dim, np.float64)
        gb = loss = 0.0
        correct = n = 0
        for batch in ds.map_batches(
                partials, batch_format="pyarrow",
                zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
            t = pa.table(batch)
            # vectorized combine: read the list column's values buffer
            # directly — no per-row .as_py() of 65k-float gradients
            gcol = t["g"].combine_chunks()
            flat = gcol.flatten().to_numpy(zero_copy_only=False)
            g += flat.reshape(-1, dim).sum(axis=0)
            import pyarrow.compute as pc
            gb += pc.sum(t["gb"]).as_py() or 0.0
            loss += pc.sum(t["loss"]).as_py() or 0.0
            correct += pc.sum(t["correct"]).as_py() or 0
            n += pc.sum(t["n"]).as_py() or 0
        if n == 0:
            raise ValueError("logreg_fit_hashed: empty input")
        w = w - lr * (g / n + l2 * w)
        b = b - lr * (gb / n)
        history.append((loss / n, correct / n))
    return w, b, history


def logreg_score_hashed(ds: rd.Dataset, w: np.ndarray, b: float,
                        text_col: str = "text", out_col: str = "prob",
                        ndigits: int = 6) -> rd.Dataset:
    """Score every row under a fitted hashed-feature logistic model:
    broadcast (w, b) once, one row-local vectorized pass."""
    from ..functions.rounding import round_np

    dim = len(w)
    ref = ray.put((np.asarray(w, np.float64), float(b)))

    def fn(t: pa.Table) -> pa.Table:
        ww, bb = ray.get(ref)
        row_of, feat = _hashed_token_features(t[text_col], dim)
        z = np.full(t.num_rows, bb)
        if len(feat):
            np.add.at(z, row_of, ww[feat])
        p = 1.0 / (1.0 + np.exp(-z))
        return t.append_column(out_col,
                               pa.array(round_np(p, ndigits), pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def label_centroids(ds: rd.Dataset, label_col: str = "label",
                    vec_col: str = "embedding") -> pa.Table:
    """Per-label mean embedding (class centroids / mean pooling over a
    list<float> column): the init step for nearest-centroid classifiers,
    SemDeDup-style partitioning, and per-class drift monitors.

    Scale shape mirrors kmeans_fit's partials: each batch scatter-adds
    into ONE row per label present in the batch (labels × d floats +
    counts), so the exchange and the driver combine are O(labels ×
    blocks × d) — never O(rows). Assumes a BOUNDED label space (class
    ids); for grows-with-data keys use a bucketed exchange instead.
    Returns (label, centroid list<double>, n) sorted by label."""
    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({label_col: pa.array([], pa.int64()),
                             "__sums": pa.array([], pa.list_(pa.float64())),
                             "__n": pa.array([], pa.int64())})
        x = vecs_from_arrow(t[vec_col]).astype(np.float64)
        labs = t[label_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labs, return_inverse=True)
        ind = np.zeros((len(uniq), len(x)), np.float64)
        ind[inv, np.arange(len(x))] = 1.0
        sums = ind @ x
        return pa.table({
            label_col: pa.array(uniq.astype(np.int64), pa.int64()),
            "__sums": pa.array(list(sums), pa.list_(pa.float64())),
            "__n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
        })

    acc: dict[int, tuple[np.ndarray, int]] = {}
    for batch in ds.map_batches(partials, batch_format="pyarrow",
                                zero_copy_batch=True).iter_batches(
                                    batch_format="pyarrow"):
        labs = batch[label_col].to_numpy(zero_copy_only=False)
        ns = batch["__n"].to_numpy(zero_copy_only=False)
        sums = batch["__sums"]
        for i, lab in enumerate(labs):
            s = np.asarray(sums[i].as_py(), np.float64)
            prev = acc.get(int(lab))
            acc[int(lab)] = (prev[0] + s, prev[1] + int(ns[i])) if prev \
                else (s, int(ns[i]))
    labels = sorted(acc)
    return pa.table({
        label_col: pa.array(labels, pa.int64()),
        "centroid": pa.array([(acc[l][0] / acc[l][1]).tolist()
                              for l in labels], pa.list_(pa.float64())),
        "n": pa.array([acc[l][1] for l in labels], pa.int64()),
    })


def class_compactness(ds: rd.Dataset, label_col: str = "label",
                      vec_col: str = "embedding",
                      ndigits: int = 6) -> pa.Table:
    """Intra-class cosine compactness per label: mean cosine similarity
    of each vector to its OWN class centroid — the embedding-space
    quality report behind nearest-centroid classifiers and SemDeDup
    partitioning (tight classes → high mean cosine; a low value flags
    label noise or multi-modal classes). Returns (label, n, mean_cos).

    Two bounded passes: centroids via label_centroids (O(labels × d)
    driver state, broadcast once), then one row-local cosine map feeding
    a bounded per-label mean — vectors never exchange."""
    from .relational import grouped_agg
    from ..functions.rounding import round_np, round_scalar

    cents = label_centroids(ds, label_col, vec_col)
    labels = cents[label_col].to_numpy(zero_copy_only=False)
    mat = np.stack([np.asarray(cents["centroid"][i].as_py(), np.float64)
                    for i in range(cents.num_rows)])
    norms = np.linalg.norm(mat, axis=1)
    slot = {int(l): i for i, l in enumerate(labels)}
    ref = ray.put((slot, mat, norms))

    def cos(t: pa.Table) -> pa.Table:
        s, m, nc = _COMPACT_CACHE.get(ref) or _COMPACT_CACHE.setdefault(
            ref, ray.get(ref))
        x = vecs_from_arrow(t[vec_col]).astype(np.float64)
        labs = t[label_col].to_numpy(zero_copy_only=False)
        idx = np.fromiter((s[int(l)] for l in labs), np.int64,
                          count=len(labs))
        num = np.einsum("ij,ij->i", x, m[idx])
        den = np.linalg.norm(x, axis=1) * nc[idx]
        c = np.divide(num, den, out=np.zeros(len(x)), where=den > 0)
        return pa.table({label_col: pa.array(labs.astype(np.int64)),
                         "cos": pa.array(c)})

    scored = ds.select_columns([label_col, vec_col]).map_batches(
        cos, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_agg(scored, [label_col],
                      [("cos", "count", "n"), ("cos", "mean", "mean_raw")],
                      mode="driver")
    t = pa.concat_tables([pa.table(b) for b in agg.iter_batches(
        batch_format="pyarrow")]).sort_by([(label_col, "ascending")])
    return pa.table({
        label_col: pa.array(t[label_col].to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
        "n": pa.array(t["n"].to_numpy(zero_copy_only=False)
                      .astype(np.int64)),
        "mean_cos": pa.array(round_np(
            t["mean_raw"].to_numpy(zero_copy_only=False), ndigits)),
    })


_COMPACT_CACHE: dict = {}
