"""Mergeable sketches: HyperLogLog distinct-count.

The reference has no sketches (SURVEY.md §2.5), but a 10^12-doc pipeline
cannot COUNT(DISTINCT url) exactly without a full shuffle of the key
column; an HLL register array is O(2^p) bytes per block, merges by
element-wise max, and rides the same partial→combine path as the other
aggregates (error ≈ 1.04/sqrt(2^p) ≈ 1.6% at p=12).

Deterministic: hashes via functions.hashing.hash64 (stable across
processes), pure numpy.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64


def _hll_ranks(h: np.ndarray, p: int) -> np.ndarray:
    """rank = leading zeros of the (64-p) value bits + 1, capped — the
    shared register-update kernel for the global HLL and the per-group
    partials (hll_distinct_by)."""
    h = h.astype(np.uint64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    mask = rest != 0
    bl = np.zeros(len(h), dtype=np.uint8)
    r = rest[mask]
    # np.log2 is unsafe at 2^63; compute bit length by shifting
    lengths = np.zeros(len(r), dtype=np.uint8)
    v = r.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        step = v >= (np.uint64(1) << np.uint64(shift))
        lengths = np.where(step, lengths + shift, lengths)
        v = np.where(step, v >> np.uint64(shift), v)
    bl[mask] = lengths + 1  # bit_length
    return np.where(mask, np.uint8(64) - bl + np.uint8(1),
                    np.uint8(64 - p + 1)).astype(np.uint8)


class HyperLogLog:
    """Fixed-precision HLL over 64-bit hashes; registers merge by max."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        if len(h) == 0:
            return self
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        np.maximum.at(self.registers, idx, _hll_ranks(h, self.p))
        return self

    def add(self, values) -> "HyperLogLog":
        return self.add_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting small-range fix
        return float(est)


class TDigest:
    """Merging t-digest (Dunning): mergeable quantile sketch. Per-block
    digests are O(delta) centroids; merge = concat + one deterministic
    compress pass (sorted input → greedy accumulation under the k1 scale
    function's size bound). Quantiles interpolate cumulative centroid
    weights. Deterministic given the same multiset of inputs per block.

    The scale path for percentiles over 10^12 rows: the exact
    sort-based quantile (doc_chars_quantiles) shuffles the column; this
    ships delta-sized digests instead."""

    def __init__(self, delta: int = 128):
        self.delta = delta
        self.means = np.array([], dtype=np.float64)
        self.weights = np.array([], dtype=np.float64)

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Greedy merge under the k1 variance size bound. Runs over
        CENTROID arrays only (O(delta)-sized after _cluster_unit
        pre-reduction), so the Python loop is O(delta) per call, never
        O(rows) (ADVICE r2)."""
        if len(means) == 0:
            self.means = means
            self.weights = weights
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        w_so_far = 0.0
        for m, w in zip(means[1:], weights[1:]):
            q = (w_so_far + cur_w / 2) / total
            limit = 4 * total * q * (1 - q) / self.delta  # k1 size bound
            if cur_w + w <= max(limit, 1.0):
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def _cluster_unit(self, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Pre-reduce SORTED unit-weight values to O(delta) clusters under
        the same k1 size bound, with the per-cluster size solved in closed
        form (the bound c+1 <= 4Tq(1-q)/delta with q=(a+c/2)/T is a
        quadratic in c), so the Python loop runs O(#clusters) iterations
        instead of one per raw value."""
        import math

        n = len(v)
        total = float(n)
        cum = np.cumsum(v)
        out_m, out_w = [], []
        i = 0
        while i < n:
            a = float(i)
            # c^2 + c(dT - 2T + 4a) + (dT - 4aT + 4a^2) <= 0
            b = self.delta * total - 2 * total + 4 * a
            cc = self.delta * total - 4 * a * total + 4 * a * a
            disc = b * b - 4 * cc
            c = int((-b + math.sqrt(disc)) / 2) if disc > 0 else 1
            j = min(i + max(c, 1), n)
            w = j - i
            out_m.append((cum[j - 1] - (cum[i - 1] if i else 0.0)) / w)
            out_w.append(float(w))
            i = j
        return np.asarray(out_m), np.asarray(out_w)

    def add_array(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            m, w = self._cluster_unit(np.sort(v))
            self._compress(np.concatenate([self.means, m]),
                           np.concatenate([self.weights, w]))
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if len(other.means):
            self._compress(np.concatenate([self.means, other.means]),
                           np.concatenate([self.weights, other.weights]))
        return self

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))


def tdigest_quantiles(ds, col: str, qs: list[float],
                      delta: int = 128) -> dict[float, float]:
    """Distributed approximate quantiles: per-block digests (map) merged on
    the driver — the exchange is O(blocks × delta) centroid rows, never the
    value column."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        d = TDigest(delta).add_array(
            t[col].drop_null().to_numpy(zero_copy_only=False))
        return pa.table({"means": pa.array([d.means.tobytes()], pa.binary()),
                         "weights": pa.array([d.weights.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    acc = TDigest(delta)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for mb, wb in zip(b["means"].to_pylist(), b["weights"].to_pylist()):
            other = TDigest(delta)
            other.means = np.frombuffer(mb, dtype=np.float64).copy()
            other.weights = np.frombuffer(wb, dtype=np.float64).copy()
            acc.merge(other)
    return {q: acc.quantile(q) for q in qs}


def tdigest_quantiles_by(ds, key_col: str, col: str, qs: list[float],
                         delta: int = 128) -> dict:
    """Per-group approximate quantiles: one t-digest per (block, group),
    merged per key on the driver — the exchange is
    O(blocks × groups × delta) centroids, never the value column. Right
    for bounded group keys (event types, langs); unbounded keys would run
    the same partials through a groupby reduce (the hll_distinct_by
    rule)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        tbl = t.select([key_col, col]).filter(pc.is_valid(t[col]))
        keys, means, weights = [], [], []
        for key_val in pc.unique(tbl[key_col]).to_pylist():
            sub = tbl.filter(pc.equal(tbl[key_col], key_val))
            d = TDigest(delta).add_array(
                sub[col].to_numpy(zero_copy_only=False))
            keys.append(key_val)
            means.append(d.means.tobytes())
            weights.append(d.weights.tobytes())
        return pa.table({"__k": pa.array(keys,
                                         type=t.schema.field(key_col).type),
                         "__m": pa.array(means, pa.binary()),
                         "__w": pa.array(weights, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    acc: dict = {}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for k, mb, wb in zip(b["__k"].to_pylist(), b["__m"].to_pylist(),
                             b["__w"].to_pylist()):
            other = TDigest(delta)
            other.means = np.frombuffer(mb, dtype=np.float64).copy()
            other.weights = np.frombuffer(wb, dtype=np.float64).copy()
            acc.setdefault(k, TDigest(delta)).merge(other)
    return {k: {q: d.quantile(q) for q in qs} for k, d in acc.items()}


class BloomFilter:
    """Vectorized Bloom filter over hash64 values (double hashing:
    idx_i = (h1 + i·h2) mod m). Sized from (n_items, fpp); bits ride the
    object store as one numpy array. Used to pre-filter semi/anti joins:
    a negative is DEFINITE, a positive needs exact verification."""

    def __init__(self, n_items: int, fpp: float = 0.01):
        n_items = max(n_items, 1)
        self.m = int(max(8, -n_items * np.log(fpp) / (np.log(2) ** 2)))
        self.k = max(1, int(round(self.m / n_items * np.log(2))))
        self.bits = np.zeros(self.m, dtype=bool)

    def _idx(self, values) -> np.ndarray:
        h1 = hash64(values, seed=1)
        h2 = hash64(values, seed=2)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add_array(self, values) -> "BloomFilter":
        if len(values):
            self.bits[self._idx(values).ravel()] = True
        return self

    def contains_array(self, values) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        return self.bits[self._idx(values)].all(axis=0)


class MisraGries:
    """Misra-Gries heavy-hitter summary: at most ``k`` (value, count)
    counters; any value with true frequency > n/(k+1) is guaranteed to
    survive, with undercount <= n/(k+1). Mergeable (Agarwal et al.,
    "Mergeable Summaries"): sum counters, keep the top-k, subtract the
    (k+1)-th largest count — the error bound is additive across merges.

    Used as the candidate-generation half of the exact heavy-hitters
    pattern: sketch per block (tiny), merge on the driver, then one exact
    recount restricted to the candidate set."""

    def __init__(self, k: int = 512):
        self.k = k
        self.counts: dict = {}

    def _prune(self) -> None:
        if len(self.counts) <= self.k:
            return
        cut = sorted(self.counts.values(), reverse=True)[self.k]
        self.counts = {v: c - cut for v, c in self.counts.items() if c > cut}

    def add_array(self, arr: np.ndarray) -> "MisraGries":
        vals, cnts = np.unique(arr, return_counts=True)
        for v, c in zip(vals.tolist(), cnts.tolist()):
            self.counts[v] = self.counts.get(v, 0) + int(c)
        self._prune()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        for v, c in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + c
        self._prune()
        return self


def heavy_hitters(ds, col: str, phi: float, total: int,
                  k: int | None = None, out_col: str = "n_events"):
    """EXACT heavy hitters (values with count >= phi * total) in two passes:

      1. per-block Misra-Gries partials (<= k narrow rows each) merged on
         the driver — candidate superset, guaranteed complete for
         k >= 1/phi (we default to 4/phi so merged-prune undercount
         cannot evict a true hitter);
      2. one exact recount over the candidate set only (broadcast is_in
         filter -> bounded-key grouped count) and the exact phi test.

    Never shuffles the raw key column; the only exchange is O(blocks x k)
    partial rows. Pass ``total`` (row count) from parquet metadata."""
    import pyarrow as pa

    from ..ops import relational as rel

    if k is None:
        k = max(512, int(4.0 / phi))

    def partial(t: pa.Table) -> pa.Table:
        mg = MisraGries(k).add_array(
            t[col].drop_null().to_numpy(zero_copy_only=False))
        # typed explicitly: an empty/all-null block would otherwise emit a
        # null-typed __v column and a schema-mismatched partial block
        return pa.table({
            "__v": pa.array(list(mg.counts.keys()),
                            type=t.schema.field(col).type),
            "__c": pa.array(list(mg.counts.values()), pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    acc = MisraGries(k)
    for b in parts.iter_batches(batch_format="pyarrow"):
        other = MisraGries(k)
        other.counts = dict(zip(b["__v"].to_pylist(), b["__c"].to_pylist()))
        acc.merge(other)
    candidates = list(acc.counts.keys())
    if not candidates:
        return rel.grouped_agg(ds.limit(0), [col], [(col, "count", out_col)])

    cand_ds = rel.semi_anti_join(ds, candidates, col)
    counted = rel.grouped_agg(cand_ds, [col], [(col, "count", out_col)])
    threshold = phi * total
    return rel.filter_batches(
        counted,
        lambda t: pa.compute.greater_equal(
            pa.compute.cast(t[out_col], pa.float64()), threshold))


def hll_distinct_by(ds, key_col: str, col: str, p: int = 12) -> dict:
    """Per-group distinct estimate: one HLL register array per (block,
    group), merged per key on the driver. The exchange is
    O(blocks × groups × 2^p bytes) — never the raw key column. Right for
    bounded group keys (event types, langs); unbounded keys would use the
    same partial shape through a groupby reduce."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        keys, regs = [], []
        tbl = t.select([key_col, col]).filter(
            pa.compute.is_valid(t[col]))
        for key_val in pa.compute.unique(tbl[key_col]).to_pylist():
            sub = tbl.filter(pa.compute.equal(tbl[key_col], key_val))
            h = HyperLogLog(p).add_hashes(hash64(sub[col]))
            keys.append(key_val)
            regs.append(h.registers.tobytes())
        # typed key column (empty/all-null blocks must not infer null type)
        return pa.table({"__k": pa.array(keys,
                                         type=t.schema.field(key_col).type),
                         "__regs": pa.array(regs, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    acc: dict = {}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for k, buf in zip(b["__k"].to_pylist(), b["__regs"].to_pylist()):
            other = np.frombuffer(buf, dtype=np.uint8)
            if k in acc:
                np.maximum(acc[k], other, out=acc[k])
            else:
                acc[k] = other.copy()
    out = {}
    for k, regs in acc.items():
        h = HyperLogLog(p)
        h.registers = regs
        out[k] = h.estimate()
    return out


def hll_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed distinct estimate: per-block register arrays (map),
    element-wise-max merge on the driver (registers are 2^p bytes, not
    keys)."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vals = t[col].drop_null()  # SQL COUNT(DISTINCT col) excludes NULLs
        h = HyperLogLog(p).add_hashes(hash64(vals))
        return pa.table({"registers": pa.array([h.registers.tobytes()],
                                               pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    acc = HyperLogLog(p)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for buf in b["registers"].to_pylist():
            other = HyperLogLog(p)
            other.registers = np.frombuffer(buf, dtype=np.uint8).copy()
            acc.merge(other)
    return acc.estimate()


class CountMinSketch:
    """Count-min frequency sketch (Cormode & Muthukrishnan): depth×width
    counter matrix, h_i(x) = (h1 + i·h2) mod width (double hashing over
    hash64). Estimates OVERCOUNT only: est(x) ≥ true(x), and
    est(x) ≤ true(x) + εN with probability 1−δ for width = ⌈e/ε⌉,
    depth = ⌈ln 1/δ⌉. Mergeable by elementwise ADDITION, so per-block
    partials combine associatively — the natural per-key-frequency
    companion to HyperLogLog (distinct) and Misra-Gries (top-k): use CMS
    when you need point lookups over a keyspace too large to count
    exactly."""

    def __init__(self, width: int = 2048, depth: int = 5):
        self.width = width
        self.depth = depth
        self.counts = np.zeros((depth, width), dtype=np.int64)

    def _idx(self, values) -> np.ndarray:
        h1 = hash64(values, seed=11)
        h2 = hash64(values, seed=12)
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :])
                % np.uint64(self.width)).astype(np.int64)

    def add_array(self, values) -> "CountMinSketch":
        if len(values):
            idx = self._idx(values)
            for d in range(self.depth):
                np.add.at(self.counts[d], idx[d], 1)
        return self

    def estimate_array(self, values) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._idx(values)
        return np.min(
            np.stack([self.counts[d][idx[d]] for d in range(self.depth)]),
            axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.counts.shape == other.counts.shape
        self.counts += other.counts
        return self


def cms_counts(ds, col: str, query_values,
               width: int = 2048, depth: int = 5):
    """Distributed count-min frequency estimates for ``query_values``:
    per-block CMS partials (a depth×width int64 matrix each — the raw key
    column never leaves its block) sum on the driver (merge = matrix
    addition), then one vectorized point lookup. Exchange volume is
    O(blocks × depth × width) regardless of row count or key
    cardinality."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        cms = CountMinSketch(width, depth).add_array(
            t[col].drop_null().to_numpy(zero_copy_only=False))
        return pa.table({"__cms": pa.array([cms.counts.ravel()])})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    acc = CountMinSketch(width, depth)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for row in b["__cms"].to_pylist():
            acc.counts += np.asarray(row, dtype=np.int64).reshape(
                depth, width)
    vals = np.asarray(query_values)
    return dict(zip(query_values, acc.estimate_array(vals).tolist()))



class KMV:
    """Bottom-k (K-Minimum-Values) distinct sketch (Bar-Yossef et al.
    2002; Beyer et al. 2007): keep the k smallest stable 64-bit key
    hashes. Mergeable (union = merge-and-truncate), so per-block
    sketches combine on the driver in O(blocks × k). Supports distinct
    estimation (D ≈ (k−1)/u_k with u_k the k-th minimum as a fraction of
    hash space) and, across two sketches, Jaccard / intersection
    estimation from the combined bottom-k — the join-planning statistic
    (estimated key overlap) that decides broadcast vs shuffle vs
    Bloom-prefilter without scanning either side twice."""

    __slots__ = ("k", "mins")

    def __init__(self, k: int = 1024):
        self.k = k
        self.mins = np.array([], np.uint64)

    def update(self, hashes: np.ndarray) -> "KMV":
        both = np.concatenate([self.mins, hashes])
        both = np.unique(both)          # sorted distinct
        self.mins = both[:self.k]
        return self

    def merge(self, other: "KMV") -> "KMV":
        return self.update(other.mins)

    def distinct(self) -> float:
        n = len(self.mins)
        if n < self.k:                  # saw fewer than k distinct: exact
            return float(n)
        u_k = (float(self.mins[-1]) + 1.0) / 2.0 ** 64
        return (self.k - 1) / u_k

    def jaccard(self, other: "KMV") -> float:
        """Jaccard of the two key sets from the combined bottom-k."""
        k = min(self.k, other.k)
        union = np.unique(np.concatenate([self.mins, other.mins]))[:k]
        if not len(union):
            return 0.0
        a = set(self.mins.tolist())
        b = set(other.mins.tolist())
        inter = sum(1 for h in union.tolist() if h in a and h in b)
        return inter / len(union)

    def intersection(self, other: "KMV") -> float:
        """|A ∩ B| ≈ J(A,B) · |A ∪ B| (union distinct from the merged
        sketch)."""
        j = self.jaccard(other)
        u = self.merge_copy(other).distinct()
        return j * u

    def merge_copy(self, other: "KMV") -> "KMV":
        out = KMV(min(self.k, other.k))
        out.update(self.mins)
        out.update(other.mins)
        return out


def kmv_sketch(ds, col: str, k: int = 1024) -> KMV:
    """Per-block bottom-k partials → driver merge: one pass, O(k) rows
    leave each block, driver state O(k)."""
    import pyarrow as pa

    from .hashing import stable_hash64

    def part(t: pa.Table) -> pa.Table:
        h = np.unique(stable_hash64(t[col]))[:k]
        return pa.table({"h": pa.array(h, pa.uint64())})

    sk = KMV(k)
    for b in ds.map_batches(part, batch_format="pyarrow",
                            zero_copy_batch=True
                            ).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        if t.num_rows:
            sk.update(t["h"].to_numpy(zero_copy_only=False))
    return sk
