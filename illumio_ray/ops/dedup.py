"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (SURVEY.md §2.7 + ray_guide dedup patterns):
  - exact: content-hash column (vectorized) → groupby(hash) → first-per-group;
    the shuffle key is the 64-bit hash, never the text payload;
  - MinHash-LSH: shingle→minhash per batch → explode to
    (band_id, band_hash, doc_id) rows → groupby bands → candidate pairs →
    verify true Jaccard on the pair table (join back to texts) → filter;
  - SimHash: 64-bit signature per doc; near-dup buckets by rotated
    prefixes;
  - embedding near-dup: brute-force cosine per batch against a broadcast
    matrix at small scale; the LSH/IVF variant in similarity.py is the
    scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import (hash64, minhash_signatures, simhash64,
                                 stable_hash64)
from ..functions.rounding import round_np

TOKEN_RE = r"[A-Za-z0-9_]+"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, content_col: str, id_col: str) -> rd.Dataset:
    """Keep one representative row (min id) per distinct content value.

    hash-partition + per-group first. The exchange key is
    hash64(content) % adaptive_bucket_count — a BOUNDED bucket, never one
    Ray group per distinct document (per-distinct-key map_groups is the
    #groups ≈ #rows pathology); all copies of a content value share its
    hash, so they meet in one bucket and keep-first is exact."""
    from .relational import adaptive_bucket_count

    nb = adaptive_bucket_count(None)

    def add_hash(t: pa.Table) -> pa.Table:
        b = (hash64(t[content_col]) % np.uint64(nb)).astype(np.int32)
        return t.append_column("__hb", pa.array(b, pa.int32()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        # dedup on the actual content, not its hash: at 10^12 docs, 64-bit
        # collisions are expected (birthday bound), and keying on the hash
        # alone would silently drop distinct docs
        return (g.sort_values(id_col)
                 .drop_duplicates(subset=[content_col], keep="first")
                 .drop(columns="__hb"))

    return hashed.groupby("__hb").map_groups(first_per_group, batch_format="pandas")


def _distinct_rows_bucketed(ds: rd.Dataset, cols: list[str],
                            num_buckets: int | None = None) -> rd.Dataset:
    """Distinct rows by ``cols`` (keep first, extra columns ride along)
    without one Ray group per distinct value: exchange on a hash bucket of
    the key columns, drop_duplicates vectorized inside each bucket."""
    from .relational import adaptive_bucket_count

    nb = num_buckets or adaptive_bucket_count(None)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(df), np.uint64)
        for c in cols:
            h = h * np.uint64(0x9E3779B97F4A7C15) + \
                pd.util.hash_pandas_object(df[c], index=False).to_numpy()
        return df.assign(__rb=(h % np.uint64(nb)).astype(np.int32))

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=cols).drop(columns="__rb")

    return (ds.map_batches(add_b, batch_format="pandas")
            .groupby("__rb").map_groups(dd, batch_format="pandas"))


# ---------------------------------------------------------------------------
# incremental exact dedup vs a persisted content index
# ---------------------------------------------------------------------------

_CONTENT_INDEX_META = "_content_index_meta.json"


def _content_bucket(col, num_buckets: int) -> pa.Array:
    b = (stable_hash64(col) % np.uint64(num_buckets)).astype(np.int32)
    return pa.array(b, pa.int32())


def build_content_index(ds: rd.Dataset, id_col: str, content_col: str,
                        out_dir: str, *, n_rows: int | None = None,
                        num_buckets: int | None = None) -> dict:
    """Persist the distinct-content index of a committed corpus: one row
    per DISTINCT content value (its min-id representative), hive-bucketed
    by ``stable_hash64(content) % num_buckets`` (pinned hash — the layout
    survives library upgrades, same contract as bucketing.write_bucketed).

    The content itself is stored, not just its hash: membership probes
    compare strings, so a 64-bit collision can never drop a distinct doc
    (the same birthday-bound reasoning as exact_dedup). Index size is
    the distinct corpus — the storage cost of exactness."""
    import json
    from pathlib import Path

    from .relational import adaptive_bucket_count

    nb = num_buckets or adaptive_bucket_count(n_rows)
    rep = exact_dedup(ds.select_columns([id_col, content_col]),
                      content_col, id_col)

    def add_b(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _content_bucket(t[content_col], nb))

    rep.map_batches(add_b, batch_format="pyarrow",
                    zero_copy_batch=True).write_parquet(
        str(out_dir), partition_cols=["__b"])
    meta = {"num_buckets": nb, "id_col": id_col, "content_col": content_col}
    Path(out_dir, _CONTENT_INDEX_META).write_text(json.dumps(meta))
    return meta


def append_to_content_index(accepted: rd.Dataset, index_dir: str) -> dict:
    """Commit an ACCEPTED batch (the exact_dedup_incremental output —
    already distinct within itself and vs the index) into the index:
    write its rows into the same bucket dirs (Ray names parquet files
    uniquely per job, so appends never clobber)."""
    import json
    from pathlib import Path

    meta = json.loads(Path(index_dir, _CONTENT_INDEX_META).read_text())
    nb, id_col, content_col = (meta["num_buckets"], meta["id_col"],
                               meta["content_col"])

    def add_b(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _content_bucket(t[content_col], nb))

    accepted.select_columns([id_col, content_col]).map_batches(
        add_b, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        str(index_dir), partition_cols=["__b"])
    return meta


def exact_dedup_incremental(new_ds: rd.Dataset, index_dir: str) -> rd.Dataset:
    """New-batch rows that survive exact dedup against BOTH the persisted
    corpus index and the batch itself (min-id representative per distinct
    content, exact_dedup semantics). The production incremental-ingest
    shape: the batch hashes its own content values, reads ONLY the index
    bucket dirs those hash into (partition pruning — untouched buckets
    cost nothing), and membership is an exact string compare in-bucket.
    New ids must be disjoint from indexed ids (append-only contract).

    ≙ the reference's processed-keys anti-join (app/s3_manager.py
    manifest check) lifted from file keys to content values. The group
    stage is Arrow-native end to end: a null-padded union routed through
    pandas would corrupt int64 ids to float64 (see CLAUDE.md), so both
    union sides are built with identical, fully-typed schemas."""
    import json
    from pathlib import Path

    meta = json.loads(Path(index_dir, _CONTENT_INDEX_META).read_text())
    nb, id_col, content_col = (meta["num_buckets"], meta["id_col"],
                               meta["content_col"])

    out_schema = new_ds.schema()  # ray Schema: .names + arrow .types
    names = list(out_schema.names)
    types = dict(zip(names, out_schema.types))

    def tag_new(t: pa.Table) -> pa.Table:
        t = t.select(names)  # pin column order so union sides align
        t = t.append_column("__b", _content_bucket(t[content_col], nb))
        return t.append_column("__new",
                               pa.array(np.ones(t.num_rows, np.int8)))

    new_rows = new_ds.map_batches(tag_new, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    touched = sorted(new_rows.unique("__b"))
    files = [str(f) for b in touched
             for f in sorted(Path(index_dir, f"__b={b}").glob("*.parquet"))]

    if files:
        old = rd.read_parquet(files, columns=[content_col])

        def tag_old(t: pa.Table) -> pa.Table:
            # identical schema to the new side — ride-along columns as
            # TYPED nulls, ids included (never used: old rows only feed
            # the membership set)
            cols = {n: (t[content_col] if n == content_col
                        else pa.nulls(t.num_rows, types[n]))
                    for n in names}
            tt = pa.table(cols)
            tt = tt.append_column("__b",
                                  _content_bucket(t[content_col], nb))
            return tt.append_column(
                "__new", pa.array(np.zeros(t.num_rows, np.int8)))

        rows = old.map_batches(tag_old, batch_format="pyarrow",
                               zero_copy_batch=True).union(new_rows)
    else:
        rows = new_rows

    def keep_fresh(t: pa.Table) -> pa.Table:
        isnew = pc.equal(t["__new"], 1)
        seen = pc.unique(t.filter(pc.invert(isnew))[content_col])
        fresh = t.filter(isnew)
        if len(seen):
            member = pc.is_in(fresh[content_col], value_set=seen)
            fresh = fresh.filter(pc.invert(pc.fill_null(member, False)))
        if fresh.num_rows == 0:
            return fresh.drop_columns(["__b", "__new"])
        # min-id representative per content within the batch: sort by id,
        # keep the first occurrence of each dictionary code (nulls form
        # one group, matching exact_dedup / drop_duplicates semantics)
        fresh = fresh.sort_by(id_col)
        codes = pc.fill_null(
            fresh[content_col].combine_chunks().dictionary_encode().indices,
            -1).to_numpy(zero_copy_only=False)
        _, first_idx = np.unique(codes, return_index=True)
        fresh = fresh.take(pa.array(np.sort(first_idx), pa.int64()))
        return fresh.drop_columns(["__b", "__new"])

    return rows.groupby("__b").map_groups(keep_fresh,
                                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sharded Bloom index — the 10^12-doc scale path of incremental dedup
# ---------------------------------------------------------------------------

_BLOOM_META = "_bloom_index_meta.json"
_BLOOM_SCHEME = "stable-double-packed-v2"  # bump when bit layout changes
_BLOOM_SHARD_BITS = 1 << 27         # 128 Mbit = 16 MB per shard file
_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], np.uint16)


def _bloom_hashes(col, num_shards: int) -> tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
    """(shard, h1, h2) per value — stable_hash64 double hashing (persisted
    layout → pinned hash, per the artifact table in functions/hashing.py).
    A content value's k bit positions all live in ONE shard."""
    h1 = stable_hash64(col, seed=1)
    h2 = stable_hash64(col, seed=2)
    return (h1 % np.uint64(num_shards)).astype(np.int32), h1, h2


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int, int]:
    """(num_shards, bits_per_shard, k) for a target capacity/fpp."""
    n_items = max(n_items, 1)
    m_total = int(max(64, -n_items * np.log(fpp) / (np.log(2) ** 2)))
    num_shards = max(1, -(-m_total // _BLOOM_SHARD_BITS))
    m_shard = -(-m_total // num_shards)
    k = max(1, int(round(m_total / n_items * np.log(2))))
    return num_shards, m_shard, k


def _bloom_idx(h1: np.ndarray, h2: np.ndarray, k: int,
               m: int) -> np.ndarray:
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).astype(np.int64)


def _bloom_set_bits(packed: np.ndarray, h1: np.ndarray, h2: np.ndarray,
                    k: int, m: int) -> None:
    """Set bits in a PACKED uint8 array (LSB-first within each byte) —
    the in-memory form matches the on-disk file, so no task ever holds
    the 8× unpacked bool expansion of a shard."""
    idx = _bloom_idx(h1, h2, k, m).ravel()
    np.bitwise_or.at(packed, idx >> 3,
                     np.left_shift(1, idx & 7).astype(np.uint8))


def _bloom_member(packed: np.ndarray, h1: np.ndarray, h2: np.ndarray,
                  k: int, m: int) -> np.ndarray:
    if len(h1) == 0:
        return np.zeros(0, dtype=bool)
    idx = _bloom_idx(h1, h2, k, m)
    return (((packed[idx >> 3] >> (idx & 7)) & 1) == 1).all(axis=0)


def build_bloom_index(ds: rd.Dataset, content_col: str, out_dir: str, *,
                      n_items: int, fpp: float = 1e-3) -> dict:
    """Persist a SHARDED Bloom membership filter over a corpus's content
    values — the scale path of incremental dedup for corpora where even
    the distinct-content index (build_content_index) is too large:
    O(n·ln(1/fpp)) BITS total (~14 bits/doc at fpp=1e-3, ~1.8 GB per
    10^9 docs), sharded into ≤16 MB files by hash so neither building
    nor probing ever loads the whole filter anywhere.

    Build shape: one narrow (shard, h1, h2) exchange — 20 bytes/doc, no
    content bytes move — then one task per shard sets its own bits and
    writes them; the driver holds meta only. The trade vs the exact
    index (documented, the CCNet/Dolma-style 'acceptable loss'): a
    NOVEL doc is falsely dropped at ~fpp; a SEEN doc always drops (no
    false negatives). ``n_items`` is the planned TOTAL corpus capacity
    (a Bloom filter cannot grow: over-filling degrades fpp, it never
    drops seen docs)."""
    import json
    from pathlib import Path

    num_shards, m_shard, k = _bloom_params(n_items, fpp)

    def expand(t: pa.Table) -> pa.Table:
        col = t[content_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sh, h1, h2 = _bloom_hashes(col, num_shards)
        return pa.table({"__s": pa.array(sh, pa.int32()),
                         "__h1": pa.array(h1, pa.uint64()),
                         "__h2": pa.array(h2, pa.uint64())})

    rows = ds.map_batches(expand, batch_format="pyarrow",
                          zero_copy_batch=True)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        s = int(t["__s"][0].as_py())
        packed = np.zeros((m_shard + 7) // 8, dtype=np.uint8)
        _bloom_set_bits(packed, t["__h1"].to_numpy(zero_copy_only=False),
                        t["__h2"].to_numpy(zero_copy_only=False), k, m_shard)
        tmp = out / f".bloom_{s:05d}.npy.tmp"
        with open(tmp, "wb") as fh:  # np.save on a PATH appends .npy
            np.save(fh, packed)
        tmp.replace(out / f"bloom_{s:05d}.npy")
        return pa.table({"shard": pa.array([s], pa.int32()),
                         "set_bits": pa.array(
                             [int(_POPCOUNT[packed].sum())], pa.int64())})

    stats = rows.groupby("__s").map_groups(
        write_shard, batch_format="pyarrow").materialize()
    meta = {"num_shards": num_shards, "m_shard": m_shard, "k": k,
            "fpp": fpp, "n_items": n_items, "scheme": _BLOOM_SCHEME,
            "shards_written": stats.count()}
    Path(out_dir, _BLOOM_META).write_text(json.dumps(meta))
    return meta


def append_to_bloom_index(accepted: rd.Dataset, index_dir: str,
                          content_col: str) -> dict:
    """OR an accepted batch's bits into the existing shard files (tmp +
    atomic rename per shard; missing shards are created). SINGLE-WRITER,
    like the lineage manifest protocol — two concurrent appends to one
    shard lose one writer's bits."""
    import json
    from pathlib import Path

    meta = json.loads(Path(index_dir, _BLOOM_META).read_text())
    if meta.get("scheme") != _BLOOM_SCHEME:
        raise ValueError(
            f"bloom index at {index_dir} was built with scheme "
            f"{meta.get('scheme')!r}; this build expects {_BLOOM_SCHEME!r}")
    num_shards, m_shard, k = (meta["num_shards"], meta["m_shard"], meta["k"])
    out = Path(index_dir)

    def expand(t: pa.Table) -> pa.Table:
        col = t[content_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sh, h1, h2 = _bloom_hashes(col, num_shards)
        return pa.table({"__s": pa.array(sh, pa.int32()),
                         "__h1": pa.array(h1, pa.uint64()),
                         "__h2": pa.array(h2, pa.uint64())})

    def or_shard(t: pa.Table) -> pa.Table:
        s = int(t["__s"][0].as_py())
        f = out / f"bloom_{s:05d}.npy"
        packed = (np.load(f).copy() if f.exists()
                  else np.zeros((m_shard + 7) // 8, dtype=np.uint8))
        _bloom_set_bits(packed, t["__h1"].to_numpy(zero_copy_only=False),
                        t["__h2"].to_numpy(zero_copy_only=False), k, m_shard)
        tmp = out / f".bloom_{s:05d}.npy.tmp"
        with open(tmp, "wb") as fh:  # np.save on a PATH appends .npy
            np.save(fh, packed)
        tmp.replace(f)
        return pa.table({"shard": pa.array([s], pa.int32())})

    (accepted.map_batches(expand, batch_format="pyarrow",
                          zero_copy_batch=True)
     .groupby("__s").map_groups(or_shard,
                                batch_format="pyarrow").materialize())
    return meta


def bloom_dedup_incremental(new_ds: rd.Dataset, index_dir: str,
                            content_col: str, id_col: str) -> rd.Dataset:
    """exact_dedup_incremental's Bloom-index sibling: new-batch rows whose
    content is bloom-NEGATIVE vs the committed corpus, reduced to min-id
    representatives within the batch. One (shard-of-hash) exchange; each
    group task loads exactly ONE ≤16 MB shard file — never the filter,
    never the corpus. False-negative-free (a committed content always
    drops); novel contents are falsely dropped at ~fpp — the documented
    trade vs the exact content index."""
    import json
    from pathlib import Path

    meta = json.loads(Path(index_dir, _BLOOM_META).read_text())
    if meta.get("scheme") != _BLOOM_SCHEME:
        raise ValueError(
            f"bloom index at {index_dir} was built with scheme "
            f"{meta.get('scheme')!r}; this build expects {_BLOOM_SCHEME!r}")
    num_shards, m_shard, k = (meta["num_shards"], meta["m_shard"], meta["k"])
    out = Path(index_dir)
    names = list(new_ds.schema().names)

    def tag(t: pa.Table) -> pa.Table:
        t = t.select(names)
        col = t[content_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sh, h1, h2 = _bloom_hashes(col, num_shards)
        t = t.append_column("__s", pa.array(sh, pa.int32()))
        t = t.append_column("__h1", pa.array(h1, pa.uint64()))
        return t.append_column("__h2", pa.array(h2, pa.uint64()))

    rows = new_ds.map_batches(tag, batch_format="pyarrow",
                              zero_copy_batch=True)

    def keep_fresh(t: pa.Table) -> pa.Table:
        s = int(t["__s"][0].as_py())
        f = out / f"bloom_{s:05d}.npy"
        if f.exists():
            packed = np.load(f)
            seen = _bloom_member(
                packed, t["__h1"].to_numpy(zero_copy_only=False),
                t["__h2"].to_numpy(zero_copy_only=False), k, m_shard)
            t = t.filter(pa.array(~seen))
        t = t.drop_columns(["__s", "__h1", "__h2"])
        if t.num_rows == 0:
            return t
        t = t.sort_by(id_col)
        codes = pc.fill_null(
            t[content_col].combine_chunks().dictionary_encode().indices,
            -1).to_numpy(zero_copy_only=False)
        _, first_idx = np.unique(codes, return_index=True)
        return t.take(pa.array(np.sort(first_idx), pa.int64()))

    return rows.groupby("__s").map_groups(keep_fresh,
                                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# tokenization / shingling helpers (per-batch, numpy-vectorized core)
# ---------------------------------------------------------------------------

_SHINGLE_C = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier


def _shingle_hashes(texts: list[str], n: int = 3,
                    hasher=None) -> list[np.ndarray]:
    """Per doc: hashed word-n-gram shingle set (uint64), built WITHOUT
    materializing shingle strings: every token in the batch hashes once
    (one vectorized hasher call), and each n-gram key is a rolling
    polynomial combine of n token hashes — the same pattern as
    textops.add_dup_ngram_fraction. The per-doc `" ".join` string build
    this replaces dominated near-dup CPU. Semantics preserved: lowercase,
    whitespace tokenization, docs with 0 < tokens < n collapse to ONE
    whole-text key, empty docs → empty set, per-doc output sorted unique.

    ``hasher`` defaults to hash64 (fast, within-run); pass stable_hash64
    for anything PERSISTED and re-read later (shingle indexes). Key VALUES
    changed when this moved from string shingles to rolling token keys —
    persisted index metadata carries ``scheme`` and refuses a mismatch."""
    if hasher is None:
        hasher = hash64
    n_texts = len(texts)
    if n_texts == 0:
        return []
    arr = pa.array(["" if s is None else s for s in texts], pa.string())
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), r"\s+")
    offs = lists.offsets.to_numpy()
    row_idx = np.repeat(np.arange(n_texts), np.diff(offs))
    flat = lists.flatten()
    ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    row_idx = row_idx[ok]
    toks = flat.filter(pa.array(ok))
    h = hasher(toks).astype(np.uint64)
    tok_counts = np.bincount(row_idx, minlength=n_texts)

    # full-width rolling keys: position i covers tokens i..i+n-1, valid
    # only when both ends sit in the same row
    if len(h) >= n:
        key = h[: len(h) - n + 1] * _SHINGLE_C
        for j in range(1, n):
            key = (key + h[j: len(h) - n + 1 + j]) * _SHINGLE_C
        valid = row_idx[: len(h) - n + 1] == row_idx[n - 1:]
        g_row = row_idx[: len(h) - n + 1][valid]
        g_key = key[valid]
    else:
        g_row = np.array([], np.int64)
        g_key = np.array([], np.uint64)

    # short docs (0 < tokens < n): one whole-text key, combined with the
    # same polynomial — grouped by length so each length vectorizes
    short = np.flatnonzero((tok_counts > 0) & (tok_counts < n))
    if len(short):
        starts = np.zeros(n_texts, np.int64)
        np.cumsum(tok_counts[:-1], out=starts[1:])
        extra_rows, extra_keys = [g_row], [g_key]
        for k in np.unique(tok_counts[short]):
            rows_k = short[tok_counts[short] == k]
            idx = starts[rows_k]
            key = h[idx] * _SHINGLE_C
            for j in range(1, int(k)):
                key = (key + h[idx + j]) * _SHINGLE_C
            extra_rows.append(rows_k)
            extra_keys.append(key)
        g_row = np.concatenate(extra_rows)
        g_key = np.concatenate(extra_keys)

    if len(g_key) == 0:
        return [np.array([], np.uint64)] * n_texts
    # one global sort+dedup, then per-doc slicing (sorted-unique views)
    order = np.lexsort((g_key, g_row))
    sr, sk = g_row[order], g_key[order]
    first = np.ones(len(sk), bool)
    first[1:] = (sr[1:] != sr[:-1]) | (sk[1:] != sk[:-1])
    sr, sk = sr[first], sk[first]
    bounds = np.searchsorted(sr, np.arange(n_texts + 1))
    return [sk[bounds[r]: bounds[r + 1]] for r in range(n_texts)]


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def minhash_lsh_candidates(ds: rd.Dataset, id_col: str, text_col: str,
                           num_perm: int = 64, bands: int = 16,
                           shingle_n: int = 3, seed: int = 7,
                           n_docs: int | None = None) -> rd.Dataset:
    """Stage 1+2: per-batch minhash signatures, exploded to LSH band rows,
    grouped by (band_id, band_hash) → candidate pair rows (id_a < id_b).

    Pass ``n_docs`` when the caller knows it (survivor counts, parquet
    metadata): calling ``ds.count()`` on a lazy non-parquet pipeline would
    force a full extra execution of the upstream stages just to pick the
    fast path. Unknown size falls through to the distributed path."""
    rows_per_band = num_perm // bands

    def to_band_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        sigs = minhash_signatures(_shingle_hashes(texts, shingle_n), num_perm, seed)
        n = len(ids)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        doc_ids = np.repeat(np.asarray(ids), bands)
        # Fold each band's signature slice to one 64-bit bucket key with a
        # polynomial combine — equal slices collide, unequal slices don't
        # (mod 2⁻⁶⁴ collisions); the string "_".join build this replaces
        # was O(docs × perms) Python. band_id rides separately in the
        # groupby key, so cross-band key reuse is harmless.
        band_hash = np.empty(n * bands, dtype=np.int64)
        for b in range(bands):
            seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            key = seg[:, 0] * _SHINGLE_C
            for j in range(1, rows_per_band):
                key = (key + seg[:, j]) * _SHINGLE_C
            band_hash[b::bands] = key.view(np.int64)
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hash, pa.int64()),
            id_col: pa.array(doc_ids),
        })

    band_rows = ds.map_batches(to_band_rows, batch_format="pyarrow",
                               zero_copy_batch=True)

    # Band rows are O(docs × bands) narrow int rows — tiny relative to the
    # text. Below ~2M KNOWN docs the bucket-join runs driver-side in one
    # pandas pass (two Ray sort-shuffles cost seconds of fixed overhead
    # each); above — or when the size is unknown — the same logic runs as
    # distributed groupbys.
    # The small-corpus fast path fires only on an EXPLICIT n_docs from the
    # caller (parquet footers, survivor counters) — no plan introspection:
    # unknown size takes the distributed path, which is correct at any
    # scale and merely pays two sort-shuffles of fixed overhead. Gate at
    # 100k docs (lowered from 500k in round 5): with the vectorized
    # self-merge pair emission the distributed path already TIES the
    # driver path by 250k docs (measured 4.5 vs 4.8 s) while holding the
    # O(docs × bands) band-row frame off the driver (697 → 245 MB RSS at
    # 250k); below 100k the driver path's ~0.4 s fixed-cost win stands
    # and its frame stays ≤ ~100 MB.
    if n_docs is not None and n_docs <= 100_000:
        tbl = pa.concat_tables(
            pa.table(b) for b in band_rows.iter_batches(batch_format="pyarrow"))
        df = tbl.to_pandas()
        # NO per-group Python loop: with docs × bands band rows, almost
        # every (band_id, band_hash) group is a singleton, and even the
        # non-singleton groups number O(dup docs × bands) — a groupby
        # iteration is a Python loop over both (measured: 250 k docs with
        # ~10% dups pegged the driver for >10 min). Instead: duplicated()
        # drops singletons in one vectorized pass, then a self-merge on
        # the band key emits every intra-group pair (same shape as
        # ngram_jaccard's emit_pairs); the a<b filter orders them and
        # drop_duplicates collapses multi-band hits.
        df = df[df.duplicated(["band_id", "band_hash"], keep=False)]
        if len(df):
            cols = ["band_id", "band_hash", id_col]
            m = df[cols].merge(df[cols], on=["band_id", "band_hash"],
                               suffixes=("_a", "_b"))
            m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
            if len(m):
                pairs_df = (m[[f"{id_col}_a", f"{id_col}_b"]]
                            .rename(columns={f"{id_col}_a": "id_a",
                                             f"{id_col}_b": "id_b"})
                            .drop_duplicates(ignore_index=True))
                return rd.from_pandas(pairs_df)
        # keep the input id TYPE (string doc ids must not become int64 here
        # while the non-empty case and the distributed path preserve them);
        # built as Arrow — Ray drops columns on an empty object-dtype
        # pandas frame
        id_type = tbl.schema.field(id_col).type
        return rd.from_arrow(pa.table({"id_a": pa.array([], id_type),
                                       "id_b": pa.array([], id_type)}))

    # distributed path: exchange on a BOUNDED bucket of (band_id,
    # band_hash) — a band bucket's rows all share it — then emit pairs per
    # band group vectorized inside the bucket (never one Ray group per
    # distinct band hash: #bands × #docs groups is the #groups ≈ #rows
    # pathology).
    from .relational import adaptive_bucket_count

    nb = adaptive_bucket_count(None)

    def add_cb(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["band_hash"].to_numpy().astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)
             + df["band_id"].to_numpy().astype(np.uint64))
        return df.assign(__cb=(h % np.uint64(nb)).astype(np.int32))

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # same vectorized shape as the driver fast path: singleton
        # pre-filter, then a self-merge on the band key — no per-group
        # Python loop (a bucket holds ~rows×bands/nb band groups,
        # nearly all size 1, and groupby ITERATION is a Python loop
        # over all of them)
        g = g[g.duplicated(["band_id", "band_hash"], keep=False)]
        empty = pd.DataFrame({"id_a": g[id_col].iloc[:0],
                              "id_b": g[id_col].iloc[:0]})
        if not len(g):
            return empty
        cols = ["band_id", "band_hash", id_col]
        m = g[cols].merge(g[cols], on=["band_id", "band_hash"],
                          suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if not len(m):
            return empty
        return pd.DataFrame({"id_a": m[f"{id_col}_a"].to_numpy(),
                             "id_b": m[f"{id_col}_b"].to_numpy()})

    cand = (band_rows.map_batches(add_cb, batch_format="pandas")
            .groupby("__cb").map_groups(pairs_in_bucket,
                                        batch_format="pandas"))
    # Same pair can fire in multiple bands → dedup (bucketed, same reason).
    return _distinct_rows_bucketed(cand, ["id_a", "id_b"], nb)


# Broadcast-verify is only valid while every worker can pin the corpus's
# shingle sets in heap; above this row count callers must switch to
# verify_jaccard_pairs_join (reduce-side, no corpus broadcast).
BROADCAST_VERIFY_MAX_DOCS = 200_000


def verify_jaccard_pairs(cand: rd.Dataset, docs: pa.Table, id_col: str,
                         text_col: str, threshold: float = 0.8,
                         shingle_n: int = 3) -> rd.Dataset:
    """Stage 3: compute true n-gram Jaccard for candidate pairs against the
    broadcast doc table; keep pairs >= threshold.

    Broadcast is valid while the candidate universe's text fits an actor
    (here: the whole docs table). At 100 TB the same verify runs as two
    hash joins (pair ⋈ docs on id_a, then id_b) feeding the identical
    per-pair kernel."""
    ref = ray.put(docs)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        # per-worker-process shingle cache (task mode: no actor-pool ramp)
        sh = _VERIFY_CACHE.get(ref)
        if sh is None:
            d = ray.get(ref)
            sh = dict(zip(d[id_col].to_pylist(),
                          _shingle_hashes(d[text_col].to_pylist(), shingle_n)))
            # one pinned corpus per worker: a session running many queries
            # (bench runs 10+) must not accumulate corpus-sized shingle
            # dicts per long-lived worker process
            _VERIFY_CACHE.clear()
            _VERIFY_CACHE[ref] = sh
        empty = np.array([], np.uint64)
        js = [jaccard(sh.get(a, empty), sh.get(b, empty))
              for a, b in zip(batch["id_a"], batch["id_b"])]
        batch = batch.assign(jaccard=round_np(np.asarray(js), 6))
        return batch[batch["jaccard"] >= threshold]

    return cand.map_batches(verify, batch_format="pandas")


_VERIFY_CACHE: dict = {}


def verify_jaccard_pairs_join(cand: rd.Dataset, docs: rd.Dataset, id_col: str,
                              text_col: str, threshold: float = 0.8,
                              shingle_n: int = 3,
                              num_partitions: int | None = None) -> rd.Dataset:
    """The 100 TB verify path: no broadcast of the corpus. Candidate pairs
    are key-partitioned with the docs table twice (reduce-side join on
    id_a, then id_b) to carry both texts to the pair row, then the same
    per-pair Jaccard kernel runs per batch. Shuffle volume is
    O(pairs + docs), never a full corpus broadcast.

    Implemented as groupby().map_groups reduce-side joins rather than
    Dataset.join: Ray 2.49's hash-join operator crashes when a partition
    receives rows on only one side (schema-less empty block → acero
    'no match for key field' in the chained join)."""
    del num_partitions  # groupby picks its own partitioning

    from .relational import adaptive_bucket_count

    nb = adaptive_bucket_count(None)

    def _attach(pairs_ds: rd.Dataset, key: str, pair_cols: list[str],
                out_text: str) -> rd.Dataset:
        """Reduce-side join: union pair rows and doc rows into one
        column-aligned dataset, exchange on a BOUNDED key-hash bucket
        (never one Ray group per doc — the #groups ≈ #rows pathology),
        then an in-bucket pyarrow join attaches each pair row's doc
        text."""
        col_types = {"id_a": pa.int64(), "id_b": pa.int64(),
                     "__text_a": pa.string()}
        union_cols = pair_cols + ["__k", "__kb", "__doc_text"]

        def _kb(k_arr) -> pa.Array:
            k = k_arr.to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.array(
                ((k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(nb))
                .astype(np.int32), pa.int32())

        def pad_pairs(t: pa.Table, k=key) -> pa.Table:
            cols = {c: pc.cast(t[c], col_types.get(c, pa.string()))
                    for c in pair_cols}
            cols["__k"] = pc.cast(t[k], pa.int64())
            cols["__kb"] = _kb(cols["__k"])
            cols["__doc_text"] = pa.nulls(t.num_rows, pa.string())
            return pa.table({c: cols[c] for c in union_cols})

        def pad_docs(t: pa.Table) -> pa.Table:
            cols = {c: pa.nulls(t.num_rows, col_types.get(c, pa.string()))
                    for c in pair_cols}
            cols["__k"] = pc.cast(t[id_col], pa.int64())
            cols["__kb"] = _kb(cols["__k"])
            cols["__doc_text"] = pc.cast(t[text_col], pa.string())
            return pa.table({c: cols[c] for c in union_cols})

        tagged_pairs = pairs_ds.map_batches(pad_pairs, batch_format="pyarrow",
                                            zero_copy_batch=True)
        tagged_docs = docs.map_batches(pad_docs, batch_format="pyarrow",
                                       zero_copy_batch=True)

        def attach(g: pa.Table) -> pa.Table:
            # stays pyarrow end-to-end: a pandas conversion would promote
            # the null-padded int64 id columns to float64 and corrupt
            # ids >= 2^53
            has_text = pc.is_valid(g["__doc_text"])
            doc_rows = (g.filter(has_text)
                         .select(["__k", "__doc_text"]))
            pair_rows = g.filter(pc.invert(has_text)) \
                         .drop_columns(["__doc_text", "__kb"])
            if doc_rows.num_rows == 0 or pair_rows.num_rows == 0:
                return (pair_rows.slice(0, 0).drop_columns(["__k"])
                        .append_column(out_text,
                                       pa.array([], pa.string())))
            j = pair_rows.join(doc_rows, keys="__k", join_type="inner")
            out = pa.table({c: j[c] for c in pair_cols})
            return out.append_column(out_text, j["__doc_text"])

        merged = tagged_pairs.union(tagged_docs)
        return merged.groupby("__kb").map_groups(attach,
                                                 batch_format="pyarrow")

    # Materialize between the two attach rounds (and the candidate table
    # feeding round 1): both are O(pairs) rows — megabytes — while leaving
    # them lazy fuses candidates + two union→sort→attach exchanges into
    # ONE executed plan. Ray 2.49's resource manager splits the object
    # store budget across every operator of the running plan, and under a
    # constrained store (measured: 250 k docs, 16 CPUs, ≤1 GB) the fused
    # plan starves — the executor spins with zero task output
    # indefinitely. Stage-wise execution keeps at most one all-to-all in
    # flight, and the same probe completes with zero spill.
    step1 = _attach(cand.materialize(), "id_a", ["id_a", "id_b"],
                    "__text_a").materialize()
    step2 = _attach(step1, "id_b", ["id_a", "id_b", "__text_a"], "__text_b")

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        sh_a = _shingle_hashes(batch["__text_a"].tolist(), shingle_n)
        sh_b = _shingle_hashes(batch["__text_b"].tolist(), shingle_n)
        js = np.asarray([jaccard(a, b) for a, b in zip(sh_a, sh_b)])
        out = batch[["id_a", "id_b"]].assign(jaccard=round_np(js, 6))
        return out[out["jaccard"] >= threshold]

    return step2.map_batches(verify, batch_format="pandas")


def verify_jaccard_pairs_disk(cand: rd.Dataset, docs: rd.Dataset,
                              id_col: str, text_col: str, work_dir,
                              threshold: float = 0.8, shingle_n: int = 3,
                              num_buckets: int | None = None) -> rd.Dataset:
    """The CONSTRAINED-STORE verify path: same reduce-side join semantics
    as verify_jaccard_pairs_join, but the exchange medium is a parquet
    bucket layout on disk (ops/bucketing), not an object-store all-to-all.
    Ray 2.49's union→sort plan starves under a small object store once
    the sort's working set (the corpus text) approaches the budget — the
    resource manager admits no tasks and the executor spins (measured:
    250 k docs stall at a 1 GB store that the flagship streams through
    untouched). Here each step is one map-write (streams, any store size)
    plus one Ray task per bucket doing an in-memory arrow join of
    bucket-sized inputs — working set per task = corpus/num_buckets,
    chosen by adaptive_bucket_count. This is also the honest 100 TB
    shape: at corpus ≫ store, a disk (or object-storage) exchange is the
    only medium that holds the shuffle."""
    import shutil
    from pathlib import Path

    from .bucketing import bucketed_join, write_bucketed
    from .relational import adaptive_bucket_count

    cand = cand.materialize()  # O(pairs) rows; consumed for count + write
    if cand.count() == 0:
        # empty bucket layouts have no schema file — and no pairs means
        # no output regardless of the corpus
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    nb = num_buckets or adaptive_bucket_count(None)
    work = Path(work_dir)
    shutil.rmtree(work, ignore_errors=True)
    docs_dir = work / "docs"
    write_bucketed(
        docs.map_batches(
            lambda t: pa.table({"__k": pc.cast(t[id_col], pa.int64()),
                                "__doc_text": pc.cast(t[text_col],
                                                      pa.string())}),
            batch_format="pyarrow", zero_copy_batch=True),
        "__k", nb, docs_dir)

    def _attach_disk(pairs_ds: rd.Dataset, key: str, pair_cols: list[str],
                     out_text: str, tag: str) -> rd.Dataset:
        pdir = work / f"pairs_{tag}"
        write_bucketed(
            pairs_ds.map_batches(
                lambda t, k=key: t.select(pair_cols).append_column(
                    "__k", pc.cast(t[k], pa.int64())),
                batch_format="pyarrow", zero_copy_batch=True),
            "__k", nb, pdir)
        joined = bucketed_join(pdir, docs_dir, on=["__k"], num_buckets=nb,
                               join_type="inner")
        return joined.map_batches(
            lambda t: pa.table({**{c: t[c] for c in pair_cols},
                                out_text: t["__doc_text"]}),
            batch_format="pyarrow", zero_copy_batch=True)

    step1 = _attach_disk(cand, "id_a", ["id_a", "id_b"], "__text_a", "a")
    step2 = _attach_disk(step1, "id_b", ["id_a", "id_b", "__text_a"],
                         "__text_b", "b")

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        sh_a = _shingle_hashes(batch["__text_a"].tolist(), shingle_n)
        sh_b = _shingle_hashes(batch["__text_b"].tolist(), shingle_n)
        js = np.asarray([jaccard(a, b) for a, b in zip(sh_a, sh_b)])
        out = batch[["id_a", "id_b"]].assign(jaccard=round_np(js, 6))
        return out[out["jaccard"] >= threshold]

    return step2.map_batches(verify, batch_format="pandas")


def near_dup_pairs(ds: rd.Dataset, docs: pa.Table, id_col: str, text_col: str,
                   threshold: float = 0.8, **kw) -> rd.Dataset:
    cand = minhash_lsh_candidates(ds, id_col, text_col, **kw)
    return verify_jaccard_pairs(cand, docs, id_col, text_col, threshold)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (inverted-index join — no LSH approximation)
# ---------------------------------------------------------------------------

def _reduce_pairs_to_jaccard(pairs: rd.Dataset, threshold: float,
                             num_buckets: int,
                             measure: str = "jaccard") -> rd.Dataset:
    """(id_a, id_b, sz_a, sz_b) co-occurrence rows → exact Jaccard pairs
    ≥ threshold. The pair count is a groupby where #groups ≈ #rows (most
    candidate pairs share exactly one shingle), the worst case for a
    composite-key sort-aggregate — measured 21 s vs 3 s at sf0.1. Instead:
    combine within each block (collapses the true near-dups, whose ~sz
    shared shingles all count toward one pair), hash-partition by a
    PAIR bucket (few distinct values — the same cheap exchange shape as
    the shingle stage), and finish each bucket vectorized in pandas,
    applying the threshold inside the reduce so sub-threshold pairs never
    materialize downstream."""

    def _pb(df: pd.DataFrame) -> np.ndarray:
        ha = pd.util.hash_pandas_object(df["id_a"], index=False).to_numpy()
        hb = pd.util.hash_pandas_object(df["id_b"], index=False).to_numpy()
        return ((ha * np.uint64(0x9E3779B97F4A7C15) + hb)
                % np.uint64(num_buckets)).astype(np.int32)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"id_a": df["id_a"], "id_b": df["id_b"],
                                 "inter": pd.Series([], dtype=np.int64),
                                 "sz_a": df["sz_a"], "sz_b": df["sz_b"],
                                 "__pb": pd.Series([], dtype=np.int32)})
        g = (df.groupby(["id_a", "id_b"], sort=False)
               .agg(inter=("sz_a", "size"), sz_a=("sz_a", "first"),
                    sz_b=("sz_b", "first")).reset_index())
        g["inter"] = g["inter"].astype(np.int64)
        g["__pb"] = _pb(g)
        return g

    partials = pairs.map_batches(partial, batch_format="pandas")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        f = (g.groupby(["id_a", "id_b"], sort=False)
               .agg(inter=("inter", "sum"), sz_a=("sz_a", "first"),
                    sz_b=("sz_b", "first")).reset_index())
        inter = f["inter"].to_numpy(np.float64)
        if measure == "containment":
            # MAX containment: |A∩B| / min(|A|,|B|) — 1.0 whenever the
            # smaller shingle set sits wholly inside the larger, which
            # symmetric Jaccard dilutes toward 0 as the size gap grows
            den = np.minimum(f["sz_a"].to_numpy(np.float64),
                             f["sz_b"].to_numpy(np.float64))
        else:
            den = (f["sz_a"].to_numpy(np.float64)
                   + f["sz_b"].to_numpy() - inter)
        j = np.divide(inter, den, out=np.zeros_like(inter),
                      where=den > 0)
        keep = j >= threshold
        return pd.DataFrame({"id_a": f["id_a"][keep],
                             "id_b": f["id_b"][keep],
                             measure: round_np(j[keep], 6)})

    return partials.groupby("__pb").map_groups(finish,
                                               batch_format="pandas")


def ngram_jaccard_pairs(ds: rd.Dataset, id_col: str, text_col: str, *,
                        n: int = 3, threshold: float = 0.8,
                        max_df: int | None = None,
                        n_rows: int | None = None,
                        num_buckets: int | None = None,
                        measure: str = "jaccard") -> rd.Dataset:
    """EXACT word-n-gram Jaccard pairs ≥ threshold via an inverted-index
    join — the non-approximate sibling of MinHash-LSH (same shingles, no
    signature error). ≙ the dedup family list in SURVEY §2.7.
    ``measure="containment"`` scores |A∩B|/min(|A|,|B|) instead — the
    asymmetric boilerplate/quote detector (a short doc embedded verbatim
    in a long one scores 1.0 where Jaccard tends to 0).

    Scale shape (three shuffle-free map stages + two exchanges):
      1. explode each doc to (shingle_hash, doc_id, set_size) rows — set
         semantics (per-doc shingles deduped), sizes carried inline so the
         final step never joins back to a per-doc table;
      2. hash-partition by shingle bucket (adaptive count) and self-merge
         within the bucket → co-occurrence pair rows. A shingle's rows all
         land in one bucket, so local df == global df and singleton
         shingles prune locally before the merge;
      3. groupby (id_a, id_b) count → intersection; |A∪B| = sz_a+sz_b−inter.

    Only shingle hashes and ids ever shuffle — text stays in stage 1.
    ``max_df`` (optional) drops shingles shared by more than max_df docs
    before pair emission: standard stop-shingle pruning that bounds the
    k²-pair blowup of ultra-common shingles at corpus scale. It is a
    documented approximation (pairs whose ONLY shared shingles are
    ultra-common are missed); the default None is exact and oracle-matched.
    """
    from .relational import adaptive_bucket_count

    def explode(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        sh = _shingle_hashes(texts, n)
        counts = np.array([len(a) for a in sh], np.int64)
        flat = (np.concatenate(sh) if len(sh) else np.array([], np.uint64))
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), counts)
        sizes = np.repeat(counts, counts)
        return pa.table({
            "shingle": pa.array(flat.astype(np.int64), pa.int64()),
            "doc": pa.array(ids),
            "sz": pa.array(sizes.astype(np.int32), pa.int32()),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)

    if num_buckets is None:
        num_buckets = adaptive_bucket_count(n_rows)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t["shingle"].to_numpy(zero_copy_only=False)
             .astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__b", pa.array(b, pa.int32()))

    bucketed = exploded.map_batches(add_bucket, batch_format="pyarrow",
                                    zero_copy_batch=True)

    def _empty(g: pd.DataFrame) -> pd.DataFrame:
        # schema-stable empty frame with the id/size dtypes of THIS input
        return pd.DataFrame({"id_a": g["doc"].iloc[:0],
                             "id_b": g["doc"].iloc[:0],
                             "sz_a": g["sz"].iloc[:0],
                             "sz_b": g["sz"].iloc[:0]})

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # all occurrences of a shingle are in this bucket → local df is
        # global df; singletons can never contribute to an intersection
        g = g[g.duplicated("shingle", keep=False)]
        if max_df is not None and len(g):
            df_per = g.groupby("shingle")["doc"].transform("size")
            g = g[df_per <= max_df]
        if not len(g):
            return _empty(g)
        m = g[["shingle", "doc", "sz"]].merge(
            g[["shingle", "doc", "sz"]], on="shingle", suffixes=("_a", "_b"))
        m = m[m["doc_a"] < m["doc_b"]]
        if not len(m):
            return _empty(g)
        return (m[["doc_a", "doc_b", "sz_a", "sz_b"]]
                .rename(columns={"doc_a": "id_a", "doc_b": "id_b"}))

    pairs = bucketed.groupby("__b").map_groups(emit_pairs,
                                               batch_format="pandas")
    return _reduce_pairs_to_jaccard(pairs, threshold, num_buckets,
                                    measure=measure)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def add_simhash(ds: rd.Dataset, id_col: str, text_col: str) -> rd.Dataset:
    """64-bit SimHash per doc (token-hash sign aggregation)."""
    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        toks = [np.unique(hash64((s or "").lower().split())) if s else np.array([], np.uint64)
                for s in texts]
        sh = simhash64(toks).astype(np.int64)
        return t.append_column("simhash", pa.array(sh, pa.int64()))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dup_groups(ds: rd.Dataset, id_col: str, text_col: str) -> rd.Dataset:
    """Exact-signature SimHash buckets with >1 member (near-dup clusters).
    Exchange on signature % adaptive_bucket_count (bounded), never one Ray
    group per distinct signature; the >1-member test runs vectorized
    inside the bucket on the full signature."""
    from .relational import adaptive_bucket_count

    nb = adaptive_bucket_count(None)
    sh = add_simhash(ds, id_col, text_col)
    # pre-project BEFORE the bucket exchange: the group stage needs only
    # (id, simhash) — the text must not ride a shuffle it takes no part in
    sh = sh.map_batches(
        lambda t: pa.table({
            id_col: t[id_col],
            "simhash": t["simhash"],
            "__shb": pa.array(
                (t["simhash"].to_numpy(zero_copy_only=False)
                 .astype(np.uint64) % np.uint64(nb)).astype(np.int32),
                pa.int32()),
        }),
        batch_format="pyarrow", zero_copy_batch=True)

    def group(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("simhash")["simhash"].transform("size")
        return g.loc[sizes > 1, [id_col, "simhash"]]

    return sh.groupby("__shb").map_groups(group, batch_format="pandas")


def hamming_dup_pairs(ds: rd.Dataset, id_col: str, sig_col: str,
                      max_hamming: int = 3,
                      num_buckets: int | None = None,
                      max_group: int | None = None) -> rd.Dataset:
    """Near-dup pairs under a HAMMING-distance bound over any 64-bit
    signature column (SimHash, perceptual image ahash, …): pigeonhole
    banding — split the 64 bits into ``max_hamming + 1`` equal bands, so
    two signatures within the bound agree EXACTLY on ≥1 band — then an
    exchange on (band, band_value) buckets, in-bucket candidate pairing,
    exact popcount verify, and a bucketed distinct to collapse pairs
    that matched in several bands. Returns (id_a, id_b, hamming) with
    id_a < id_b.

    Scale shape: only (id, sig, band rows) shuffle — 4 narrow rows per
    input row at the default bound; no all-pairs anywhere. Same family
    as minhash banding (ngram_jaccard_pairs) with bit-bands instead of
    shingle bands. Candidate pairing is O(group²) per exact band value —
    ``max_group`` (optional) skips band groups larger than that, the
    same stop-key pruning as ngram_jaccard's ``max_df`` (documented
    approximation for degenerate corpora where one band value covers a
    large fraction of rows; default None is exact)."""
    from .relational import adaptive_bucket_count

    nb = num_buckets or adaptive_bucket_count(None)
    n_bands = max_hamming + 1
    if 64 % n_bands:
        band_bits = [64 // n_bands + (1 if i < 64 % n_bands else 0)
                     for i in range(n_bands)]
    else:
        band_bits = [64 // n_bands] * n_bands
    shifts = np.cumsum([0] + band_bits[:-1]).astype(np.uint64)
    masks = np.array([(1 << b) - 1 for b in band_bits], np.uint64)

    def explode(t: pa.Table) -> pa.Table:
        sig = t[sig_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(sig)
        band_id = np.tile(np.arange(n_bands, dtype=np.int64), n)
        sigs = np.repeat(sig, n_bands)
        vals = (sigs >> shifts[band_id % n_bands]) & masks[band_id % n_bands]
        ids = t[id_col].take(pa.array(np.repeat(np.arange(n), n_bands),
                                      pa.int64()))
        key = (vals * np.uint64(n_bands) + band_id.astype(np.uint64))
        b = ((key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) \
            % np.uint64(nb)
        return pa.table({
            id_col: ids,
            "sig": pa.array(sigs.astype(np.int64), pa.int64()),
            "__k": pa.array(key.astype(np.int64), pa.int64()),
            "__b": pa.array(b.astype(np.int32), pa.int32()),
        })

    rows = ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # singleton band values can never pair — drop them vectorized,
        # then emit every intra-group candidate with a self-merge on the
        # band key and verify ALL candidates in one popcount pass (no
        # per-group Python loop — see minhash pairs_in_bucket)
        g = g[g.duplicated("__k", keep=False)]
        if max_group is not None and len(g):
            sz = g.groupby("__k")["__k"].transform("size")
            g = g[sz.to_numpy() <= max_group]  # stop-key pruning
        # id-dtype-preserving empty frame (same convention as
        # ngram_jaccard_pairs' _empty): float64 placeholders would
        # clash with int/string id blocks at schema unification
        empty_ids = g[id_col].iloc[:0]
        empty = pd.DataFrame({"id_a": empty_ids, "id_b": empty_ids,
                              "hamming": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        cols = ["__k", id_col, "sig"]
        m = g[cols].merge(g[cols], on="__k", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if not len(m):
            return empty
        x = (m["sig_a"].to_numpy().astype(np.uint64)
             ^ m["sig_b"].to_numpy().astype(np.uint64))
        h = np.zeros(len(x), np.int64)
        while True:
            nz = x != 0
            if not nz.any():
                break
            h[nz] += 1
            x = x & (x - np.uint64(1))
        ok = h <= max_hamming
        if not ok.any():
            return empty
        return pd.DataFrame({
            "id_a": m[f"{id_col}_a"].to_numpy()[ok],
            "id_b": m[f"{id_col}_b"].to_numpy()[ok],
            "hamming": h[ok]})

    cand = rows.groupby("__b").map_groups(pairs_in_bucket,
                                          batch_format="pandas")
    # a pair close in several bands emits once per matching band
    return _distinct_rows_bucketed(cand, ["id_a", "id_b", "hamming"],
                                   num_buckets=nb)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def _empty_pairs(ds: rd.Dataset, id_col: str) -> rd.Dataset:
    """Empty pair result whose id columns keep the INPUT id type (a
    hardcoded int64 would diverge from the non-empty case for string ids)."""
    id_type = pa.int64()
    try:
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        if base is not None and hasattr(base, "field"):
            id_type = base.field(id_col).type
        else:
            id_type = dict(zip(sch.names, sch.types))[id_col]
    except Exception:
        pass
    return rd.from_arrow(pa.table({
        "id_a": pa.array([], id_type), "id_b": pa.array([], id_type),
        "cosine": pa.array([], pa.float64())}))


def _ids_and_matrix(tbl: pa.Table, id_col: str, vec_col: str):
    from .similarity import vecs_from_arrow

    ids = np.asarray(tbl[id_col].to_pylist())
    # flat Arrow buffer → (n, dim), no per-row Python list materialization
    m = vecs_from_arrow(tbl[vec_col])
    # out-of-place: m may be a read-only view over the object-store buffer
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return ids, m


def _cosine_pairs(ids_a, m_a, ids_b, m_b, threshold: float) -> pa.Table:
    """All (id_a < id_b) pairs between two normalized matrices with cosine
    >= threshold — one matmul, no Python loop over rows."""
    sims = m_a @ m_b.T
    ai, bi = np.nonzero(sims >= threshold)
    pa_ids, pb_ids = ids_a[ai], ids_b[bi]
    keep = pa_ids < pb_ids  # canonical order + drop self-pairs
    return pa.table({
        "id_a": pa.array(pa_ids[keep]), "id_b": pa.array(pb_ids[keep]),
        "cosine": pa.array(round_np(sims[ai, bi][keep], 6)),
    })


@ray.remote
def _block_pair_task(blocks_a: list, blocks_b: list, id_col: str,
                     vec_col: str, threshold: float, same: bool) -> pa.Table:
    # block refs arrive nested in lists (Ray resolves only top-level args),
    # so each task pulls exactly its two chunks from the object store
    a = pa.concat_tables(ray.get(list(blocks_a)))

    def _empty(id_type) -> pa.Table:
        return pa.table({"id_a": pa.array([], id_type),
                         "id_b": pa.array([], id_type),
                         "cosine": pa.array([], pa.float64())})

    if a.num_rows == 0:  # np.stack chokes on zero rows
        return _empty(a.schema.field(id_col).type)
    ids_a, m_a = _ids_and_matrix(a, id_col, vec_col)
    if same:
        ids_b, m_b = ids_a, m_a
    else:
        b = pa.concat_tables(ray.get(list(blocks_b)))
        if b.num_rows == 0:
            return _empty(a.schema.field(id_col).type)
        ids_b, m_b = _ids_and_matrix(b, id_col, vec_col)
    out = _cosine_pairs(ids_a, m_a, ids_b, m_b, threshold)
    if not same:
        # the task only sees (group_i, group_j) with i < j; the reverse-order
        # pairs (id in j-group < id in i-group) must come from the same task
        rev = _cosine_pairs(ids_b, m_b, ids_a, m_a, threshold)
        out = pa.concat_tables([out, rev])
    return out


def exact_cosine_pairs(ds: rd.Dataset, id_col: str, vec_col: str,
                       threshold: float, max_groups: int = 16) -> rd.Dataset:
    """EXACT all-pairs cosine >= threshold, distributed: the corpus's Arrow
    block refs are grouped into <= max_groups chunks, and one Ray task per
    (group_i <= group_j) pulls just its two chunks from the object store and
    matmuls them — the driver holds only refs and the (small) pair results,
    never the vector matrix. O(N^2) flops is inherent to exactness; this
    path is for bounded corpora (or low thresholds where LSH recall dies) —
    ``lsh_cosine_pairs`` is the 10^12-scale path for true near-dup
    thresholds."""
    refs = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    if not refs:
        return _empty_pairs(ds, id_col)
    g = min(max_groups, len(refs))
    groups = [refs[i::g] for i in range(g)]
    out_refs = []
    for i in range(g):
        for j in range(i, g):
            out_refs.append(_block_pair_task.remote(
                groups[i], groups[j] if j != i else [], id_col, vec_col,
                threshold, same=(i == j)))
    return rd.from_arrow_refs(out_refs)


def lsh_cosine_pairs(ds: rd.Dataset, id_col: str, vec_col: str,
                     threshold: float = 0.9, n_bits: int = 8,
                     n_tables: int = 4, seed: int = 13) -> rd.Dataset:
    """Scale path: multi-table sign-LSH bucketed candidates → in-bucket
    exact-cosine verify. Rows replicate n_tables× into (bucket, id, vec)
    rows, hash-partition by bucket (groupby — never all-pairs), each bucket
    matmuls only its own members, and duplicate pairs from multiple tables
    collapse in a final tiny pair-level groupby. Approximate by design
    (recall tested vs the exact path); only sound for high thresholds —
    at cosine 0.9 a pair disagrees on a hyperplane with p≈0.14, so with
    hamming-0 buckets over n_bits=8 × 4 tables the per-pair miss rate is
    ~(1-0.86^8)^4 ≈ 4%; raise n_tables for tighter recall."""
    from .similarity import SignLSHIndex, _normalize

    sample = ds.take(1)
    if not sample:  # empty corpus → empty pairs, same schema as non-empty
        return _empty_pairs(ds, id_col)
    dim = len(sample[0][vec_col])
    indexes = [SignLSHIndex(dim, n_bits, seed + 101 * t) for t in range(n_tables)]
    ref = ray.put(indexes)

    def to_bucket_rows(t: pa.Table) -> pa.Table:
        idxs = ray.get(ref)
        m = _normalize(np.stack(t[vec_col].to_pylist()).astype(np.float64))
        parts = []
        for ti, idx in enumerate(idxs):
            b = idx.buckets(m) + (ti << n_bits)
            parts.append(pa.table({
                "__bucket": pa.array(b, pa.int64()),
                id_col: t[id_col],
                vec_col: t[vec_col],
            }))
        return pa.concat_tables(parts)

    bucketed = ds.map_batches(to_bucket_rows, batch_format="pyarrow",
                              zero_copy_batch=True)

    def in_bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return pa.table({"id_a": pa.array([], g[id_col].type),
                             "id_b": pa.array([], g[id_col].type),
                             "cosine": pa.array([], pa.float64())})
        ids, m = _ids_and_matrix(g, id_col, vec_col)
        return _cosine_pairs(ids, m, ids, m, threshold)

    pairs = bucketed.groupby("__bucket").map_groups(
        in_bucket_pairs, batch_format="pyarrow")
    # same pair can fire in multiple tables → collapse (bucketed distinct,
    # never one Ray group per pair)
    return _distinct_rows_bucketed(pairs, ["id_a", "id_b"])


def embedding_near_dup_pairs(ds: rd.Dataset, id_col: str, vec_col: str,
                             threshold: float = 0.95, method: str = "auto",
                             n_rows: int | None = None,
                             exact_gate: int = 200_000) -> rd.Dataset:
    """Pairs of vectors with cosine >= threshold.

    method:
      - "exact": distributed block-pair matmul (exact_cosine_pairs) — right
        for bounded corpora and for low thresholds;
      - "lsh":   sign-LSH bucketed candidates + verify (lsh_cosine_pairs) —
        the 10^12-doc path for true near-dup thresholds (>= ~0.8);
      - "auto":  exact when the corpus is known-small (n_rows <= exact_gate)
        or the threshold is too low for LSH recall, else lsh. Pass n_rows
        when known (a ds.count() on a lazy pipeline would re-execute it)."""
    if method == "auto":
        if n_rows is None:
            try:
                n_rows = ds.count()  # metadata-cheap on fresh parquet reads
            except Exception:
                n_rows = None
        small = n_rows is not None and n_rows <= exact_gate
        method = "exact" if (small or threshold < 0.8) else "lsh"
    if method == "exact":
        return exact_cosine_pairs(ds, id_col, vec_col, threshold)
    return lsh_cosine_pairs(ds, id_col, vec_col, threshold)


# ---------------------------------------------------------------------------
# cross-document segment (paragraph/line) dedup — CCNet/RefinedWeb shape
# ---------------------------------------------------------------------------

def segment_dedup(ds: rd.Dataset, id_col: str, text_col: str, *,
                  seg_words: int = 10, sep: str | None = None,
                  n_rows: int | None = None,
                  num_buckets: int | None = None) -> rd.Dataset:
    """Sub-document dedup: remove every segment whose text appears
    elsewhere in the CORPUS, keeping only the globally-first occurrence
    (min (doc, seg_idx)), then reassemble each document from its kept
    segments in order — the CCNet/RefinedWeb paragraph-dedup shape, which
    strips boilerplate (headers, nav text, license blocks) that exact or
    near dedup at document granularity can never see.

    ``sep`` splits on a separator (production: newline paragraphs);
    ``seg_words`` (default) uses fixed word windows — the deterministic
    stand-in here because the synthetic corpus is newline-free.

    Two exchanges, both on bucket keys with bounded distinct values:
      1. by segment-hash bucket — every occurrence of a segment lands in
         one bucket, so keep-first is decided locally with content
         equality guarding 64-bit hash collisions;
      2. by doc-hash bucket — each document's marked segments reassemble
         vectorized inside the bucket (never one Ray group per doc).
    Only segment text + ids shuffle; stats (n_kept / n_removed) ride out
    with each rebuilt doc."""
    from .relational import adaptive_bucket_count

    if num_buckets is None:
        num_buckets = adaptive_bucket_count(n_rows)

    def explode(t: pa.Table) -> pa.Table:
        # Arrow end-to-end: the full text NEVER round-trips through Python
        # or pandas objects — segments are built as a ListArray window view
        # over the flat token array and joined with one binary_join kernel.
        # Null-text docs emit no segments, hence no output row — the same
        # semantics as the SQL oracle's join over exploded words.
        tt = t.filter(pc.is_valid(t[text_col]))
        ids = tt[id_col].combine_chunks()
        texts = pc.cast(tt[text_col], pa.string())
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if sep is not None:
            lists = pc.split_pattern(texts, sep)
            segs = lists.flatten()
            counts = np.diff(lists.offsets.to_numpy())
            win_row = np.repeat(np.arange(len(counts)), counts)
            seg_idx = (np.arange(len(win_row))
                       - np.repeat(np.cumsum(counts) - counts, counts))
        else:
            toks = pc.split_pattern(texts, " ")
            flat = toks.flatten()
            cnt = np.diff(toks.offsets.to_numpy())
            nwin = -(-cnt // seg_words)  # ceil; "" splits to [""] so ≥1
            row_starts = np.zeros(len(cnt) + 1, np.int64)
            np.cumsum(cnt, out=row_starts[1:])
            win_row = np.repeat(np.arange(len(cnt)), nwin)
            seg_idx = (np.arange(len(win_row))
                       - np.repeat(np.cumsum(nwin) - nwin, nwin))
            starts = row_starts[win_row] + seg_idx * seg_words
            offsets = np.append(starts, row_starts[-1])
            la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                          flat)
            segs = pc.binary_join(la, " ")
        h = (hash64(segs) if len(segs)
             else np.array([], np.uint64))
        b = (h % np.uint64(num_buckets)).astype(np.int32)
        # explicit id type: an empty / all-null-text block must not emit a
        # null-typed id column that clashes with other blocks' schema
        return pa.table({
            id_col: (ids.take(pa.array(win_row, pa.int64()))
                     if len(win_row) else pa.array([], ids.type)),
            "seg_idx": pa.array(seg_idx.astype(np.int64), pa.int64()),
            "seg": pc.cast(segs, pa.string()),
            "__sb": pa.array(b, pa.int32()),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)

    def mark(g: pa.Table) -> pa.Table:
        # all occurrences of a segment are in this bucket → sorting by
        # (doc, position) makes first-appearance the GLOBAL keep-first;
        # dictionary_encode dedups on the segment text itself, not its
        # hash (collision-safe), with the strings staying in Arrow
        g = g.drop_columns(["__sb"])
        order = pc.sort_indices(
            pa.table({"a": g[id_col], "b": g["seg_idx"]}),
            sort_keys=[("a", "ascending"), ("b", "ascending")])
        g = g.take(order)
        seg = g["seg"]
        if isinstance(seg, pa.ChunkedArray):
            seg = seg.combine_chunks()  # encode ONE array: one dictionary
        codes = pc.dictionary_encode(seg).indices \
            .to_numpy(zero_copy_only=False)
        kept = np.zeros(len(codes), bool)
        kept[np.unique(codes, return_index=True)[1]] = True
        return g.append_column("kept", pa.array(kept))

    marked = exploded.groupby("__sb").map_groups(mark,
                                                 batch_format="pyarrow")

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        b = (hash64(t[id_col]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__db", pa.array(b, pa.int32()))

    rebucketed = marked.map_batches(add_doc_bucket, batch_format="pyarrow",
                                    zero_copy_batch=True)
    # rejoin with the same delimiter the text was split on (word-window
    # mode splits on spaces, so " " is also the faithful joiner there)
    joiner = sep if sep is not None else " "

    def rebuild(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__db"])
        order = pc.sort_indices(
            pa.table({"a": g[id_col], "b": g["seg_idx"]}),
            sort_keys=[("a", "ascending"), ("b", "ascending")])
        g = g.take(order)
        # doc boundaries: dictionary codes are first-appearance-ordered,
        # and rows are doc-sorted, so codes are non-decreasing per doc
        idc = g[id_col]
        if isinstance(idc, pa.ChunkedArray):
            idc = idc.combine_chunks()
        enc = pc.dictionary_encode(idc)
        doc_of = enc.indices.to_numpy(zero_copy_only=False)
        doc_ids = enc.dictionary
        n_docs = len(doc_ids)
        kept = g["kept"].to_numpy(zero_copy_only=False).astype(bool)
        n_kept = np.bincount(doc_of[kept], minlength=n_docs)
        n_removed = np.bincount(doc_of[~kept], minlength=n_docs)
        # kept segments per doc as a ListArray window over the sorted
        # kept slice, joined in one kernel — text never leaves Arrow
        kept_rows = np.flatnonzero(kept)
        segs_kept = g["seg"].take(pa.array(kept_rows, pa.int64()))
        if isinstance(segs_kept, pa.ChunkedArray):
            segs_kept = segs_kept.combine_chunks()
        offsets = np.zeros(n_docs + 1, np.int64)
        np.cumsum(np.bincount(doc_of[kept], minlength=n_docs),
                  out=offsets[1:])
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                      segs_kept)
        clean = pc.fill_null(pc.binary_join(la, joiner), "")
        return pa.table({
            id_col: doc_ids,
            "clean_text": pc.cast(clean, pa.string()),
            "n_kept": pa.array(n_kept.astype(np.int64), pa.int64()),
            "n_removed": pa.array(n_removed.astype(np.int64), pa.int64()),
        })

    return rebucketed.groupby("__db").map_groups(rebuild,
                                                 batch_format="pyarrow")


def remove_dup_spans(ds: rd.Dataset, id_col: str = "doc_id",
                     text_col: str = "text", *, n: int = 3,
                     n_rows: int | None = None,
                     num_buckets: int | None = None) -> rd.Dataset:
    """ExactSubstr-style duplicated-SPAN removal (the action form of
    ``textops.corpus_dup_ngram_coverage``, which only measures): every
    OVERLAPPING word ``n``-gram that occurs more than once anywhere in
    the corpus is removed from all occurrences except the globally-first
    one (min ``(doc_id, position)``), overlapping removal windows merge,
    and each document is reassembled from its surviving tokens in order.
    Output: ``(id_col, clean_text, n_tokens, n_removed)`` — one row per
    non-null-text document, untouched docs included with n_removed = 0.

    This is the fixed-length stand-in for suffix-array substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better") and differs from ``segment_dedup`` exactly where it matters:
    windows are stride-1 (a recycled span at ANY token offset is caught,
    not just one aligned to a segment boundary) and removals are merged
    per-position rather than per-segment.

    Scale shape (same contract as segment_dedup):
      1. explode stride-1 window rows — gram strings built with ONE
         binary_join_element_wise over n zero-copy slices of the flat
         token array (no Python loop, no per-row work);
      2. exchange on gram-hash bucket: every occurrence of a gram lands
         in one bucket, so "duplicated" and "globally first" are decided
         locally, with the STRING compared (hash collisions can't merge
         distinct grams). Only removal rows (id, window start) leave;
      3. exchange on doc-hash bucket: removal rows union with the doc
         text, the keep-mask and the rebuilt string are computed
         vectorized per bucket (never one Ray group per document).
    The gram exchange ships ~n× the corpus bytes (each token appears in
    ≤ n gram strings) — the price of collision-proof string equality;
    at 100 TB, shard the corpus and run per shard, or accept 64-bit
    keys and drop the string column (documented trade, not default)."""
    from .relational import adaptive_bucket_count

    if n < 2:
        raise ValueError("remove_dup_spans requires n >= 2")
    nb = num_buckets if num_buckets is not None \
        else adaptive_bucket_count(n_rows)

    def _flat_tokens(t: pa.Table):
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.cast(texts, pa.string())
        lists = pc.split_pattern(texts, " ")
        offs = lists.offsets.to_numpy()
        return lists.flatten(), offs

    def explode(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.is_valid(t[text_col]))
        ids = tt[id_col].combine_chunks() if tt.num_rows else tt[id_col]
        flat, offs = _flat_tokens(tt)
        cnt = np.diff(offs)
        row_of = np.repeat(np.arange(len(cnt)), cnt)
        T = len(flat)
        if T >= n:
            grams = pc.binary_join_element_wise(
                *[flat.slice(j, T - n + 1) for j in range(n)], " ")
            valid = row_of[: T - n + 1] == row_of[n - 1:]
            k = np.flatnonzero(valid)          # global window-start index
            rows = row_of[k]
            i_pos = k - offs[rows]             # 0-based start within doc
            grams = grams.filter(pa.array(valid))
            out_ids = ids.take(pa.array(rows, pa.int64()))
        else:
            i_pos = np.array([], np.int64)
            grams = pa.array([], pa.string())
            out_ids = pa.array([], ids.type if tt.num_rows
                               else tt.schema.field(id_col).type)
        b = ((hash64(grams) if len(grams) else np.array([], np.uint64))
             % np.uint64(nb)).astype(np.int32)
        return pa.table({
            id_col: out_ids,
            "i": pa.array(i_pos.astype(np.int64), pa.int64()),
            "g": grams,
            "__gb": pa.array(b, pa.int32()),
        })

    windows = ds.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True)

    def mark_removals(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g.duplicated("g", keep=False)]
        if len(d):
            # sorted by (gram, doc, pos): the first row of each gram run
            # is the GLOBAL first occurrence — every other row is removed
            d = d.sort_values(["g", id_col, "i"], kind="mergesort")
            d = d.loc[d.duplicated("g", keep="first")]
        return d[[id_col, "i"]]

    removals = windows.groupby("__gb").map_groups(mark_removals,
                                                  batch_format="pandas")

    def _doc_bucket(ids) -> pa.Array:
        return pa.array((hash64(ids) % np.uint64(nb)).astype(np.int32),
                        pa.int32())

    def pad_docs(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.is_valid(t[text_col]))
        return pa.table({
            id_col: tt[id_col],
            "i": pa.nulls(tt.num_rows, pa.int64()),
            text_col: pc.cast(tt[text_col], pa.string()),
            "__side": pa.array(np.zeros(tt.num_rows, np.int8)),
            "__db": _doc_bucket(tt[id_col]),
        })

    def pad_removals(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "i": pc.cast(t["i"], pa.int64()),
            text_col: pa.nulls(t.num_rows, pa.string()),
            "__side": pa.array(np.ones(t.num_rows, np.int8)),
            "__db": _doc_bucket(t[id_col]),
        })

    docs_side = ds.map_batches(pad_docs, batch_format="pyarrow",
                               zero_copy_batch=True)
    rem_side = removals.map_batches(pad_removals, batch_format="pyarrow",
                                    zero_copy_batch=True)
    unioned = docs_side.union(rem_side)

    def rebuild(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        docs = g.filter(pa.array(side == 0))
        rem = g.filter(pa.array(side == 1))
        flat, offs = _flat_tokens(docs)
        cnt = np.diff(offs)
        n_docs = len(cnt)
        row_of = np.repeat(np.arange(n_docs), cnt)
        keep = np.ones(len(flat), bool)
        if rem.num_rows:
            doc_ids = docs[id_col]
            if isinstance(doc_ids, pa.ChunkedArray):
                doc_ids = doc_ids.combine_chunks()
            rrow = pc.index_in(rem[id_col], value_set=doc_ids) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            # explicit int cast: the union's nullable padding can route a
            # block through pandas, where docs-side NaNs make `i` float64
            start = offs[rrow] + rem["i"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            covered = (np.repeat(start, n)
                       + np.tile(np.arange(n, dtype=np.int64), len(start)))
            keep[covered] = False
        kept_cnt = (np.bincount(row_of[keep], minlength=n_docs)
                    if len(flat) else np.zeros(n_docs, np.int64))
        kept_flat = flat.filter(pa.array(keep))
        offsets = np.zeros(n_docs + 1, np.int64)
        np.cumsum(kept_cnt, out=offsets[1:])
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                      kept_flat)
        clean = pc.fill_null(pc.binary_join(la, " "), "")
        return pa.table({
            id_col: docs[id_col],
            "clean_text": pc.cast(clean, pa.string()),
            "n_tokens": pa.array(cnt.astype(np.int64), pa.int64()),
            "n_removed": pa.array((cnt - kept_cnt).astype(np.int64),
                                  pa.int64()),
        })

    return unioned.groupby("__db").map_groups(rebuild,
                                              batch_format="pyarrow")


# ---------------------------------------------------------------------------
# duplicate-group connected components
# ---------------------------------------------------------------------------

def _driver_components(edges: pa.Table) -> pa.Table:
    """Exact min-label components on the driver for SMALL pair tables:
    np.unique gives sorted vertex codes (code order ≡ id order, so min
    code ≡ min id — works for ints and strings alike), then vectorized
    min-label propagation with pointer jumping (labels[labels]) converges
    in O(log diameter) O(E) numpy rounds. Semantics identical to the
    distributed loop."""
    a = edges["src"].to_numpy(zero_copy_only=False)
    b = edges["dst"].to_numpy(zero_copy_only=False)
    uniq, codes = np.unique(np.concatenate([a, b]), return_inverse=True)
    ca, cb = codes[: len(a)], codes[len(a):]
    labels = np.arange(len(uniq), dtype=np.int64)
    for _ in range(64):
        m = np.minimum(labels[ca], labels[cb])
        new = labels.copy()
        np.minimum.at(new, ca, m)
        np.minimum.at(new, cb, m)
        new = new[new]  # pointer jumping
        if np.array_equal(new, labels):
            break
        labels = new
    return pa.table({"id": pa.array(uniq), "component": pa.array(uniq[labels])})


def dup_components(pairs: rd.Dataset, id_a: str = "id_a",
                   id_b: str = "id_b", max_iters: int = 50,
                   driver_edge_limit: int = 2_000_000) -> rd.Dataset:
    """Connected components over a near-dup pair table → (id, component)
    with component = the MIN id reachable through any chain of pairs. This
    is the step that turns pairwise near-dup evidence (MinHash/Jaccard/
    cosine pairs) into duplicate GROUPS so a curation pass can keep one
    representative per group even when A~B and B~C but A!~C.

    Distributed min-label propagation: labels start as own-id; each round
    every vertex takes the min of its label and its neighbors' labels
    (edges ⋈ labels on src, then a min-groupby on dst). Rounds needed =
    graph diameter — small for dup clusters (near-cliques); the
    large-star/small-star variant (Kiveris et al., "Connected Components
    in MapReduce") is the published accelerator if ever needed. Only the
    dup-graph vertices participate (pairs table ≪ corpus), labels are
    2-int rows, and each round is one hash join + one shuffle groupby —
    no payload data moves. Convergence is detected exactly: the old label
    rides through the min-groupby as a second aggregate, so "changed this
    round" is a count on the new label table (no extra join).

    Mode gate (same convention as grouped_agg): the pair table is tiny
    relative to the corpus — when its symmetric edge count is ≤
    ``driver_edge_limit`` (2-int rows; 2 M ≈ 32 MB) the whole graph fits
    the driver and a vectorized union-find there replaces ~diameter
    distributed rounds of pure fixed cost (measured: 6.6 s → <0.1 s on a
    477-vertex graph, where EVERY round was exchange latency, not
    compute). Above the gate the distributed loop runs unchanged."""
    from .relational import drop_empty_blocks, grouped_agg, hash_join

    def symmetric(t: pa.Table) -> pa.Table:
        a = t[id_a].combine_chunks()
        b = t[id_b].combine_chunks()
        return pa.table({
            "src": pa.chunked_array([a, b]).combine_chunks(),
            "dst": pa.chunked_array([b, a]).combine_chunks(),
        })

    edges = pairs.map_batches(symmetric, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        empty = pa.table({"id": pa.array([], pa.int64()),
                          "component": pa.array([], pa.int64())})
        return rd.from_arrow(empty)
    if n_edges <= driver_edge_limit:
        tab = pa.concat_tables(
            pa.table(b) for b in edges.iter_batches(batch_format="pyarrow"))
        return rd.from_arrow(_driver_components(tab))
    # join fan-out sized by the data, not the cluster: a 32-way exchange
    # on a few hundred label rows is pure fixed cost per round
    import ray as _ray
    cpus = int(_ray.cluster_resources().get("CPU", 8))
    n_parts = max(2, min(cpus, n_edges // 250_000 + 1))

    # drop_empty_blocks after every shuffle agg: its empty-SCHEMA blocks
    # poison the next round's join (see relational.drop_empty_blocks).
    # Initial labels fold round 1 in for free: min(own, neighbors) needs
    # only the edge table itself (id=src with comp∈{src, dst}) — one
    # exchange instead of a join+exchange, and pair-only components (the
    # common near-dup case) converge before the loop's first iteration.
    def init_cand(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks()
        d = t["dst"].combine_chunks()
        return pa.table({
            "id": pa.chunked_array([s, s]).combine_chunks(),
            "comp": pa.chunked_array([s, d]).combine_chunks(),
        })

    labels = grouped_agg(
        edges.map_batches(init_cand, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["id"], [("comp", "min", "component")], mode="bucket")
    labels = drop_empty_blocks(labels)

    for _ in range(max_iters):
        # neighbor candidates: (dst, neighbor_label)
        nbr = hash_join(edges,
                        labels.rename_columns({"id": "src",
                                               "component": "nbr_comp"}),
                        on=["src"], num_partitions=n_parts)
        nbr = nbr.select_columns(["dst", "nbr_comp"]).rename_columns(
            {"dst": "id", "nbr_comp": "comp"})

        def tag_old(t: pa.Table) -> pa.Table:
            return pa.table({"id": t["id"], "comp": t["component"],
                             "old": t["component"]})

        def tag_new(t: pa.Table) -> pa.Table:
            null_old = pa.nulls(t.num_rows, t["comp"].type)
            return pa.table({"id": t["id"], "comp": t["comp"],
                             "old": null_old})

        cand = labels.map_batches(tag_old, batch_format="pyarrow").union(
            nbr.map_batches(tag_new, batch_format="pyarrow"))
        # min(old) is the previous label (each id has exactly one old row;
        # nulls are ignored by min) — rides along to detect changes without
        # a second join.
        # materialize each round: the convergence count and the next
        # round's join otherwise both re-execute the ENTIRE lineage back
        # to round 1 (Ray Datasets are lazy — measured quadratic blowup)
        new = drop_empty_blocks(grouped_agg(cand, ["id"],
                                            [("comp", "min", "component"),
                                             ("old", "min", "old")],
                                            mode="bucket")).materialize()
        from .relational import filter_batches
        changed = filter_batches(new, lambda t: pc.not_equal(
            t["component"], t["old"])).count()
        labels = drop_empty_blocks(new.select_columns(["id", "component"]))
        if changed == 0:
            break

    return labels


# ---------------------------------------------------------------------------
# incremental n-gram Jaccard: persisted shingle index + new-docs-only pairs
# ---------------------------------------------------------------------------

_INDEX_META = "_index_meta.json"
# Shingle-key scheme identifier. Bump whenever _shingle_hashes changes the
# VALUES it produces (e.g. the string→rolling-token-key move): a persisted
# index built under another scheme cannot be merged with new rows.
_SHINGLE_SCHEME = "rolling-token-v2"


def _check_index_scheme(meta: dict, index_dir) -> None:
    got = meta.get("scheme", "string-v1")
    if got != _SHINGLE_SCHEME:
        raise ValueError(
            f"shingle index at {index_dir} was built with scheme '{got}' "
            f"but this build produces '{_SHINGLE_SCHEME}' — rebuild the "
            f"index (build_shingle_index) before appending/querying")


def _explode_shingle_rows(ds: rd.Dataset, id_col: str, text_col: str,
                          n: int, num_buckets: int,
                          stable: bool) -> rd.Dataset:
    """(shingle, doc, sz, __b) rows — the inverted-index representation
    shared by the batch and incremental Jaccard paths. ``stable=True``
    hashes shingles with stable_hash64 (required when rows are persisted:
    the index outlives the process and must merge with rows hashed by a
    future build)."""
    hasher = stable_hash64 if stable else hash64

    def explode(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        sh = _shingle_hashes(texts, n, hasher)
        counts = np.array([len(a) for a in sh], np.int64)
        flat = (np.concatenate(sh) if len(sh) else np.array([], np.uint64))
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), counts)
        sizes = np.repeat(counts, counts)
        b = (flat % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            "shingle": pa.array(flat.astype(np.int64), pa.int64()),
            "doc": pa.array(ids),
            "sz": pa.array(sizes.astype(np.int32), pa.int32()),
            "__b": pa.array(b, pa.int32()),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


def build_shingle_index(ds: rd.Dataset, id_col: str, text_col: str,
                        out_dir: str, *, n: int = 3,
                        n_rows: int | None = None,
                        num_buckets: int | None = None) -> dict:
    """Persist the inverted shingle index of a committed corpus as
    hive-partitioned parquet (``out_dir/__b=i/``) so later batches can
    near-dup against it WITHOUT re-reading or re-shingling the corpus.
    The bucket is ``stable_hash64(shingle) % num_buckets`` — pinned hash,
    layout survives library upgrades (same contract as
    bucketing.write_bucketed)."""
    import json
    from pathlib import Path

    from .relational import adaptive_bucket_count

    if num_buckets is None:
        num_buckets = adaptive_bucket_count(n_rows)
    rows = _explode_shingle_rows(ds, id_col, text_col, n, num_buckets,
                                 stable=True)
    rows.write_parquet(str(out_dir), partition_cols=["__b"])
    meta = {"num_buckets": num_buckets, "n": n, "scheme": _SHINGLE_SCHEME}
    Path(out_dir, _INDEX_META).write_text(json.dumps(meta))
    return meta


def append_to_shingle_index(new_ds: rd.Dataset, index_dir: str,
                            id_col: str, text_col: str) -> dict:
    """Commit an accepted batch into an existing shingle index: explode
    with the index's own (n, num_buckets) from its meta and write into
    the same bucket dirs (Ray names parquet files uniquely per job, so
    appends never clobber). After this, the batch is 'old' for every
    subsequent ngram_jaccard_pairs_incremental call."""
    import json
    from pathlib import Path

    meta = json.loads(Path(index_dir, _INDEX_META).read_text())
    _check_index_scheme(meta, index_dir)
    rows = _explode_shingle_rows(new_ds, id_col, text_col, meta["n"],
                                 meta["num_buckets"], stable=True)
    rows.write_parquet(str(index_dir), partition_cols=["__b"])
    return meta


def ngram_jaccard_pairs_incremental(new_ds: rd.Dataset, index_dir: str,
                                    id_col: str, text_col: str, *,
                                    threshold: float = 0.8) -> rd.Dataset:
    """EXACT Jaccard near-dup pairs that involve AT LEAST ONE new doc:
    new-vs-indexed and new-vs-new, without touching indexed-vs-indexed
    pairs (already known) and without re-shingling the committed corpus.

    This is the production incremental-curation shape: each arriving batch
    shingles itself, then reads ONLY the index bucket directories its own
    shingles hash into (partition pruning — untouched buckets cost
    nothing), merges within buckets, and keeps pairs flagged with a new
    side. New ids must be disjoint from indexed ids (same contract as any
    append-only index). After acceptance, append the batch to the index
    with build_shingle_index semantics (write the same exploded rows into
    the same bucket dirs)."""
    import json
    from pathlib import Path

    meta = json.loads(Path(index_dir, _INDEX_META).read_text())
    _check_index_scheme(meta, index_dir)
    num_buckets, n = meta["num_buckets"], meta["n"]

    new_rows = _explode_shingle_rows(new_ds, id_col, text_col, n,
                                     num_buckets, stable=True)
    new_rows = new_rows.map_batches(
        lambda t: t.append_column(
            "is_new", pa.array(np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    touched = sorted(new_rows.unique("__b"))
    # explicit file list: ONLY the touched bucket dirs are ever opened
    files = [str(f) for b in touched
             for f in sorted(Path(index_dir, f"__b={b}").glob("*.parquet"))]

    if files:
        old = rd.read_parquet(files)

        def tag_old(t: pa.Table) -> pa.Table:
            # __b is encoded in the hive path, not the row files —
            # re-derive it from the shingle (same pinned hash)
            b = (t["shingle"].to_numpy(zero_copy_only=False)
                 .astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
            return pa.table({
                "shingle": t["shingle"], "doc": t["doc"], "sz": t["sz"],
                "__b": pa.array(b, pa.int32()),
                "is_new": pa.array(np.zeros(t.num_rows, np.int8)),
            })

        rows = old.map_batches(tag_old, batch_format="pyarrow",
                               zero_copy_batch=True).union(new_rows)
    else:
        rows = new_rows

    def _empty(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id_a": g["doc"].iloc[:0],
                             "id_b": g["doc"].iloc[:0],
                             "sz_a": g["sz"].iloc[:0],
                             "sz_b": g["sz"].iloc[:0]})

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated("shingle", keep=False)]
        if not len(g):
            return _empty(g)
        cols = ["shingle", "doc", "sz", "is_new"]
        m = g[cols].merge(g[cols], on="shingle", suffixes=("_a", "_b"))
        m = m[(m["doc_a"] < m["doc_b"])
              & ((m["is_new_a"] == 1) | (m["is_new_b"] == 1))]
        if not len(m):
            return _empty(g)
        return (m[["doc_a", "doc_b", "sz_a", "sz_b"]]
                .rename(columns={"doc_a": "id_a", "doc_b": "id_b"}))

    pairs = rows.groupby("__b").map_groups(emit_pairs,
                                           batch_format="pandas")
    return _reduce_pairs_to_jaccard(pairs, threshold, num_buckets)


# ---------------------------------------------------------------------------
# edit-distance near-dup (deletion-neighborhood / SymSpell banding)
# ---------------------------------------------------------------------------

def _lev_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 in O(len) with no DP table: equal, one
    substitution (same length, exactly one mismatched position), or one
    indel (length diff 1, shorter is longer with one char dropped)."""
    la, lb = len(a), len(b)
    if a == b:
        return True
    if abs(la - lb) > 1:
        return False
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is shorter by one: walk to first mismatch, then suffixes must match
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit_distance_pairs(ds: rd.Dataset, id_col: str, key_col: str,
                        num_buckets: int | None = None) -> rd.Dataset:
    """All unordered pairs whose SHORT key strings are within Levenshtein
    distance 1, computed distributed with NO all-pairs comparison: the
    deletion-neighborhood (SymSpell/FastSS) banding. Each key emits its
    1-deletion variants plus itself as signatures; two keys at distance
    <= 1 are guaranteed to share at least one signature (substitution:
    delete the differing position in both; indel: the longer key's
    deletion IS the shorter key; equality: the identity signature), so
    candidate generation is exact, not probabilistic.

    Scale shape (same family as MinHash-LSH banding, ≙ the reference's
    content-hash dedup generalized to fuzzy keys):
      - signatures are hashed to uint64 in one vectorized call and the
        raw key rides only to the verify step — the exchange key is the
        signature hash, O(rows x key_len) narrow rows;
      - hash-bucket exchange (signature space ≈ rows x L distinct values
        — NEVER one Ray group per signature);
      - in-bucket self-merge emits candidates, verified with the O(len)
        distance-1 check (bucket-local, vectorized merge + per-pair
        constant work);
      - a pair sharing several signatures can surface in several
        buckets → global pair-level distinct via the bucketed
        drop-duplicates used by every other pair pipeline here.
    Keys are expected SHORT (a normalized title / prefix, <= ~64 chars);
    signature fan-out is len+1 per row."""
    from .relational import adaptive_bucket_count

    nb = num_buckets or adaptive_bucket_count(None)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        # SQL comparison-with-NULL semantics: a null key matches nothing
        # (levenshtein(NULL, x) is NULL in the oracle), so null/missing
        # rows are dropped here rather than coerced to "" — "" would pair
        # null rows with each other and with every 1-char key
        df = df[df[key_col].notna()]
        ids: list = []
        sigs: list[str] = []
        keys: list[str] = []
        for i, k in zip(df[id_col].to_numpy(), df[key_col].to_numpy()):
            variants = [k] + [k[:j] + k[j + 1:] for j in range(len(k))]
            ids.extend([i] * len(variants))
            sigs.extend(variants)
            keys.extend([k] * len(variants))
        h = hash64(pd.Series(sigs, dtype=object))
        return pd.DataFrame({
            "__sig": h,
            id_col: np.asarray(ids),
            "__key": np.asarray(keys, dtype=object),
            "__b": (h % np.uint64(nb)).astype(np.int32),
        })

    rows = ds.select_columns([id_col, key_col]).map_batches(
        expand, batch_format="pandas")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated("__sig", keep=False)]
        out = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                            "id_b": pd.Series([], dtype="int64")})
        if not len(g):
            return out
        cols = ["__sig", id_col, "__key"]
        m = g[cols].drop_duplicates([
            "__sig", id_col]).merge(g[cols].drop_duplicates(["__sig", id_col]),
                                    on="__sig", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if not len(m):
            return out
        m = m.drop_duplicates([f"{id_col}_a", f"{id_col}_b"])
        keep = [_lev_le1(a, b) for a, b in
                zip(m["__key_a"].to_numpy(), m["__key_b"].to_numpy())]
        m = m[np.asarray(keep, dtype=bool)]
        return pd.DataFrame({"id_a": m[f"{id_col}_a"].to_numpy(),
                             "id_b": m[f"{id_col}_b"].to_numpy()})

    pairs = rows.groupby("__b").map_groups(emit_pairs, batch_format="pandas")
    return _distinct_rows_bucketed(pairs, ["id_a", "id_b"],
                                   num_buckets=num_buckets)


def keep_best_per_component(docs: rd.Dataset, pairs: rd.Dataset,
                            id_col: str, score_col: str,
                            num_buckets: int | None = None) -> rd.Dataset:
    """Quality-aware dedup ACTION: given near-dup pair evidence, keep the
    BEST-scored member of each duplicate group (score desc, min id on
    ties) instead of the min-id representative — the curation variant
    that keeps the longest / highest-quality copy (what production
    near-dedup actually wants; min-id is only the deterministic default).

    pairs → dup_components (closure: A~B~C chains form ONE group) →
    scores attach to group members via a reduce-side join → ONE
    component-hash bucket exchange picks each group's winner vectorized
    (never one Ray group per component — #components can approach #docs)
    → losers become a drop marker and the corpus anti-joins it. Only
    (id, component, score) rows ever shuffle."""
    from .relational import (adaptive_bucket_count, drop_empty_blocks,
                             filter_batches, hash_join, semi_anti_join)

    comps = dup_components(pairs, "id_a", "id_b")
    members = hash_join(
        drop_empty_blocks(comps.map_batches(
            lambda t: pa.table({id_col: t["id"], "__comp": t["component"]}),
            batch_format="pyarrow", zero_copy_batch=True)),
        docs.select_columns([id_col, score_col]),
        on=[id_col])
    nb = num_buckets or adaptive_bucket_count(None)

    def add_cb(t: pa.Table) -> pa.Table:
        c = t["__comp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((c * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(nb)) \
            .astype(np.int32)
        return t.append_column("__cb", pa.array(b, pa.int32()))

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__comp", score_col, id_col],
                          ascending=[True, False, True], kind="mergesort")
        lose = g.duplicated("__comp", keep="first")
        return g.loc[lose, [id_col]]

    drops = members.map_batches(add_cb, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .groupby("__cb").map_groups(losers, batch_format="pandas") \
        .materialize()
    n_drop = drops.count()
    if n_drop <= 2_000_000:  # same broadcast gate as the curation keep
        ids = pa.concat_tables(
            pa.table(b) for b in drops.iter_batches(batch_format="pyarrow"))
        return semi_anti_join(docs, ids[id_col], id_col, anti=True)
    marker = drops.map_batches(
        lambda t: t.append_column("__dup",
                                  pa.array(np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow")
    joined = hash_join(docs, drop_empty_blocks(marker), on=[id_col],
                       join_type="left_outer")
    kept = filter_batches(joined, lambda t: pc.is_null(t["__dup"]))
    return kept.drop_columns(["__dup"])
