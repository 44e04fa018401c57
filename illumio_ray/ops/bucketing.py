"""Hash-bucketed storage and co-located (shuffle-free) joins.

The 100 TB join strategy the brief calls "pick ONE partitioning key and
reuse it across stages": write both tables bucketed by ``hash(key) % K``
once, and every later equi-join on that key runs bucket-by-bucket — each
bucket pair is read and joined locally in one Ray task, with NO all-to-all
exchange at join time. The shuffle cost is paid once at layout time and
amortized over every downstream join/groupby on the same key.

Buckets are hive partition directories (``__bucket=NNN``), so a failed
layout job resumes per bucket and a bucketed read prunes to one directory.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import stable_hash64


def write_bucketed(ds: rd.Dataset, key_col: str, num_buckets: int,
                   out_dir: str | Path) -> str:
    """Write ``ds`` hash-bucketed by ``key_col`` into hive dirs
    ``out_dir/__bucket=i/``. Deterministic: same key → same bucket in any
    run of ANY build — the layout outlives the process, so the bucket
    function must be stable_hash64 (pinned in our code), never a library
    hash that may change across upgrades (polars documents Series.hash as
    stable only within one polars version; a layout written under one
    version and joined under another would silently drop join rows)."""
    def add_bucket(t: pa.Table) -> pa.Table:
        b = (stable_hash64(t[key_col]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)
    bucketed.write_parquet(str(out_dir), partition_cols=["__bucket"])
    return str(out_dir)


def read_bucket(out_dir: str | Path, bucket: int,
                columns: list[str] | None = None) -> pa.Table:
    """Current contents of one bucket. Honors the _HEAD generation
    pointer left by upsert_bucketed (dead generations are invisible even
    before a vacuum); a plain write_bucketed layout has no _HEAD and
    reads all its parquet files."""
    import pyarrow.dataset as pads

    d = Path(out_dir) / f"__bucket={bucket}"
    if not d.exists():
        return pa.table({})
    files = _live_files(d)
    if not files:
        return pa.table({})
    return pads.dataset([str(p) for p in files]).to_table(columns=columns)


def _bucket_schema(out_dir: str | Path) -> pa.Schema:
    """Data-file schema of a bucketed layout (NO __bucket field), from
    one live file's footer. pyarrow dataset discovery can't be used
    here: the ``__bucket=`` hive dirs start with '_', which the default
    ``ignore_prefixes`` silently excludes — discovery over the layout
    root returns an EMPTY schema, which then crashes the empty-bucket
    fallback paths (sparse probe/join buckets), not the common case."""
    import pyarrow.parquet as pq

    for bdir in sorted(Path(out_dir).glob("__bucket=*")):
        files = _live_files(bdir)
        if files:
            return pq.read_schema(str(files[0]))
    raise FileNotFoundError(f"no data files in bucketed layout {out_dir}")


@ray.remote
def _join_bucket(dir_a: str, dir_b: str, bucket: int, on: list[str],
                 cols_a: list[str] | None, cols_b: list[str] | None,
                 join_type: str, schema_a, schema_b) -> pa.Table:
    a = read_bucket(dir_a, bucket, cols_a)
    b = read_bucket(dir_b, bucket, cols_b)

    def _empty(schema: pa.Schema, cols: list[str] | None) -> pa.Table:
        t = schema.empty_table()
        return t.select(cols) if cols else t

    if a.num_rows == 0:
        a = _empty(schema_a, cols_a)
    if b.num_rows == 0:
        b = _empty(schema_b, cols_b)
    # joining possibly-empty sides keeps every block on the SAME joined
    # schema (an early-out would emit schema-mismatched empty blocks)
    return a.join(b, keys=on, join_type=join_type)


def bucketed_join(dir_a: str | Path, dir_b: str | Path, on: list[str],
                  num_buckets: int, cols_a: list[str] | None = None,
                  cols_b: list[str] | None = None,
                  join_type: str = "inner") -> rd.Dataset:
    """Join two same-key bucketed layouts WITHOUT a shuffle: one Ray task
    per bucket reads exactly its two directories and arrow-joins locally;
    results stay in the object store (the driver only holds refs). Equal
    keys share a bucket by construction, so the union of per-bucket joins
    is the exact join result."""
    schema_a = _bucket_schema(dir_a)
    schema_b = _bucket_schema(dir_b)
    refs = [_join_bucket.remote(str(dir_a), str(dir_b), i, on,
                                cols_a, cols_b, join_type,
                                schema_a, schema_b)
            for i in range(num_buckets)]
    return rd.from_arrow_refs(refs)


# ---------------------------------------------------------------------------
# keyed upsert (incremental maintenance of a bucketed layout)
# ---------------------------------------------------------------------------
#
# Each bucket directory gains generation files (gen-<token>.parquet) plus
# a _HEAD pointer naming the live file. _HEAD is replaced with os.replace —
# the single atomic commit point per bucket (same philosophy as the
# lineage manifests: files first, pointer last; ≙ app/state
# write-temp-then-rename). A crash mid-upsert leaves inert tmp/gen files
# and the previous _HEAD intact. Buckets never written by write_bucketed's
# original layout have no _HEAD; readers then fall back to "all NON-gen
# parquet files in the dir" (the freshly-written layout is gen 0) — a
# gen file is NEVER live until a _HEAD names it, so a crash or Ray task
# retry between the gen rename and the _HEAD commit re-reads the same
# base state it started from instead of double-counting its own output.
#
# _HEAD format: first line = live gen filename; every further line = a
# merge token already folded into that state (the applied-token ledger
# _merge_bucket's idempotence check reads — one short line per merge,
# trimmed by rewriting the layout, negligible next to the data files).

def _bucket_dir(layout_dir: str | Path, bucket: int) -> Path:
    return Path(layout_dir) / f"__bucket={bucket}"


def _read_head(bdir: Path) -> tuple[str | None, list[str]]:
    """(live filename or None, applied merge tokens) from _HEAD."""
    head = bdir / "_HEAD"
    if not head.exists():
        return None, []
    lines = head.read_text().splitlines()
    live = lines[0].strip() if lines else ""
    return live or None, [ln.strip() for ln in lines[1:] if ln.strip()]


def _commit_head(bdir: Path, gen: str, tokens: list[str],
                 tmp_tag: str, seq: int | None = None) -> None:
    import os

    head_tmp = bdir / f"_HEAD.{tmp_tag}.tmp"
    head_tmp.write_text("\n".join([gen, *tokens]))
    os.replace(head_tmp, bdir / "_HEAD")   # commit point
    if seq is not None:
        # immutable snapshot pointer for time travel: written AFTER the
        # _HEAD replace, so a crash in between resolves this op's
        # snapshot to the PREVIOUS version — snapshot visibility never
        # runs ahead of liveness (single-writer protocol; a retried op
        # re-commits both)
        ver_tmp = bdir / f"_HEAD@{seq:08d}.{tmp_tag}.tmp"
        ver_tmp.write_text(gen)
        os.replace(ver_tmp, bdir / f"_HEAD@{seq:08d}")


def _next_seq(layout_dir: str | Path) -> int:
    """Allocate the next layout-level snapshot sequence number (monotonic,
    starts at 1; the pre-upsert base layout is snapshot 0). Single-writer,
    like every other mutation of the layout."""
    import os

    seq_file = Path(layout_dir) / "_SEQ"
    cur = int(seq_file.read_text()) if seq_file.exists() else 0
    nxt = cur + 1
    tmp = seq_file.with_suffix(".tmp")
    tmp.write_text(str(nxt))
    os.replace(tmp, seq_file)
    return nxt


def _live_files(bdir: Path) -> list[Path]:
    live, _ = _read_head(bdir)
    if (bdir / "_HEAD").exists():
        return [bdir / live] if live else []
    # no _HEAD: the write_bucketed base layout is live; gen files are
    # renamed-but-uncommitted upsert/merge output and must stay invisible
    return sorted(p for p in bdir.glob("*.parquet")
                  if not p.name.startswith("gen-"))


# read_bucket honors _HEAD directly; the alias keeps the intent-revealing
# name at upsert call sites.
read_bucket_live = read_bucket


@ray.remote
def _upsert_bucket(layout_dir: str, incoming_dir: str, bucket: int,
                   key_col: str, token: str,
                   snap_seq: int | None = None) -> dict:
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    new = read_bucket(incoming_dir, bucket)
    if new.num_rows == 0:
        return {"bucket": bucket, "added": 0, "replaced": 0}
    old = read_bucket_live(layout_dir, bucket)
    if old.num_rows:
        mask = pc.is_in(old[key_col], value_set=pc.unique(new[key_col]))
        replaced = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
        kept = old.filter(pc.invert(mask))
        merged = pa.concat_tables([kept, new.select(old.column_names)],
                                  promote_options="default")
    else:
        replaced = 0
        merged = new
    bdir = _bucket_dir(layout_dir, bucket)
    bdir.mkdir(parents=True, exist_ok=True)
    gen = f"gen-{token}.parquet"
    tmp = bdir / (gen + ".tmp")
    pq.write_table(merged, tmp)
    os.replace(tmp, bdir / gen)            # file visible, not yet live
    # replace-by-key is idempotent per delta, but the merge-token ledger
    # must survive an interleaved upsert or a replayed merge re-adds
    _, applied = _read_head(bdir)
    _commit_head(bdir, gen, applied, token, seq=snap_seq)
    return {"bucket": bucket, "added": new.num_rows, "replaced": replaced}


def upsert_bucketed(layout_dir: str | Path, new_ds: rd.Dataset,
                    key_col: str, num_buckets: int) -> dict:
    """Replace-by-key upsert of ``new_ds`` into an existing bucketed
    layout: a new row replaces EVERY live row sharing its key; keys only
    in the layout survive untouched. Only the buckets the new batch
    actually touches are rewritten (incremental cost ∝ changed keys ×
    bucket size, never layout size), one Ray task per touched bucket, the
    driver holding counters only."""
    import shutil
    import uuid

    token = uuid.uuid4().hex[:12]
    incoming = Path(layout_dir) / f"_incoming-{token}"
    write_bucketed(new_ds, key_col, num_buckets, incoming)
    try:
        snap = _next_seq(layout_dir)
        touched = sorted(int(p.name.split("=", 1)[1])
                         for p in incoming.glob("__bucket=*"))
        refs = [_upsert_bucket.remote(str(layout_dir), str(incoming), b,
                                      key_col, token, snap)
                for b in touched]
        stats = ray.get(refs)
    finally:
        shutil.rmtree(incoming, ignore_errors=True)
    return {"snapshot_seq": snap, "buckets_touched": len(stats),
            "rows_added": sum(s["added"] for s in stats),
            "rows_replaced": sum(s["replaced"] for s in stats)}


@ray.remote
def _merge_bucket(layout_dir: str, incoming_dir: str, bucket: int,
                  key_col: str, sum_cols: list[str], token: str,
                  snap_seq: int | None = None) -> dict:
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    new = read_bucket(incoming_dir, bucket)
    if new.num_rows == 0:
        return {"bucket": bucket, "keys": 0, "skipped": False}
    bdir = _bucket_dir(layout_dir, bucket)
    gen = f"gen-{token}.parquet"
    _, applied = _read_head(bdir)
    if token in applied:
        # this token's delta already folded into the live state — replays
        # of ANY earlier delta (not just the latest) are retry-safe no-ops
        return {"bucket": bucket, "keys": 0, "skipped": True}
    old = read_bucket_live(layout_dir, bucket)
    cols = [key_col, *sum_cols]
    both = (pa.concat_tables([old.select(cols), new.select(cols)],
                             promote_options="default")
            if old.num_rows else new.select(cols))
    g = both.group_by([key_col]).aggregate([(c, "sum") for c in sum_cols])
    merged = pa.table({key_col: g[key_col],
                       **{c: g[f"{c}_sum"] for c in sum_cols}})
    bdir.mkdir(parents=True, exist_ok=True)
    tmp = bdir / (gen + ".tmp")
    pq.write_table(merged, tmp)
    os.replace(tmp, bdir / gen)            # file visible, not yet live
    _commit_head(bdir, gen, [*applied, token], token, seq=snap_seq)
    return {"bucket": bucket, "keys": merged.num_rows, "skipped": False}


def merge_bucketed(layout_dir: str | Path, delta_ds: rd.Dataset,
                   key_col: str, num_buckets: int, sum_cols: list[str],
                   token: str | None = None) -> dict:
    """ADDITIVE merge of a delta batch into a persisted keyed aggregate
    layout (rows = key + counter columns): per key, counters SUM with
    the live row instead of replacing it — incremental aggregate
    maintenance across runs, the persisted generalization of the
    flagship's per-run sidecar combine. Only touched buckets rewrite
    (one Ray task per bucket, _HEAD-pointer commit like upsert).

    Unlike replace-by-key, addition is NOT naturally idempotent, so each
    merge carries a ``token`` naming its exact delta batch: every bucket
    _HEAD carries the ledger of tokens folded into its live state, and a
    bucket whose ledger already holds this token skips — Ray task
    retries, whole-call reruns after a crash, AND replays of an EARLIER
    delta after later merges all fold each delta exactly once. Callers
    doing crash-recovery MUST rerun with the SAME token and the SAME
    delta. Single-writer, like the rest of the layout protocol."""
    import shutil
    import uuid

    token = token or uuid.uuid4().hex[:12]
    incoming = Path(layout_dir) / f"_incoming-{token}"
    shutil.rmtree(incoming, ignore_errors=True)  # crashed-run leftovers
    write_bucketed(delta_ds, key_col, num_buckets, incoming)
    try:
        snap = _next_seq(layout_dir)
        touched = sorted(int(p.name.split("=", 1)[1])
                         for p in incoming.glob("__bucket=*"))
        refs = [_merge_bucket.remote(str(layout_dir), str(incoming), b,
                                     key_col, list(sum_cols), token, snap)
                for b in touched]
        stats = ray.get(refs)
    finally:
        shutil.rmtree(incoming, ignore_errors=True)
    return {"token": token, "snapshot_seq": snap,
            "buckets_touched": len(stats),
            "buckets_skipped": sum(1 for s in stats if s["skipped"]),
            "live_keys_in_touched": sum(s["keys"] for s in stats)}


def live_parquet_files(layout_dir: str | Path,
                       num_buckets: int) -> list[str]:
    """The layout's live parquet files (one per existing bucket, honoring
    _HEAD) — hand these to ray.data.read_parquet for a distributed scan
    of the committed state."""
    files: list[str] = []
    for b in range(num_buckets):
        bdir = _bucket_dir(layout_dir, b)
        if bdir.exists():
            files += [str(f) for f in _live_files(bdir)]
    return files


def _bucket_versions(bdir: Path) -> list[tuple[int, Path]]:
    """Committed snapshot pointers of one bucket, ascending by seq."""
    out = []
    for p in bdir.glob("_HEAD@*"):
        if p.name.endswith(".tmp"):
            continue
        try:
            out.append((int(p.name.split("@", 1)[1]), p))
        except ValueError:
            continue
    return sorted(out)


def snapshot_parquet_files(layout_dir: str | Path, num_buckets: int,
                           seq: int) -> list[str]:
    """Time travel: the layout's parquet files AS OF snapshot ``seq``
    (``snapshot_seq`` returned by upsert/merge/apply; 0 = the base
    write_bucketed layout). Per bucket the newest committed snapshot
    pointer ≤ seq names the live generation file; a bucket with no
    pointer that old serves its base files. Pure directory-listing
    metadata — O(buckets), no data scan; hand the list to
    ray.data.read_parquet for the distributed read.

    Raises FileNotFoundError if the snapshot's generation file has been
    vacuumed (vacuum_bucketed keeps only the live generation; historic
    snapshots are readable exactly until the next vacuum)."""
    files: list[str] = []
    for b in range(num_buckets):
        bdir = _bucket_dir(layout_dir, b)
        if not bdir.exists():
            continue
        vers = [(s, p) for s, p in _bucket_versions(bdir) if s <= seq]
        if vers:
            gen = vers[-1][1].read_text().strip()
            gp = bdir / gen
            if not gp.exists():
                raise FileNotFoundError(
                    f"snapshot {seq} of bucket {b} ({gen}) was vacuumed — "
                    "historic snapshots survive only until vacuum_bucketed")
            files.append(str(gp))
        else:
            # bucket untouched at/before seq: base files (never includes
            # gen files — those are newer than any base state)
            base = sorted(str(p) for p in bdir.glob("*.parquet")
                          if not p.name.startswith("gen-"))
            if not base and (bdir / "_BASE_VACUUMED").exists():
                raise FileNotFoundError(
                    f"snapshot {seq} of bucket {b}: base files were "
                    "vacuumed — historic snapshots survive only until "
                    "vacuum_bucketed")
            files += base
    return files


def read_bucketed_asof(layout_dir: str | Path, num_buckets: int,
                       seq: int,
                       columns: list[str] | None = None) -> rd.Dataset:
    """Distributed scan of the layout AS OF snapshot ``seq`` (see
    snapshot_parquet_files). An empty snapshot (base layout never
    written) yields an empty Dataset with the layout schema."""
    files = snapshot_parquet_files(layout_dir, num_buckets, seq)
    if not files:
        empty = _bucket_schema(layout_dir).empty_table()
        return rd.from_arrow(empty.select(columns) if columns else empty)
    return rd.read_parquet(files, columns=columns)


def current_snapshot_seq(layout_dir: str | Path) -> int:
    """The latest allocated snapshot sequence (0 ⇔ base layout only)."""
    seq_file = Path(layout_dir) / "_SEQ"
    return int(seq_file.read_text()) if seq_file.exists() else 0


def vacuum_bucketed(layout_dir: str | Path, num_buckets: int,
                    grace_sec: float = 0.0) -> int:
    """Delete non-live generation files left by completed upserts.

    SINGLE-WRITER ONLY (same contract as the lineage manifest protocol):
    the layout is crash-safe — _HEAD is the commit point and is never
    removed — but not concurrent-writer-safe. A vacuum racing a live
    upsert can list _HEAD, then unlink a generation file that becomes
    live an instant later; two concurrent upserts to one bucket lose one
    writer's rows (last _HEAD wins over a stale base). Run vacuum (and
    upserts) from the one process that owns the layout.

    ``grace_sec`` is belt-and-braces for operational drift from that
    contract: files younger than the grace are kept even when they look
    dead, so a vacuum that DOES race an in-flight upsert (gen renamed,
    _HEAD not yet committed) cannot unlink the file about to become
    live. It does not make concurrent upserts safe — only the
    vacuum-vs-one-upsert race benign."""
    import time

    now = time.time()

    def _young(p: Path) -> bool:
        try:
            return grace_sec > 0 and now - p.stat().st_mtime < grace_sec
        except OSError:
            return True  # raced with a writer/renamer: leave it alone
    removed = 0
    for b in range(num_buckets):
        bdir = _bucket_dir(layout_dir, b)
        if not bdir.exists():
            continue
        if (bdir / "_HEAD").exists():
            live = {p.name for p in _live_files(bdir)}
            doomed = [p for p in bdir.glob("*.parquet*")
                      if p.name not in live and not _young(p)]
        else:
            # no _HEAD: base files are live; any gen file here is
            # renamed-but-never-committed crash debris (invisible to
            # readers by the _live_files contract)
            doomed = [p for p in bdir.glob("gen-*.parquet*")
                      if not _young(p)]
        for p in doomed:
            if not p.name.startswith("gen-"):
                # deleting base files: leave a tombstone so a time-travel
                # read of the pre-upsert state fails fast instead of
                # silently yielding an empty bucket
                (bdir / "_BASE_VACUUMED").touch()
            p.unlink()
            removed += 1
        # snapshot pointers (_HEAD@seq) are KEPT even when their gen file
        # is vacuumed: they act as tombstones so a time-travel read of
        # vacuumed history fails fast (FileNotFoundError in
        # snapshot_parquet_files) instead of silently resolving to the
        # stale base files
    return removed


@ray.remote
def _lookup_bucket(layout_dir: str, bucket: int, key_col: str,
                   keys: list, columns: list[str] | None) -> pa.Table:
    # key_col is always read (the probe filter needs it) and dropped
    # afterwards if the caller's projection excluded it
    cols = None if columns is None else \
        list(dict.fromkeys([key_col, *columns]))
    t = read_bucket(layout_dir, bucket, cols)
    if t.num_rows == 0:
        sch = _bucket_schema(layout_dir)
        t = sch.empty_table()
        if cols:
            t = t.select(cols)
    t = t.filter(pc.is_in(t[key_col], value_set=pa.array(keys)))
    return t.select(columns) if columns is not None else t


def bucketed_lookup(layout_dir: str | Path, key_col: str, keys: list,
                    num_buckets: int,
                    columns: list[str] | None = None) -> rd.Dataset:
    """Point lookups against a persisted bucketed layout WITHOUT scanning
    it: each probe key hashes to its bucket with stable_hash64 — the same
    function that wrote the layout — so only the ≤ min(#keys, K) bucket
    directories that can contain a probe key are ever opened. One Ray
    task per touched bucket filters its bucket to the probe keys
    (vectorized is_in); untouched buckets cost nothing. This is the
    layout's third amortized consumer (after the co-located join and the
    re-grouped aggregate): the index IS the directory structure.

    ``columns`` may omit ``key_col``: the key is always read for the
    probe filter and dropped from the output when not requested."""
    ks = pa.array(keys)
    buckets = stable_hash64(ks) % np.uint64(num_buckets)
    by_bucket: dict[int, list] = {}
    for key, b in zip(keys, buckets):
        by_bucket.setdefault(int(b), []).append(key)
    refs = [_lookup_bucket.remote(str(layout_dir), b, key_col, bks, columns)
            for b, bks in sorted(by_bucket.items())]
    return rd.from_arrow_refs(refs)


# ---------------------------------------------------------------------------
# CDC apply (keyed insert/update/delete stream → bucketed layout)
# ---------------------------------------------------------------------------

@ray.remote
def _apply_bucket(layout_dir: str, incoming_dir: str, bucket: int,
                  key_col: str, op_col: str, seq_col: str | None,
                  token: str, snap_seq: int | None = None) -> dict:
    import os

    import pyarrow.parquet as pq

    new = read_bucket(incoming_dir, bucket)
    if new.num_rows == 0:
        return {"bucket": bucket, "deleted": 0, "upserted": 0}
    if seq_col is not None:
        # last-change-wins per key: stable sort by (key, seq), keep the
        # final row of each key run — vectorized, no per-key loop
        new = new.sort_by([(key_col, "ascending"), (seq_col, "ascending")])
        k = new[key_col].to_numpy(zero_copy_only=False)
        last = np.empty(len(k), bool)
        last[:-1] = k[:-1] != k[1:]
        last[-1] = True
        new = new.filter(pa.array(last))
    old = read_bucket_live(layout_dir, bucket)
    touched = pc.unique(new[key_col])
    ups_mask = pc.equal(new[op_col], "U")
    ups = new.filter(ups_mask)
    dels = new.filter(pc.invert(ups_mask))
    # rows ACTUALLY removed by deletes (a delete of an absent key is a
    # no-op and must not count — idempotent replays report 0)
    n_del = (int(pc.sum(pc.cast(pc.is_in(
        old[key_col], value_set=pc.unique(dels[key_col])),
        pa.int64())).as_py() or 0)
        if old.num_rows and dels.num_rows else 0)
    if old.num_rows:
        kept = old.filter(pc.invert(
            pc.is_in(old[key_col], value_set=touched)))
        merged = pa.concat_tables(
            [kept, ups.select(old.column_names)],
            promote_options="default")
    else:
        merged = ups.drop_columns(
            [c for c in (op_col, seq_col) if c and c in ups.column_names])
    bdir = _bucket_dir(layout_dir, bucket)
    bdir.mkdir(parents=True, exist_ok=True)
    gen = f"gen-{token}.parquet"
    tmp = bdir / (gen + ".tmp")
    pq.write_table(merged, tmp)
    os.replace(tmp, bdir / gen)            # file visible, not yet live
    _, applied = _read_head(bdir)
    _commit_head(bdir, gen, applied, token, seq=snap_seq)
    return {"bucket": bucket, "deleted": n_del, "upserted": ups.num_rows}


def apply_changes_bucketed(layout_dir: str | Path, changes: rd.Dataset,
                           key_col: str, op_col: str, num_buckets: int,
                           seq_col: str | None = None) -> dict:
    """Apply a CDC change stream to a bucketed layout: each change row is
    an upsert (``op_col == "U"``, full payload) or a delete (any other op
    value; payload ignored). Completes the incremental-maintenance family
    next to ``upsert_bucketed`` (replace-only) and ``merge_bucketed``
    (additive): one Ray task per TOUCHED bucket, cost ∝ changed keys ×
    bucket size, the driver holding counters only.

    At most one change per key per call unless ``seq_col`` is given, in
    which case the max-seq change wins deterministically (vectorized
    last-per-key inside the bucket task). Replaying the SAME change set
    is idempotent (delete of a gone key is a no-op, an upsert rewrites
    the same row); interleaved writers are NOT supported — single-writer,
    like the rest of the _HEAD protocol."""
    import shutil
    import uuid

    token = uuid.uuid4().hex[:12]
    incoming = Path(layout_dir) / f"_incoming-{token}"
    write_bucketed(changes, key_col, num_buckets, incoming)
    try:
        snap = _next_seq(layout_dir)
        touched = sorted(int(p.name.split("=", 1)[1])
                         for p in incoming.glob("__bucket=*"))
        refs = [_apply_bucket.remote(str(layout_dir), str(incoming), b,
                                     key_col, op_col, seq_col, token, snap)
                for b in touched]
        stats = ray.get(refs)
    finally:
        shutil.rmtree(incoming, ignore_errors=True)
    return {"snapshot_seq": snap, "buckets_touched": len(stats),
            "rows_deleted": sum(s["deleted"] for s in stats),
            "rows_upserted": sum(s["upserted"] for s in stats)}
