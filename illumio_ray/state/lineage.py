"""Per-partition lineage manifests — exactly-once resume for batch runs.

≙ the reference's ``state.json`` processed-keys manifest
(app/s3_manager.py:253-267, updated after every file at 356-359): here the
unit of commit is an output *shard* (a fixed set of input fragments). The
commit protocol:

  1. the shard's routed parquet is written to ``<out>/routed/shard=NNNN.tmp``
  2. the tmp dir is atomically renamed to ``<out>/routed/shard=NNNN``
  3. the manifest ``<out>/manifests/shard-NNNN.json`` is written via
     tmp-file + atomic rename — this is the commit point

Resume = anti-join of planned shards vs committed manifests (≙ the
reference's processed-key anti-join, app/s3_manager.py:208-211); any shard
directory without a manifest is discarded and re-run, so a mid-run kill
can never double-write or drop rows.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone
from pathlib import Path


def list_fragments(pages_dir: str | Path) -> list[str]:
    """Sorted parquet fragment paths (deterministic shard planning)."""
    return sorted(str(p) for p in Path(pages_dir).glob("*.parquet"))


def plan_shards(fragments: list[str], num_shards: int) -> list[tuple[int, list[str]]]:
    """Contiguous round-robin-free split: shard i gets fragments[i::num_shards]
    is NOT used — contiguous ranges keep within-shard path order sorted."""
    if not fragments:
        return []
    num_shards = max(1, min(num_shards, len(fragments)))
    out = []
    base, rem = divmod(len(fragments), num_shards)
    start = 0
    for i in range(num_shards):
        n = base + (1 if i < rem else 0)
        out.append((i, fragments[start : start + n]))
        start += n
    return out


def manifest_dir(out_dir: str | Path) -> Path:
    return Path(out_dir) / "manifests"


def shard_dir(out_dir: str | Path, shard_id: int, tmp: bool = False) -> Path:
    name = f"shard={shard_id:05d}"
    return Path(out_dir) / "routed" / (name + (".tmp" if tmp else ""))


def write_manifest(out_dir: str | Path, shard_id: int, payload: dict) -> Path:
    mdir = manifest_dir(out_dir)
    mdir.mkdir(parents=True, exist_ok=True)
    payload = dict(payload)
    payload.setdefault("shard_id", shard_id)
    payload.setdefault("written_at", datetime.now(timezone.utc).isoformat())
    final = mdir / f"shard-{shard_id:05d}.json"
    tmp = mdir / f".shard-{shard_id:05d}.json.tmp"
    tmp.write_text(json.dumps(payload, indent=1, sort_keys=True))
    os.replace(tmp, final)  # commit point
    return final


def load_manifests(out_dir: str | Path) -> dict[int, dict]:
    out = {}
    mdir = manifest_dir(out_dir)
    if not mdir.exists():
        return out
    for p in sorted(mdir.glob("shard-*.json")):
        try:
            m = json.loads(p.read_text())
            out[int(m["shard_id"])] = m
        except (ValueError, KeyError, json.JSONDecodeError):
            continue  # torn manifest → treated as uncommitted
    return out


def pending_shards(out_dir: str | Path,
                   shards: list[tuple[int, list[str]]]) -> list[tuple[int, list[str]]]:
    """Shards not yet committed; validates that committed shards cover the
    same fragment sets (a changed input plan invalidates nothing silently)."""
    done = load_manifests(out_dir)
    pending = []
    for sid, frags in shards:
        m = done.get(sid)
        if m is not None and m.get("input_fragments") == frags:
            continue
        pending.append((sid, frags))
    return pending


def plan_incremental(out_dir: str | Path, fragments: list[str],
                     fragments_per_shard: int) -> list[tuple[int, list[str]]]:
    """Incremental plan (≙ the reference's poll loop: list → anti-join vs
    processed keys → process only new files, app/s3_manager.py:208-211):
    fragments already covered by a committed manifest are skipped; only NEW
    fragments are planned, into fresh shard ids after the highest committed
    id. Committed shards are never invalidated by later arrivals."""
    done = load_manifests(out_dir)
    covered: set[str] = set()
    for m in done.values():
        covered.update(m.get("input_fragments", []))
    new = [f for f in sorted(fragments) if f not in covered]
    if not new:
        return []
    next_id = max(done) + 1 if done else 0
    size = max(1, fragments_per_shard)
    return [(next_id + i, new[s : s + size])
            for i, s in enumerate(range(0, len(new), size))]


def partials_dir(out_dir: str | Path) -> Path:
    return Path(out_dir) / "partials"


def write_partial(out_dir: str | Path, shard_id: int, table) -> Path:
    """Atomically write a shard's partial-aggregate sidecar (must land
    before the shard's manifest — manifest is the commit point)."""
    import pyarrow.parquet as pq

    pdir = partials_dir(out_dir)
    pdir.mkdir(parents=True, exist_ok=True)
    final = pdir / f"shard-{shard_id:05d}.parquet"
    tmp = pdir / f".shard-{shard_id:05d}.parquet.tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final)
    return final


def read_partials(out_dir: str | Path, shard_ids) -> list:
    """Partial-aggregate tables for committed shards."""
    import pyarrow.parquet as pq

    return [pq.read_table(partials_dir(out_dir) / f"shard-{sid:05d}.parquet")
            for sid in sorted(shard_ids)]


def sweep_stale(out_dir: str | Path) -> None:
    """Remove every routed shard dir not backed by a committed manifest
    (crash leftovers: *.tmp dirs, renamed-but-unmanifested dirs). Called
    once at run start, before any shard work launches."""
    routed = Path(out_dir) / "routed"
    if not routed.exists():
        return
    committed = set(load_manifests(out_dir))
    for p in routed.iterdir():
        name = p.name
        if name.endswith(".tmp"):
            shutil.rmtree(p, ignore_errors=True)
            continue
        try:
            sid = int(name.split("=", 1)[1])
        except (IndexError, ValueError):
            continue
        if sid not in committed:
            shutil.rmtree(p, ignore_errors=True)


def clean_uncommitted(out_dir: str | Path, shard_id: int) -> None:
    """Remove any prior output for a shard about to be (re)processed.

    Invalidation order is the COMMIT order reversed: manifest first, then
    sidecar, then data dirs — a crash mid-clean can leave orphan data (swept
    later) but never a manifest claiming data that no longer exists."""
    remove_shard(out_dir, shard_id)


def remove_shard(out_dir: str | Path, shard_id: int) -> None:
    """Fully remove a shard: manifest → partial sidecar → data (idempotent)."""
    m = manifest_dir(out_dir) / f"shard-{shard_id:05d}.json"
    if m.exists():
        m.unlink()
    p = partials_dir(out_dir) / f"shard-{shard_id:05d}.parquet"
    if p.exists():
        p.unlink()
    for d in (shard_dir(out_dir, shard_id, tmp=True), shard_dir(out_dir, shard_id)):
        if d.exists():
            shutil.rmtree(d)
