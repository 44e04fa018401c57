"""Corpus export: curated documents → shuffled, packed training shards.

The last mile of a pretraining-data build: take the kept documents and
emit N shard files a trainer can consume — each shard a pseudo-random
subset of the corpus, documents packed into ≤ budget-token sequences,
with a manifest that makes the whole export resumable and auditable.

  kept docs
    → shard = stable_hash64(doc_id) % N      (the "global shuffle":
      deterministic, partitioning-independent, no random state; the
      same rationale as mixture sampling in ops/relational.py)
    → one hive-partitioned staging write      (single streamed pass)
    → per shard, one Ray task: read its staging dir → order by
      stable_hash64(doc_id) (shuffled within-shard order) →
      FFD packing (textops.pack_sequences kernel, partition-local)
      → final shard-NNNNN.parquet + stats sidecar
    → manifest LAST (the commit point — same files→sidecar→manifest
      protocol as flagship's routed sinks / state/lineage.py)

Resume: a finished export (manifest present) is a no-op; a crash after
staging re-runs only the shards whose sidecar is missing; a crash
mid-staging restarts the export (staging is marker-committed).
stable_hash64 keys the shard assignment because shards are PERSISTED
artifacts (functions/hashing.py artifact table) — a re-export under a
new library version must reproduce the same membership.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import stable_hash64

_MANIFEST = "_manifest.json"
_STAGED = "_staged"


@ray.remote
def _pack_shard(staging: str, out_dir: str, shard: int, budget: int,
                id_col: str, token_col: str) -> dict:
    """Order one shard by hashed id, pack, write, and report stats.
    Content of the final file is deterministic for a given corpus, so a
    re-run after a crash overwrites with identical bytes (retry-safe)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ..ops.textops import pack_table

    d = Path(staging) / f"__shard={shard}"
    out = Path(out_dir)
    sidecar = out / f"shard-{shard:05d}.json"
    if sidecar.exists():  # resumed run: this shard already committed
        return json.loads(sidecar.read_text())
    t = pads.dataset(str(d)).to_table() if d.exists() else None
    if t is None or t.num_rows == 0:
        stats = {"shard": shard, "n_docs": 0, "n_tokens": 0, "n_bins": 0}
    else:
        # shuffled within-shard order, then FFD over bounded CHUNKS of
        # that order (bins never span chunks — pack_sequences' sharded-
        # packing compromise; open-bin scans stay O(chunk), not O(shard))
        order = np.argsort(stable_hash64(t[id_col]), kind="stable")
        t = t.take(pa.array(order, pa.int64()))
        chunk = 65536
        packed = pa.concat_tables(
            pack_table(t.slice(o, chunk).select([id_col, token_col]),
                       budget, token_col, id_col)
            for o in range(0, t.num_rows, chunk))
        t = t.join(packed.select([id_col, "bin_id"]), keys=[id_col],
                   join_type="inner")
        order = np.argsort(stable_hash64(t[id_col]), kind="stable")
        t = t.take(pa.array(order, pa.int64()))
        tmp = out / f".shard-{shard:05d}.parquet.tmp"
        pq.write_table(t, str(tmp))
        tmp.replace(out / f"shard-{shard:05d}.parquet")
        stats = {"shard": shard, "n_docs": t.num_rows,
                 "n_tokens": int(np.sum(
                     t[token_col].to_numpy(zero_copy_only=False))),
                 "n_bins": packed.group_by(["bin_id"])
                 .aggregate([]).num_rows}
    tmp_sc = out / f".shard-{shard:05d}.json.tmp"
    tmp_sc.write_text(json.dumps(stats))
    tmp_sc.replace(sidecar)
    return stats


def export_training_shards(kept: rd.Dataset, out_dir: str | Path,
                           num_shards: int, pack_budget: int,
                           id_col: str = "doc_id",
                           token_col: str = "n_tokens") -> list[dict]:
    """Export ``kept`` into ``num_shards`` packed shard files under
    ``out_dir``; returns per-shard stats (also persisted as sidecars +
    one manifest). Safe to re-invoke: completed exports return their
    manifest, partial ones finish the missing shards only."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest = out / _MANIFEST
    if manifest.exists():
        return json.loads(manifest.read_text())["shards"]

    staging = out / "staging"
    staged_marker = staging / _STAGED
    # staging is only reusable for the SAME shard split: a resume with a
    # different num_shards must restage (and drop all shard artifacts)
    if staged_marker.exists() and staged_marker.read_text() != str(num_shards):
        staged_marker.unlink()
    if not staged_marker.exists():
        import shutil
        shutil.rmtree(staging, ignore_errors=True)
        # drop every shard artifact from a staging-era crash (a re-run
        # may use different num_shards — stale shard files beside the
        # new manifest would feed consumers duplicated docs); shard
        # membership is only trustworthy once staging is marker-committed
        for pat in ("shard-*.json", "shard-*.parquet",
                    ".shard-*.tmp"):
            for p in out.glob(pat):
                p.unlink()

        def assign(t: pa.Table) -> pa.Table:
            s = (stable_hash64(t[id_col]) % np.uint64(num_shards)) \
                .astype(np.int32)
            return t.append_column("__shard", pa.array(s, pa.int32()))

        kept.map_batches(assign, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .write_parquet(str(staging), partition_cols=["__shard"])
        staged_marker.write_text(str(num_shards))

    refs = [_pack_shard.remote(str(staging), str(out), s, pack_budget,
                               id_col, token_col)
            for s in range(num_shards)]
    stats = sorted(ray.get(refs), key=lambda r: r["shard"])
    tmp = out / (_MANIFEST + ".tmp")
    tmp.write_text(json.dumps({"num_shards": num_shards,
                               "pack_budget": pack_budget,
                               "shards": stats}))
    tmp.replace(manifest)
    return stats
