"""Flagship pipeline: read → parse → enrich → route → sinks → aggregate.

The Ray-Data-native rebuild of the reference's end-to-end flow
(app/main.py poll loop → download → app/log_processor.py transform →
route → sink → app/health_reporter.py aggregate counts), as a resumable
batch run over a snapshot of pages parquet:

    ray.data.read_parquet(shard fragments)         # ≙ S3 list + download
      .map_batches(extract_page_fields, pyarrow)   # ≙ parse/transform (M1-M9)
      .map_batches(Enricher, concurrency=N)        # ≙ label-context enrichment (T5/J3)
      .map_batches(route_batch, pyarrow)           # ≙ log_type routing + M10 wire
      .write_parquet(shard dir, partition_cols=["event_class"])   # ≙ per-type SIEM sink (S4)
    + per-shard lineage manifest                    # ≙ state.json commit (T1/S7)
    then: pruned re-read of routed output → partial-agg → groupby
          → aggregates parquet                      # ≙ health counters (A1/A6)

Scale notes (100 TB design):
  - html never crosses the parse stage boundary — downstream stages and
    the aggregate re-read are column-pruned;
  - the aggregate uses a per-batch combiner (arrow group_by inside
    map_batches) before the global groupby, so the shuffle moves
    O(groups) rows, not O(docs);
  - shards are the resume/commit unit; each shard's fragments are read
    with normal Ray Data parallelism, so shard size trades checkpoint
    granularity against scheduling overhead (at 100 TB: thousands of
    fragments per shard).
"""

from __future__ import annotations

import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum
from ray.data.datasource.partitioning import PathPartitionFilter

from ..functions.extract import extract_page_fields
from ..functions.hashing import combine_unordered, hash64
from ..stages.enrich import Enricher, broadcast_lookups
from ..stages.route import route_batch
from ..state import lineage


def _cluster_cpus() -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def default_enrich_concurrency(n_concurrent_pipelines: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds. Fixed pools pay full actor startup
    even for tiny inputs (16 eager actors cost ~12 s before the first
    batch); (1, max) lets Ray Data scale with queue depth. The max is
    capped at cpus/pipelines so concurrent shard pipelines plus their
    read/write task stages can't starve each other."""
    cpus = _cluster_cpus()
    return (1, max(2, cpus // max(1, n_concurrent_pipelines)))


def build_routed(pages_ds: rd.Dataset, lookup_kwargs: dict,
                 enrich_concurrency=None, with_wire: bool = True) -> rd.Dataset:
    """Lazy routed dataset from a pages dataset."""
    if enrich_concurrency is None:
        enrich_concurrency = default_enrich_concurrency()
    ds = pages_ds.map_batches(
        extract_page_fields, batch_format="pyarrow", zero_copy_batch=True
    )
    ds = ds.map_batches(
        Enricher,
        fn_constructor_kwargs=lookup_kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=enrich_concurrency,
        num_cpus=1,
    )
    ds = ds.map_batches(
        lambda b: route_batch(b, with_wire=with_wire),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ds


def _partial_agg(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: O(batch) rows → O(groups) rows before the
    global shuffle (SURVEY.md §4 'pre-aggregate partial')."""
    g = batch.group_by(["event_class", "lang", "hour"]).aggregate(
        [("n_tokens", "sum"), ("n_tokens", "count")]
    )
    return pa.table(
        {
            "sink": g["event_class"],
            "lang": g["lang"],
            "hour": g["hour"],
            "n_docs_p": pc.cast(g["n_tokens_count"], pa.int64()),
            "sum_tokens_p": pc.cast(g["n_tokens_sum"], pa.int64()),
        }
    )


def aggregate_routed(routed_ds: rd.Dataset) -> rd.Dataset:
    """(sink, lang, hour) → n_docs, sum_tokens. Input may be the lazy
    routed dataset or a pruned read of the routed parquet."""
    partials = routed_ds.map_batches(
        _partial_agg, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partials.groupby(["sink", "lang", "hour"]).aggregate(
        Sum("n_docs_p", alias_name="n_docs"),
        Sum("sum_tokens_p", alias_name="sum_tokens"),
    )
    return agg


def _shard_content_hash(shard_path: Path) -> tuple[int, int]:
    """(row_count, order-insensitive content hash over urls) for a
    committed shard — cheap single-column pruned read."""
    import pyarrow.dataset as pads

    dset = pads.dataset(str(shard_path), format="parquet", partitioning="hive")
    n = 0
    h = 0
    for rb in dset.to_batches(columns=["url"]):
        n += rb.num_rows
        if rb.num_rows:
            h = (h + combine_unordered(hash64(rb.column(0)))) % (1 << 64)
    return n, h


TARGET_READ_BLOCK_BYTES = 64 * 1024 * 1024


def _read_blocks_for(fragments: list[str]) -> int:
    """Block count sized from real fragment bytes. Ray's default parallelism
    heuristic shatters small fragments into micro-blocks, and every
    downstream stage (and the partitioned write: one file per block ×
    partition) inherits the fan-out — 49 k rows became 1498 output files.
    One block per ~64 MB compressed, at least one per fragment."""
    import os

    total = 0
    for f in fragments:
        try:
            total += os.path.getsize(f)
        except OSError:
            pass
    return max(len(fragments), total // TARGET_READ_BLOCK_BYTES)


def run_shard(shard_id: int, fragments: list[str], out_dir: str | Path,
              lookup_kwargs: dict, enrich_concurrency=None,
              with_wire: bool = True) -> dict:
    """Process one shard end-to-end and commit its manifest."""
    out_dir = Path(out_dir)
    lineage.clean_uncommitted(out_dir, shard_id)
    tmp = lineage.shard_dir(out_dir, shard_id, tmp=True)
    final = lineage.shard_dir(out_dir, shard_id)

    pages = rd.read_parquet(fragments,
                            override_num_blocks=_read_blocks_for(fragments))
    routed = build_routed(pages, lookup_kwargs, enrich_concurrency, with_wire)
    routed.write_parquet(str(tmp), partition_cols=["event_class"])
    tmp.rename(final)

    rows_out, content_hash = _shard_content_hash(final)
    manifest = {
        "shard_id": shard_id,
        "input_fragments": fragments,
        "row_count": rows_out,
        "content_hash": content_hash,
    }
    lineage.write_manifest(out_dir, shard_id, manifest)
    return manifest


def run_flagship(pages_dir: str | Path, out_dir: str | Path,
                 lang_path: str, host_path: str,
                 num_shards: int = 4, resume: bool = True,
                 enrich_concurrency=None, with_wire: bool = True,
                 fail_after_shards: int | None = None,
                 max_concurrent_shards: int = 4) -> dict:
    """Full resumable run. ``fail_after_shards`` simulates a mid-run kill
    (used by the checkpoint-resume test; forces serial shard order).

    Shards run ``max_concurrent_shards`` at a time (driver threads, one Ray
    Data pipeline each): per-shard fixed costs (actor-pool spin-up, dataset
    orchestration) overlap, while each shard keeps its own atomic
    write→rename→manifest commit. At 100 TB a shard holds thousands of
    fragments and saturates the cluster alone; concurrency then mostly
    pipelines one shard's write tail into the next's read head."""
    t0 = time.perf_counter()
    out_dir = Path(out_dir)
    fragments = lineage.list_fragments(pages_dir)
    if not fragments:
        return {"shards_total": 0, "shards_run_this_invocation": 0,
                "rows_routed": 0, "elapsed_sec": 0.0, "aggregates_path": None}
    shards = lineage.plan_shards(fragments, num_shards)
    lineage.sweep_stale(out_dir)
    todo = lineage.pending_shards(out_dir, shards) if resume else shards

    lookup_kwargs = broadcast_lookups(lang_path, host_path)
    n_threads = max(1, min(max_concurrent_shards, len(todo)))
    if fail_after_shards is not None:
        n_threads = 1  # deterministic commit order for the kill simulation
    if enrich_concurrency is None:
        enrich_concurrency = default_enrich_concurrency(n_threads)

    done = 0
    if n_threads == 1:
        for sid, frags in todo:
            run_shard(sid, frags, out_dir, lookup_kwargs,
                      enrich_concurrency=enrich_concurrency, with_wire=with_wire)
            done += 1
            if fail_after_shards is not None and done >= fail_after_shards:
                raise RuntimeError(f"simulated failure after {done} shards")
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(n_threads) as ex:
            futs = [
                ex.submit(run_shard, sid, frags, out_dir, lookup_kwargs,
                          enrich_concurrency=enrich_concurrency,
                          with_wire=with_wire)
                for sid, frags in todo
            ]
            for f in futs:
                f.result()
                done += 1

    # Final aggregate over COMMITTED routed output only — reading the whole
    # routed/ dir would also pick up any *.tmp dir left by a crash mid-write;
    # the manifest set is the exactly-once read surface. Pruned columns only.
    planned_ids = [sid for sid, _ in shards]
    manifests = {sid: m for sid, m in lineage.load_manifests(out_dir).items()
                 if sid in set(planned_ids)}
    missing = [sid for sid in planned_ids if sid not in manifests]
    if missing:
        raise RuntimeError(f"shards missing manifests after run: {missing}")
    committed = {f"{sid:05d}" for sid in manifests}
    routed_ds = rd.read_parquet(
        str(out_dir / "routed"),
        columns=["event_class", "lang", "hour", "n_tokens"],
        partition_filter=PathPartitionFilter.of(
            lambda kv: kv.get("shard") in committed, style="hive"),
    )
    agg = aggregate_routed(routed_ds)
    agg_path = out_dir / "aggregates"
    agg.write_parquet(str(agg_path), mode="overwrite")

    total_rows = sum(m["row_count"] for m in manifests.values())
    metrics = {
        "shards_total": len(shards),
        "shards_run_this_invocation": done,
        "rows_routed": total_rows,
        "elapsed_sec": time.perf_counter() - t0,
        "aggregates_path": str(agg_path),
    }
    import json as _json
    mpath = out_dir / "_metrics.json"
    mpath.write_text(_json.dumps(metrics, indent=1))
    return metrics
