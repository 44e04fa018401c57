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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.extract import extract_page_fields
from ..functions.hashing import combine_unordered, hash64
from ..stages.enrich import Enricher, broadcast_lookups, make_task_enricher
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
                 enrich_concurrency=None, with_wire: bool = True,
                 enrich_mode: str = "task") -> rd.Dataset:
    """Lazy routed dataset from a pages dataset.

    ``enrich_mode="task"`` (default) fuses read→extract→enrich→route into
    one task chain (per-worker-process Enricher cache; no object-store hop,
    no pool ramp). ``"actor"`` runs the Enricher on an autoscaling actor
    pool — the right shape when per-actor state is expensive to build
    (models, indexes), kept for that case and exercised in tests."""
    ds = pages_ds.map_batches(
        extract_page_fields, batch_format="pyarrow", zero_copy_batch=True
    )
    if enrich_mode == "actor":
        if enrich_concurrency is None:
            enrich_concurrency = default_enrich_concurrency()
        ds = ds.map_batches(
            Enricher,
            fn_constructor_kwargs=lookup_kwargs,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=enrich_concurrency,
            num_cpus=1,
        )
    else:
        ds = ds.map_batches(
            make_task_enricher(**lookup_kwargs),
            batch_format="pyarrow",
            zero_copy_batch=True,
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


def _combine_partials(tbl: pa.Table) -> pa.Table:
    g = tbl.group_by(["sink", "lang", "hour"]).aggregate(
        [("n_docs_p", "sum"), ("sum_tokens_p", "sum")]
    )
    return pa.table({
        "sink": g["sink"], "lang": g["lang"], "hour": g["hour"],
        "n_docs_p": g["n_docs_p_sum"], "sum_tokens_p": g["sum_tokens_p_sum"],
    })


_EMPTY_AGG = pa.table({
    "sink": pa.array([], pa.string()), "lang": pa.array([], pa.string()),
    "hour": pa.array([], pa.timestamp("us")),
    "n_docs": pa.array([], pa.int64()),
    "sum_tokens": pa.array([], pa.int64()),
})


def aggregate_routed_table(routed_ds: rd.Dataset,
                           tree_threshold_blocks: int = 256) -> pa.Table:
    """Same result as :func:`aggregate_routed` but returned as an Arrow
    table, skipping the sort-based groupby shuffle: the group key space is
    tiny and bounded (sinks × langs × hours), so per-block partials are
    O(groups) rows and a driver-side combine is exact and cheap. When the
    partial count is large (many blocks × groups at 100 TB), one
    ``repartition`` tree step combines before the driver pull."""
    partials = routed_ds.map_batches(
        _partial_agg, batch_format="pyarrow", zero_copy_batch=True
    )
    try:
        n_in = routed_ds.input_files()
    except Exception:
        n_in = []
    if len(n_in) > tree_threshold_blocks:
        partials = partials.repartition(32).map_batches(
            _combine_partials, batch_format="pyarrow", zero_copy_batch=True)
    tables = [pa.table(b) for b in partials.iter_batches(batch_format="pyarrow")]
    if not tables:
        return _EMPTY_AGG
    g = _combine_partials(pa.concat_tables(tables))
    return pa.table({
        "sink": g["sink"], "lang": g["lang"], "hour": g["hour"],
        "n_docs": pc.cast(g["n_docs_p"], pa.int64()),
        "sum_tokens": pc.cast(g["sum_tokens_p"], pa.int64()),
    })


def _shard_stats_batch(t: pa.Table) -> pa.Table:
    """Per-batch summary: partial (sink, lang, hour) aggregate rows plus the
    batch's order-insensitive url content-hash carried on the first row
    (combine_unordered is sum mod 2^64, so partial sums compose)."""
    g = _partial_agg(t)
    h = combine_unordered(hash64(t["url"])) if t.num_rows else 0
    hash_col = np.zeros(g.num_rows, dtype=np.uint64)
    if g.num_rows:
        hash_col[0] = np.uint64(h)
    return g.append_column("url_hash_p", pa.array(hash_col, pa.uint64()))


def make_write_summarize(shard_tmp: Path):
    """Sink stage: each task writes its batch's rows into the shard tmp dir
    (hive layout, one file per event_class per batch — mirroring
    write_parquet(partition_cols)) and returns only the batch SUMMARY
    (partial aggregate + content hash + count). The pipeline's consumed
    output is therefore tiny, and write + stats happen in ONE pass over the
    data — the earlier design's separate stats re-read doubled the routed
    scan and added ~40% to end-to-end wall time."""
    shard_tmp = str(shard_tmp)

    def write_and_summarize(batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        # Content-derived filename → a Ray task retry (worker died after
        # writing, before returning its summary) overwrites the SAME file
        # instead of adding a duplicate under a fresh random name; the
        # exactly-once invariant survives task-level retries.
        # hash64 (polars-version-coupled) is safe here: the name only has
        # to be stable within ONE run — on resume, uncommitted shards are
        # swept wholesale and committed shards never recompute, so a
        # polars upgrade between runs can't break exactly-once (see the
        # artifact table in functions/hashing.py).
        content_id = combine_unordered(hash64(batch["url"])) if batch.num_rows else 0
        fname = f"part-{content_id:016x}-{batch.num_rows}.parquet"
        for cls in pc.unique(batch["event_class"]).to_pylist():
            sub = batch.filter(pc.equal(batch["event_class"], cls))
            d = os.path.join(shard_tmp, f"event_class={cls}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(sub.drop_columns(["event_class"]),
                           os.path.join(d, fname))
        return _shard_stats_batch(batch)

    return write_and_summarize


_EMPTY_SUMMARY = pa.table({
    "sink": pa.array([], pa.string()), "lang": pa.array([], pa.string()),
    "hour": pa.array([], pa.timestamp("us")),
    "n_docs_p": pa.array([], pa.int64()),
    "sum_tokens_p": pa.array([], pa.int64()),
    "url_hash_p": pa.array([], pa.uint64()),
})


def _reduce_summaries(tables: list[pa.Table]) -> tuple[int, int, pa.Table]:
    """(row_count, content hash, partial aggregate) from batch summaries."""
    tbl = pa.concat_tables(tables) if tables else _EMPTY_SUMMARY
    n = int(pc.sum(tbl["n_docs_p"]).as_py() or 0)
    h = combine_unordered(tbl["url_hash_p"].to_numpy(zero_copy_only=False))
    agg = _combine_partials(tbl)
    return n, h, agg


TARGET_READ_BLOCK_BYTES = 64 * 1024 * 1024


def _read_blocks_for(fragments: list[str], min_blocks: int = 1) -> int:
    """Block count sized from real fragment bytes. Ray's default parallelism
    heuristic shatters small fragments into micro-blocks, and every
    downstream stage (and the partitioned write: one file per block ×
    partition) inherits the fan-out — 49 k rows became 1498 output files.
    One block per ~64 MB compressed, floored at ``min_blocks`` so a small
    shard still spreads across the CPUs assigned to its pipeline (fragments
    split at row-group granularity)."""
    import os

    total = 0
    for f in fragments:
        try:
            total += os.path.getsize(f)
        except OSError:
            pass
    return max(min_blocks, len(fragments), total // TARGET_READ_BLOCK_BYTES)


def run_shard(shard_id: int, fragments: list[str], out_dir: str | Path,
              lookup_kwargs: dict, enrich_concurrency=None,
              with_wire: bool = True, min_blocks: int = 1,
              enrich_mode: str = "task",
              time_window: tuple | None = None) -> dict:
    """Process one shard end-to-end and commit its manifest."""
    out_dir = Path(out_dir)
    lineage.clean_uncommitted(out_dir, shard_id)
    tmp = lineage.shard_dir(out_dir, shard_id, tmp=True)
    final = lineage.shard_dir(out_dir, shard_id)

    pages = rd.read_parquet(
        fragments,
        override_num_blocks=_read_blocks_for(fragments, min_blocks))
    # fail-fast on upstream schema drift before any task is scheduled
    # (metadata-only; a crawl feed that changed a column type surfaces
    # here as one clear error, not a mid-shard task crash)
    from ..ops.validate import expect_schema
    from ..schema import PAGES_SCHEMA
    pages = expect_schema(
        pages, {f.name: f.type for f in PAGES_SCHEMA}, allow_extra=True)
    if time_window is not None:
        lo = pa.scalar(np.datetime64(time_window[0], "us"), pa.timestamp("us"))
        hi = pa.scalar(np.datetime64(time_window[1], "us"), pa.timestamp("us"))
        pages = pages.map_batches(
            lambda t: t.filter(pc.and_(pc.greater_equal(t["warc_ts"], lo),
                                       pc.less(t["warc_ts"], hi))),
            batch_format="pyarrow", zero_copy_batch=True)
    routed = build_routed(pages, lookup_kwargs, enrich_concurrency, with_wire,
                          enrich_mode=enrich_mode)
    # One pass: the sink stage writes partitioned files AND streams back
    # per-batch summaries (partial agg + hash); the summary is all the
    # driver ever pulls.
    summaries = routed.map_batches(
        make_write_summarize(tmp), batch_format="pyarrow",
        zero_copy_batch=True)
    tmp.mkdir(parents=True, exist_ok=True)
    batch_summaries = [
        pa.table(b) for b in summaries.iter_batches(batch_format="pyarrow")]
    tmp.rename(final)

    # The shard's partial-aggregate sidecar lands BEFORE the manifest (the
    # commit point): a committed shard always has its partial, so the final
    # aggregate is a driver combine of committed sidecars and never rescans
    # routed data.
    rows_out, content_hash, partial = _reduce_summaries(batch_summaries)
    lineage.write_partial(out_dir, shard_id, partial)
    # Dead-letter accounting (≙ the reference logging its drop-invalid
    # path, app/log_processor.py:344-356): rows_in from parquet footers
    # (no scan); dropped = parse failures (no <body>) plus, in windowed
    # incremental runs, rows outside the look-back window.
    import pyarrow.parquet as _pq
    rows_in = 0
    footer_errors = 0
    for f in fragments:
        try:
            rows_in += _pq.ParquetFile(f).metadata.num_rows
        except Exception:
            footer_errors += 1
    # An unreadable footer must surface as UNKNOWN, not as "no drops" —
    # silently skipping it would zero the dead-letter metric exactly when
    # input data went missing.
    manifest = {
        "shard_id": shard_id,
        "input_fragments": fragments,
        "row_count": rows_out,
        "rows_in": rows_in if footer_errors == 0 else None,
        "rows_dropped": (max(0, rows_in - rows_out)
                         if footer_errors == 0 else None),
        "footer_errors": footer_errors,
        "content_hash": content_hash,
    }
    lineage.write_manifest(out_dir, shard_id, manifest)
    from ..state.runlog import get_run_logger
    get_run_logger().info(
        f"shard {shard_id} committed",
        extra={"event": "shard_commit", "shard_id": shard_id,
               "rows": rows_out, "rows_dropped": manifest["rows_dropped"],
               "fragments": len(fragments)})
    return manifest


def _write_aggregate(out_dir: Path, manifests: dict) -> Path:
    """Combine committed shards' partial sidecars into the aggregate table
    and write it (single small file, replaced atomically enough for a
    driver-side artifact). Handles the zero-committed-shards case."""
    if manifests:
        partials = pa.concat_tables(lineage.read_partials(out_dir, manifests))
        g = _combine_partials(partials)
        agg_tbl = pa.table({
            "sink": g["sink"], "lang": g["lang"], "hour": g["hour"],
            "n_docs": pc.cast(g["n_docs_p"], pa.int64()),
            "sum_tokens": pc.cast(g["sum_tokens_p"], pa.int64()),
        })
    else:
        agg_tbl = _EMPTY_AGG
    agg_path = out_dir / "aggregates"
    if agg_path.exists():
        import shutil as _shutil
        _shutil.rmtree(agg_path)
    agg_path.mkdir(parents=True)
    import pyarrow.parquet as _pq
    _pq.write_table(agg_tbl, agg_path / "part-00000.parquet")
    from ..state.runlog import get_run_logger
    get_run_logger().info(
        "aggregate written",
        extra={"event": "aggregate_written", "path": str(agg_path),
               "groups": agg_tbl.num_rows,
               "shards_combined": len(manifests)})
    return agg_path


def run_incremental(pages_dir: str | Path, out_dir: str | Path,
                    lang_path: str, host_path: str,
                    fragments_per_shard: int = 16,
                    max_concurrent_shards: int = 4,
                    with_wire: bool = True,
                    enrich_mode: str = "task",
                    time_window: tuple | None = None,
                    heartbeat_interval: float = 10.0) -> dict:
    """Incremental ingestion (≙ the reference's poll-loop iteration,
    app/main.py:339-384): discover fragments, anti-join against committed
    manifests, process ONLY new fragments into fresh shards, refresh the
    aggregate over everything committed. Safe to call repeatedly as data
    arrives; committed shards are never reprocessed or invalidated.

    ``time_window=(lo, hi)`` applies the look-back-window predicate on
    warc_ts (≙ TIME_WINDOW_HOURS, app/s3_manager.py:212) inside the parse
    stage of the NEW shards only."""
    t0 = time.perf_counter()
    out_dir = Path(out_dir)
    fragments = lineage.list_fragments(pages_dir)
    lineage.sweep_stale(out_dir)
    todo = lineage.plan_incremental(out_dir, fragments, fragments_per_shard)

    lookup_kwargs = broadcast_lookups(lang_path, host_path)
    n_threads = max(1, min(max_concurrent_shards, max(len(todo), 1)))
    min_blocks = max(1, (2 * _cluster_cpus()) // n_threads)

    from concurrent.futures import ThreadPoolExecutor

    if todo:
        from ..state.heartbeat import Heartbeat

        with Heartbeat(out_dir, len(todo), heartbeat_interval) as hb, \
                ThreadPoolExecutor(n_threads) as ex:
            futs = [
                ex.submit(run_shard, sid, frags, out_dir, lookup_kwargs,
                          with_wire=with_wire, min_blocks=min_blocks,
                          enrich_mode=enrich_mode, time_window=time_window)
                for sid, frags in todo
            ]
            for f in futs:
                hb.shard_done(f.result())

    manifests = lineage.load_manifests(out_dir)
    agg_path = _write_aggregate(out_dir, manifests)

    return {
        "shards_total": len(manifests),
        "shards_run_this_invocation": len(todo),
        "new_fragments": sum(len(f) for _, f in todo),
        "rows_routed": sum(m["row_count"] for m in manifests.values()),
        "elapsed_sec": time.perf_counter() - t0,
        "aggregates_path": str(agg_path),
    }


def run_flagship(pages_dir: str | Path, out_dir: str | Path,
                 lang_path: str, host_path: str,
                 num_shards: int = 4, resume: bool = True,
                 enrich_concurrency=None, with_wire: bool = True,
                 fail_after_shards: int | None = None,
                 max_concurrent_shards: int = 4,
                 enrich_mode: str = "task",
                 heartbeat_interval: float = 10.0) -> dict:
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
    if enrich_concurrency is None and enrich_mode == "actor":
        enrich_concurrency = default_enrich_concurrency(n_threads)

    # Spread each shard's read across the CPUs its pipeline can use, even
    # when the shard has few fragments (splits at row-group granularity).
    min_blocks = max(1, (2 * _cluster_cpus()) // n_threads)

    from ..state.heartbeat import Heartbeat

    done = 0
    with Heartbeat(out_dir, len(todo), heartbeat_interval) as hb:
        if n_threads == 1:
            for sid, frags in todo:
                m = run_shard(sid, frags, out_dir, lookup_kwargs,
                              enrich_concurrency=enrich_concurrency,
                              with_wire=with_wire, min_blocks=min_blocks,
                              enrich_mode=enrich_mode)
                hb.shard_done(m)
                done += 1
                if fail_after_shards is not None and done >= fail_after_shards:
                    raise RuntimeError(
                        f"simulated failure after {done} shards")
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(n_threads) as ex:
                futs = [
                    ex.submit(run_shard, sid, frags, out_dir, lookup_kwargs,
                              enrich_concurrency=enrich_concurrency,
                              with_wire=with_wire, min_blocks=min_blocks,
                              enrich_mode=enrich_mode)
                    for sid, frags in todo
                ]
                for f in futs:
                    hb.shard_done(f.result())
                    done += 1

    # Final aggregate = driver combine of the COMMITTED shards' partial
    # sidecars (each O(groups) rows, computed distributed at shard commit).
    # No rescan of routed data; crash leftovers can't leak in because only
    # manifest-backed shards contribute. Committed shards from a PREVIOUS
    # plan (e.g. an earlier run with different num_shards) are removed so
    # the routed dir and the aggregate describe the same rows.
    planned_ids = [sid for sid, _ in shards]
    all_manifests = lineage.load_manifests(out_dir)
    for sid in set(all_manifests) - set(planned_ids):
        lineage.remove_shard(out_dir, sid)
    manifests = {sid: m for sid, m in all_manifests.items()
                 if sid in set(planned_ids)}
    missing = [sid for sid in planned_ids if sid not in manifests]
    if missing:
        raise RuntimeError(f"shards missing manifests after run: {missing}")
    agg_path = _write_aggregate(out_dir, manifests)

    total_rows = sum(m["row_count"] for m in manifests.values())
    metrics = {
        "shards_total": len(shards),
        "shards_run_this_invocation": done,
        "rows_routed": total_rows,
        "rows_dropped": sum(m.get("rows_dropped") or 0 for m in manifests.values()),
        "elapsed_sec": time.perf_counter() - t0,
        "aggregates_path": str(agg_path),
    }
    import json as _json
    mpath = out_dir / "_metrics.json"
    mpath.write_text(_json.dumps(metrics, indent=1))
    return metrics
