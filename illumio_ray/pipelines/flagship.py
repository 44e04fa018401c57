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

from ..functions.extract import extract_page_fields
from ..functions.hashing import combine_unordered, hash64
from ..stages.enrich import Enricher, broadcast_lookups
from ..stages.route import route_batch
from ..state import lineage


def default_enrich_concurrency() -> int:
    """Half the cluster CPUs: an actor pool that reserves every CPU
    starves the read/write task stages and the pipeline deadlocks."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, cpus // 2)


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


def run_shard(shard_id: int, fragments: list[str], out_dir: str | Path,
              lookup_kwargs: dict, enrich_concurrency=None,
              with_wire: bool = True) -> dict:
    """Process one shard end-to-end and commit its manifest."""
    out_dir = Path(out_dir)
    lineage.clean_uncommitted(out_dir, shard_id)
    tmp = lineage.shard_dir(out_dir, shard_id, tmp=True)
    final = lineage.shard_dir(out_dir, shard_id)

    pages = rd.read_parquet(fragments)
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
                 fail_after_shards: int | None = None) -> dict:
    """Full resumable run. ``fail_after_shards`` simulates a mid-run kill
    (used by the checkpoint-resume test)."""
    t0 = time.perf_counter()
    out_dir = Path(out_dir)
    fragments = lineage.list_fragments(pages_dir)
    if not fragments:
        return {"shards_total": 0, "shards_run_this_invocation": 0,
                "rows_routed": 0, "elapsed_sec": 0.0, "aggregates_path": None}
    shards = lineage.plan_shards(fragments, num_shards)
    todo = lineage.pending_shards(out_dir, shards) if resume else shards

    lookup_kwargs = broadcast_lookups(lang_path, host_path)
    done = 0
    for sid, frags in todo:
        run_shard(sid, frags, out_dir, lookup_kwargs,
                  enrich_concurrency=enrich_concurrency, with_wire=with_wire)
        done += 1
        if fail_after_shards is not None and done >= fail_after_shards:
            raise RuntimeError(f"simulated failure after {done} shards")

    # Final aggregate over committed routed output — pruned columns only.
    routed_ds = rd.read_parquet(
        str(out_dir / "routed"),
        columns=["event_class", "lang", "hour", "n_tokens"],
    )
    agg = aggregate_routed(routed_ds)
    agg_path = out_dir / "aggregates"
    agg.write_parquet(str(agg_path), mode="overwrite")

    manifests = lineage.load_manifests(out_dir)
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
