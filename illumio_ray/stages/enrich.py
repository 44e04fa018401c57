"""Enrichment actor pool — broadcast small-side lookup joins.

≙ the reference's stateful connection/context held per process (SURVEY.md
T5/J3): the PCE label context that arrives pre-joined in the reference's
records (src_labels/dst_labels, app/log_processor.py:452-453) is
externalized as two dimension tables, broadcast once via ``ray.put`` and
materialized into Arrow lookup arrays in each actor's ``__init__`` — never
re-shipped per batch, no shuffle for the small side.

Usage:
    refs = broadcast_lookups(lang_path, host_path)
    ds.map_batches(Enricher, fn_constructor_kwargs=refs,
                   batch_format="pyarrow", concurrency=N)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray


def broadcast_lookups(lang_path: str, host_path: str) -> dict:
    """Read the small sides once on the driver, put them in the object
    store, return constructor kwargs for Enricher."""
    lang_tbl = pq.read_table(lang_path)
    host_tbl = pq.read_table(host_path)
    return {"lang_ref": ray.put(lang_tbl), "host_ref": ray.put(host_tbl)}


class _ArrowLookup:
    """Vectorized dict: index_in(keys) → take(values); misses → null."""

    def __init__(self, keys: pa.Array, value_cols: dict[str, pa.Array]):
        self.keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        self.values = {
            n: (v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
            for n, v in value_cols.items()
        }

    def lookup(self, col, name: str) -> pa.Array:
        idx = pc.index_in(col, value_set=self.keys)
        return pc.take(self.values[name], idx)


_PROCESS_CACHE: dict = {}


def make_task_enricher(lang_ref, host_ref):
    """Task-mode enrichment: a plain function for ``map_batches`` that
    builds the Enricher once per WORKER PROCESS (module-level cache keyed
    by the broadcast refs) and reuses it across tasks — actor-like setup
    amortization without an actor pool.

    Why not always actors? An actor stage breaks Ray Data's operator
    fusion: read→extract→enrich→route collapse into one task chain in
    task mode (no object-store hop between stages), and the pool ramp
    (actors start one by one under autoscaling) throttles small and
    medium runs. Actor mode (see ``Enricher`` used directly with
    ``concurrency=``) is the right choice only when per-actor state is
    expensive — model weights, big indexes — not for two dictionary
    lookups; the multimodal ops keep the actor form."""

    def enrich(batch: pa.Table) -> pa.Table:
        key = (lang_ref, host_ref)
        e = _PROCESS_CACHE.get(key)
        if e is None:
            e = Enricher(lang_ref=lang_ref, host_ref=host_ref)
            _PROCESS_CACHE[key] = e
        return e(batch)

    return enrich


class Enricher:
    """Actor-pool stage: setup once in __init__, vectorized work per batch."""

    def __init__(self, lang_ref=None, host_ref=None,
                 lang_tbl: pa.Table | None = None, host_tbl: pa.Table | None = None):
        if lang_tbl is None:
            lang_tbl = ray.get(lang_ref)
        if host_tbl is None:
            host_tbl = ray.get(host_ref)
        self.lang = _ArrowLookup(
            lang_tbl["lang"],
            {"lang_name": lang_tbl["lang_name"], "lang_family": lang_tbl["lang_family"]},
        )
        self.host = _ArrowLookup(
            host_tbl["url_host"],
            {"host_category": host_tbl["host_category"], "host_rank": host_tbl["host_rank"]},
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        return (
            batch
            .append_column("lang_name", self.lang.lookup(batch["lang"], "lang_name"))
            .append_column("lang_family", self.lang.lookup(batch["lang"], "lang_family"))
            .append_column("host_category", self.host.lookup(batch["url_host"], "host_category"))
            .append_column("host_rank", self.host.lookup(batch["url_host"], "host_rank"))
        )
