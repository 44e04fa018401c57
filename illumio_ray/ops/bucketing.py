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
    import pyarrow.dataset as pads

    d = Path(out_dir) / f"__bucket={bucket}"
    if not d.exists():
        return pa.table({})
    return pads.dataset(str(d)).to_table(columns=columns)


def _bucket_schema(out_dir: str | Path) -> pa.Schema:
    import pyarrow.dataset as pads

    return pads.dataset(str(Path(out_dir)), partitioning="hive").schema


@ray.remote
def _join_bucket(dir_a: str, dir_b: str, bucket: int, on: list[str],
                 cols_a: list[str] | None, cols_b: list[str] | None,
                 join_type: str, schema_a, schema_b) -> pa.Table:
    a = read_bucket(dir_a, bucket, cols_a)
    b = read_bucket(dir_b, bucket, cols_b)

    def _empty(schema: pa.Schema, cols: list[str] | None) -> pa.Table:
        t = schema.empty_table()
        return t.select(cols) if cols else t.drop_columns(["__bucket"])

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
