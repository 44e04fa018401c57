"""Relational operators: filter/project, grouped aggregates with partial
combining, top-k, joins (broadcast, hash-partitioned, semi/anti), distinct,
time bucketing.

≙ the reference's aggregate/ordering surface (SURVEY.md §2.5/§2.6:
db_stats group-bys, s3_analyzer window stats, max-per-group, batch limits)
generalized to arbitrary tables.

Scale contract for every function here:
  - per-batch work is Arrow-vectorized (pyarrow.compute / Table.group_by);
  - grouped aggregates combine per batch BEFORE the all-to-all shuffle, so
    the exchange moves O(groups x blocks) partial rows, not O(rows);
  - small join sides are broadcast (zero shuffle); large-large joins
    hash-partition both sides on the key.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

# ---------------------------------------------------------------------------
# filter / project
# ---------------------------------------------------------------------------

def filter_batches(ds: rd.Dataset, predicate: Callable[[pa.Table], pa.ChunkedArray]) -> rd.Dataset:
    """Vectorized filter: predicate(batch) → boolean mask. Faster than
    ds.filter(row_fn), which is a per-row Python call."""
    return ds.map_batches(
        lambda t: t.filter(pc.fill_null(predicate(t), False)),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def with_columns(ds: rd.Dataset, builders: dict[str, Callable[[pa.Table], pa.Array]],
                 keep: Sequence[str] | None = None) -> rd.Dataset:
    """Append computed columns (vectorized); optionally project afterwards."""
    def fn(t: pa.Table) -> pa.Table:
        for name, build in builders.items():
            t = t.append_column(name, build(t))
        return t.select(list(keep)) if keep else t
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# grouped aggregates with a per-batch combiner
# ---------------------------------------------------------------------------

_PARTIALIZABLE = {"sum", "count", "min", "max", "mean"}


def grouped_agg(ds: rd.Dataset, keys: list[str],
                aggs: list[tuple[str, str, str]],
                mode: str = "driver") -> rd.Dataset:
    """groupby(keys) with specs (col, fn, out_name), fn in
    sum|count|min|max|mean. Combines inside map_batches first (arrow
    Table.group_by), so only O(groups × blocks) partial rows ever leave the
    map stage.

    Final reduce modes:
      - "driver" (default): stream partial batches to the driver and combine
        incrementally (memory stays O(groups)). Right whenever the group-key
        space is BOUNDED (lang, hour, segment, event type, …) — true at any
        input scale, and it skips a whole sort-shuffle (~seconds of fixed
        cost per query at bench scale).
      - "shuffle": distributed groupby reduce. Required when the key space
        grows with the data (user ids, urls, …) and the group table itself
        would not fit one machine.
      - "bucket": distributed reduce for HIGH-CARDINALITY keys (#groups ≈
        #rows): exchange on hash(keys) % adaptive_bucket_count instead of
        the keys themselves, then one vectorized arrow group_by per
        bucket — same semantics as "shuffle", much cheaper when Ray's
        composite-key aggregate would track millions of groups.
      - "auto": pick one of the above from a one-block cardinality sample
        (``choose_agg_mode`` — adaptive execution for callers that don't
        know their key shape)."""
    if mode == "auto":
        mode = choose_agg_mode(ds, keys)
    for _, fn, _ in aggs:
        if fn not in _PARTIALIZABLE:
            raise ValueError(f"unsupported agg fn: {fn}")

    # mean = sum/count computed from partials.
    partial_specs: list[tuple[str, str]] = []
    for col, fn, _ in aggs:
        if fn == "mean":
            partial_specs += [(col, "sum"), (col, "count")]
        else:
            partial_specs.append((col, fn))
    partial_specs = list(dict.fromkeys(partial_specs))

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(partial_specs)
        cols = {k: g[k] for k in keys}
        for col, fn in partial_specs:
            cols[f"__{col}_{fn}"] = g[f"{col}_{fn}"]
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    # re-aggregation function for a partial column
    _re_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

    def finalize(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        for col, fn, out in aggs:
            if fn == "mean":
                cols[out] = pc.divide(
                    pc.cast(t[f"__{col}_sum"], pa.float64()),
                    pc.cast(t[f"__{col}_count"], pa.float64()),
                )
            else:
                cols[out] = t[f"__{col}_{fn}"]
        return pa.table(cols)

    if mode == "driver":
        re_specs = [(f"__{col}_{fn}", _re_fn[fn]) for col, fn in partial_specs]
        renames = {f"__{col}_{fn}_{_re_fn[fn]}": f"__{col}_{fn}"
                   for col, fn in partial_specs}

        def combine(t: pa.Table) -> pa.Table:
            g = t.group_by(keys).aggregate(re_specs)
            return g.rename_columns(
                [renames.get(c, c) for c in g.column_names])

        acc: pa.Table | None = None
        buf: list[pa.Table] = []
        for b in partials.iter_batches(batch_format="pyarrow"):
            buf.append(pa.table(b))
            if len(buf) >= 64:
                pieces = buf + ([acc] if acc is not None else [])
                acc = combine(pa.concat_tables(pieces, promote_options="permissive"))
                buf = []
        pieces = buf + ([acc] if acc is not None else [])
        if not pieces:
            # empty input: zero groups with CORRECT types, derived from the
            # input schema (a hardcoded string/float64 guess breaks
            # downstream unions/appends that also see non-empty inputs)
            in_sch = ds.schema()
            base = getattr(in_sch, "base_schema", in_sch)
            type_of: dict[str, pa.DataType] = {}
            if base is not None and hasattr(base, "field"):
                type_of = {n: base.field(n).type for n in base.names}
            elif base is not None and hasattr(base, "names"):
                # PandasBlockSchema: names + numpy/pyarrow dtypes
                for n, t in zip(base.names, base.types):
                    try:
                        type_of[n] = t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t)
                    except (pa.ArrowNotImplementedError, TypeError):
                        type_of[n] = pa.string()
            fields: dict[str, pa.DataType] = {}
            for kcol in keys:
                fields[kcol] = type_of.get(kcol, pa.string())
            for col, fnm in partial_specs:
                src = type_of.get(col, pa.float64())
                fields[f"__{col}_{fnm}"] = (
                    pa.int64() if fnm == "count" else src)
            # zero rows: finalize directly (running agg kernels on an empty
            # table adds nothing and chokes on odd inferred types)
            empty = pa.table({n: pa.array([], t) for n, t in fields.items()})
            return rd.from_arrow(finalize(empty))
        acc = combine(pa.concat_tables(pieces, promote_options="permissive"))
        return rd.from_arrow(finalize(acc))

    ray_aggs = []
    if mode == "bucket":
        # For HIGH-CARDINALITY keys (#groups ≈ #rows — per-(part,supplier)
        # costs, per-(order,supplier) flags, candidate pairs), Ray's
        # composite-key aggregate degrades badly (measured 21 s vs 3 s on
        # 1.27M rows at 32 CPUs). Exchange on a bounded key-hash bucket
        # instead and finish each bucket with one vectorized arrow
        # group_by — same partition semantics (a key's rows meet in
        # exactly one bucket), a fraction of the cost.
        nb = adaptive_bucket_count(None)
        _re = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
        re_specs = [(f"__{col}_{fn}", _re[fn]) for col, fn in partial_specs]
        renames = {f"__{col}_{fn}_{_re[fn]}": f"__{col}_{fn}"
                   for col, fn in partial_specs}

        def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
            h = np.zeros(len(df), np.uint64)
            for k_ in keys:
                h = h * np.uint64(0x9E3779B97F4A7C15) + \
                    pd.util.hash_pandas_object(df[k_],
                                               index=False).to_numpy()
            return df.assign(__gb=(h % np.uint64(nb)).astype(np.int32))

        def combine_bucket(g: pd.DataFrame) -> pa.Table:
            t = pa.Table.from_pandas(g.drop(columns="__gb"),
                                     preserve_index=False)
            r = t.group_by(keys, use_threads=False).aggregate(re_specs)
            return finalize(r.rename_columns(
                [renames.get(c, c) for c in r.column_names]))

        bucketed = partials.map_batches(add_bucket, batch_format="pandas")
        out = bucketed.groupby("__gb").map_groups(combine_bucket,
                                                  batch_format="pandas")
        # the groupby's sort stage can emit empty-SCHEMA blocks on sparse
        # inputs (sf-small edge) which crash a downstream Dataset.join —
        # sanitize here so every bucket-mode output is join-safe
        return drop_empty_blocks(out)

    for col, fn in partial_specs:
        pname = f"__{col}_{fn}"
        if fn in ("sum", "count"):
            ray_aggs.append(Sum(pname, alias_name=pname))
        elif fn == "min":
            ray_aggs.append(Min(pname, alias_name=pname))
        elif fn == "max":
            ray_aggs.append(Max(pname, alias_name=pname))
    reduced = partials.groupby(keys).aggregate(*ray_aggs)

    return reduced.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def choose_agg_mode(ds: rd.Dataset, keys: list[str],
                    sample_rows: int = 50_000,
                    driver_max_groups: int = 20_000,
                    bucket_ratio: float = 0.25) -> str:
    """Adaptive-execution mode pick for ``grouped_agg``: estimate the
    group-key shape from ONE sampled block and choose the reduce plan
    the playbook prescribes (CLAUDE.md invariant: bounded → driver;
    grows-with-data but ≪ rows → shuffle; ≈ rows → bucket).

    Heuristic on the sampled distinct ratio r = distinct/sampled:
      - r ≥ ``bucket_ratio`` → "bucket" (keys ≈ rows: ids, hashes);
      - distinct ≤ ``driver_max_groups`` AND r small → "driver"
        (a bounded key space shows ~every value inside one block, so the
        sample distinct IS the global distinct to first order);
      - otherwise → "shuffle" (the conservative middle: sample distinct
        too large for comfort on the driver, ratio too low for bucket).
    Cost: one block materializes twice (once here, once in the real
    pass) — the standard price of sampling-based planning. Callers that
    know their key shape should pass the mode explicitly; "auto" is for
    generic/library call sites."""
    try:
        sample = ds.limit(sample_rows).take_batch(sample_rows,
                                                  batch_format="pyarrow")
    except ValueError:  # Ray raises on a fully-empty dataset
        return "driver"
    t = pa.table(sample)
    n = t.num_rows
    if n == 0:
        return "driver"
    distinct = t.select(keys).group_by(keys).aggregate([]).num_rows
    ratio = distinct / n
    if ratio >= bucket_ratio:
        return "bucket"
    if distinct <= driver_max_groups and ratio <= 0.05:
        return "driver"
    return "shuffle"


def rollup_agg(ds: rd.Dataset, keys: list[str],
               aggs: list[tuple[str, str, str]],
               mode: str = "driver") -> rd.Dataset:
    """``GROUP BY ROLLUP(keys...)``: the finest aggregate plus every
    prefix level up to the grand total, rolled-up key columns emitted as
    NULL (ANSI semantics). fn ∈ sum|count|min|max (the re-aggregable
    set — a rolled-up ``count`` re-combines with ``sum``).

    Scale shape: the INPUT is aggregated exactly once (one grouped_agg
    pass over the data, any mode); every coarser level re-aggregates the
    previous LEVEL's result, which is already group-sized — so rollup
    costs one extra tiny pass per level, never another scan of the input.
    The union of levels stays a lazy Dataset."""
    re_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _, fn, _ in aggs:
        if fn not in re_fn:
            raise ValueError(f"rollup_agg cannot re-aggregate fn: {fn}")

    finest = grouped_agg(ds, keys, aggs, mode=mode)
    if mode != "driver":
        # shuffle/bucket modes return a LAZY dataset whose plan contains
        # the full input aggregation — pin the (group-sized) result once
        # so the coarser levels and the final union never re-execute it
        finest = finest.materialize()
    fsch = finest.schema()
    fsch = getattr(fsch, "base_schema", fsch)
    key_types = {k: fsch.field(k).type for k in keys}
    levels = [finest]
    prev = finest
    for depth in range(len(keys) - 1, -1, -1):
        kept, rolled = keys[:depth], keys[depth:]
        specs = [(out, re_fn[fn], out) for _, fn, out in aggs]
        if kept:
            lv = grouped_agg(prev, kept, specs)
        else:  # grand total: one-batch reduce of the level-1 table
            lv = _one_batch_total(prev, specs)

        def pad(t: pa.Table, rolled=tuple(rolled), kt=key_types,
                order=tuple(keys), outs=tuple(o for _, _, o in aggs)):
            cols = {}
            for k in order:
                cols[k] = (t[k] if k not in rolled
                           else pa.nulls(t.num_rows, kt[k]))
            for o in outs:
                cols[o] = t[o]
            return pa.table(cols)

        levels.append(lv.map_batches(pad, batch_format="pyarrow",
                                     zero_copy_batch=True))
        prev = lv
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def _one_batch_total(ds: rd.Dataset, specs) -> rd.Dataset:
    """Grand-total reduce of an already-aggregated (small) Dataset: pull
    its partial rows into ONE batch via repartition(1), then combine."""
    def total(t: pa.Table) -> pa.Table:
        cols = {}
        for col, fn, out in specs:
            cols[out] = pa.array([getattr(pc, fn)(t[col]).as_py()])
        return pa.table(cols)

    return ds.repartition(1).map_batches(total, batch_format="pyarrow",
                                         zero_copy_batch=True)


def grouping_sets_agg(ds: rd.Dataset, keys: list[str],
                      sets: list[list[str]],
                      aggs: list[tuple[str, str, str]],
                      mode: str = "driver") -> rd.Dataset:
    """``GROUP BY GROUPING SETS(sets...)``: the input aggregates exactly
    once at the finest level (all ``keys``); every requested set
    re-aggregates that already-group-sized result, absent keys emitted
    as typed NULLs. fn ∈ sum|count|min|max (the re-aggregable set).
    ``cube_agg`` passes every subset; ``rollup_agg`` is the prefix chain
    (kept separate — its level-(k) input is the level-(k+1) result,
    one step cheaper than always re-aggregating the finest)."""
    re_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _, fn, _ in aggs:
        if fn not in re_fn:
            raise ValueError(f"grouping_sets_agg cannot re-aggregate: {fn}")
    for s in sets:
        unknown = [k for k in s if k not in keys]
        if unknown:
            raise ValueError(f"grouping set {s} has non-key columns "
                             f"{unknown}")

    finest = grouped_agg(ds, keys, aggs, mode=mode)
    if mode != "driver":
        # pin the group-sized finest result: every requested set and the
        # final union re-reads it, and a lazy shuffle plan would
        # re-execute the input aggregation each time
        finest = finest.materialize()
    fsch = finest.schema()
    fsch = getattr(fsch, "base_schema", fsch)
    key_types = {k: fsch.field(k).type for k in keys}
    specs = [(out, re_fn[fn], out) for _, fn, out in aggs]
    outs = tuple(o for _, _, o in aggs)

    levels = []
    for s in sets:
        if list(s) == list(keys):
            lv = finest
        elif s:
            lv = grouped_agg(finest, list(s), specs)
        else:
            lv = _one_batch_total(finest, specs)

        def pad(t: pa.Table, present=frozenset(s), kt=key_types,
                order=tuple(keys), outs=outs):
            cols = {}
            for k in order:
                cols[k] = (t[k] if k in present
                           else pa.nulls(t.num_rows, kt[k]))
            for o in outs:
                cols[o] = t[o]
            return pa.table(cols)

        levels.append(lv.map_batches(pad, batch_format="pyarrow",
                                     zero_copy_batch=True))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cube_agg(ds: rd.Dataset, keys: list[str],
             aggs: list[tuple[str, str, str]],
             mode: str = "driver") -> rd.Dataset:
    """``GROUP BY CUBE(keys...)``: every subset of the keys, via
    grouping_sets_agg (2^len(keys) sets — keep the key list short, as
    ANSI CUBE users do)."""
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_agg(ds, keys, sets, aggs, mode=mode)


def melt(ds: rd.Dataset, id_cols: list[str], value_cols: list[str],
         var_col: str = "metric", value_col: str = "val",
         value_type: pa.DataType | None = None) -> rd.Dataset:
    """UNPIVOT / melt: one output row per (input row × value column),
    ``var_col`` holding the source column name and ``value_col`` its
    value cast to a common type (default float64). Row-local and
    shuffle-free — each batch explodes independently with Arrow take +
    cast kernels; output order within a batch is column-major
    (all rows of value_cols[0], then [1], …), irrelevant to any
    downstream groupby and matched by UNION ALL oracles."""
    vt = value_type or pa.float64()

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols: dict = {}
        for c in id_cols:
            arr = t[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols[c] = pa.concat_arrays([arr] * len(value_cols)) \
                if len(value_cols) > 1 else arr
        names = pa.concat_arrays([
            pa.array([v] * n, pa.string()) for v in value_cols])
        vals = pa.concat_arrays([
            pc.cast(t[v].combine_chunks()
                    if isinstance(t[v], pa.ChunkedArray) else t[v], vt)
            for v in value_cols])
        cols[var_col] = names
        cols[value_col] = vals
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pivot_agg(ds: rd.Dataset, group_key: str, pivot_col: str,
              value_col: str, fn: str, values: list[str],
              mode: str = "driver",
              name_fmt: str = "{fn}_{v}") -> rd.Dataset:
    """PIVOT via conditional aggregation: one output row per
    ``group_key``, one column per entry of ``values`` holding
    ``fn(value_col) FILTER (WHERE pivot_col = v)`` — the SQL-standard
    reshape for bounded pivot domains (statuses, priorities, langs).

    ``values`` is explicit (ANSI PIVOT requires the IN list too): the
    output schema must be known up front, and at scale you never want a
    schema inferred from a full distinct scan. Pivot cells with no rows
    are NULL (0 for count). One grouped_agg over (group_key, pivot_col)
    — bounded × bounded — then a driver-side reshape of the tiny result."""
    finest = grouped_agg(ds, [group_key, pivot_col],
                         [(value_col, fn, "__v")], mode=mode)
    rows = finest.take_all()
    per_g: dict = {}
    for r in rows:
        per_g.setdefault(r[group_key], {})[r[pivot_col]] = r["__v"]
    # a null group key (Arrow group_by keeps it) sorts last, not TypeError
    gkeys = sorted(k for k in per_g if k is not None)
    if None in per_g:
        gkeys.append(None)
    cols: dict = {group_key: pa.array(gkeys)}
    for v in values:
        name = name_fmt.format(fn=fn, v=v)
        vals = [per_g[g].get(v) for g in gkeys]
        if fn == "count":
            cols[name] = pa.array([0 if x is None else int(x) for x in vals],
                                  pa.int64())
        else:
            cols[name] = pa.array(vals)
    return rd.from_arrow(pa.table(cols))


# ---------------------------------------------------------------------------
# top-k / distinct
# ---------------------------------------------------------------------------

def topk(ds: rd.Dataset, keys: list[str], k: int,
         descending: bool | list[bool] = True) -> rd.Dataset:
    """Top-k without a full global sort: per-block local top-k first, then a
    global sort over <= k*num_blocks survivors."""
    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    order = [(c, "descending" if d else "ascending") for c, d in zip(keys, descending)]

    def local(t: pa.Table) -> pa.Table:
        return t.sort_by(order).slice(0, k)

    pruned = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return pruned.sort(keys, descending=descending).limit(k)


def distinct(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """Distinct rows of a column subset via per-batch dedup + groupby."""
    def local(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols).aggregate([])
    return ds.map_batches(local, batch_format="pyarrow",
                          zero_copy_batch=True).groupby(cols).count().select_columns(cols)


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

def broadcast_join(ds: rd.Dataset, small: pa.Table, on: list[str],
                   join_type: str = "left outer") -> rd.Dataset:
    """Small-side join with zero shuffle: the dimension table rides the
    object store once (ray.put) and each batch arrow-joins against it
    (≙ reference enum/label lookups, SURVEY.md J2/J3)."""
    ref = ray.put(small)

    def join_batch(t: pa.Table) -> pa.Table:
        # task mode + per-worker-process cache: full parallelism and
        # operator fusion (an actor pool here capped the stage at its pool
        # size and paid ramp-up for a stateless Arrow join)
        s = _BROADCAST_CACHE.get(ref)
        if s is None:
            s = ray.get(ref)
            _BROADCAST_CACHE.clear()
            _BROADCAST_CACHE[ref] = s
        return t.join(s, keys=on, join_type=join_type)

    return ds.map_batches(join_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


_BROADCAST_CACHE: dict = {}


def semi_anti_join(ds: rd.Dataset, key_values, col: str, anti: bool = False) -> rd.Dataset:
    """Semi/anti join against a broadcast key set (≙ the reference's
    processed-keys anti-join, app/s3_manager.py:208-211)."""
    if isinstance(key_values, pa.ChunkedArray):
        keys_arr = key_values.combine_chunks()
    elif isinstance(key_values, pa.Array):
        keys_arr = key_values
    else:
        keys_arr = pa.array(key_values)
    ref = ray.put(keys_arr)

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.is_in(t[col], value_set=ray.get(ref)), False)
        if anti:
            mask = pc.invert(mask)
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def bloom_semi_anti_join(ds: rd.Dataset, key_values, col: str,
                         anti: bool = False, fpp: float = 0.01) -> rd.Dataset:
    """Semi/anti join with a Bloom pre-filter — EXACT results.

    The broadcast payload is primarily the bit array (~10 bits/key at
    fpp=0.01, vs 8+ bytes/key for the raw set): bloom-NEGATIVE rows are
    resolved definitively (kept for anti, dropped for semi); only
    bloom-POSITIVE rows (~match_rate + fpp of the input) consult the exact
    key set. At 10^12-row scale the exact-verify leg becomes a
    hash-partitioned join of just the positives against the key table —
    the bloom cuts that shuffle to the matching fraction; here the key set
    rides along for the verify since the sf key tables are small."""
    from ..functions.sketches import BloomFilter

    keys_arr = pa.array(key_values)
    bloom = BloomFilter(len(keys_arr), fpp).add_array(keys_arr)
    ref = ray.put((bloom, keys_arr))

    def fn(t: pa.Table) -> pa.Table:
        b, keys = _BROADCAST_CACHE.get(ref, (None, None))
        if b is None:
            b, keys = ray.get(ref)
            _BROADCAST_CACHE.clear()
            _BROADCAST_CACHE[ref] = (b, keys)
        col_arr = t[col]
        maybe = b.contains_array(col_arr.combine_chunks()
                                 if isinstance(col_arr, pa.ChunkedArray)
                                 else col_arr)
        in_set = np.zeros(t.num_rows, dtype=bool)
        pos = np.flatnonzero(maybe)
        if len(pos):
            # exact verify ONLY the bloom-positive subset — the point of
            # the pre-filter (a full-column is_in would make the bloom
            # pure overhead)
            subset = pc.take(col_arr, pa.array(pos, pa.int64()))
            hit = pc.fill_null(pc.is_in(subset, value_set=keys), False) \
                .to_numpy(zero_copy_only=False)
            in_set[pos[hit]] = True
        return t.filter(pa.array(~in_set if anti else in_set))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def deterministic_sample_per_group(ds: rd.Dataset, group_keys: list[str],
                                   id_col: str, n: int,
                                   seed: int = 0) -> rd.Dataset:
    """Stratified sample: n rows per group, selected by md5 rank of the row
    id — deterministic, engine-independent (the DuckDB oracle computes the
    identical md5 ordering), and resumable (re-runs pick the same rows).
    Distributed as top-k-per-group over the rank column: per-batch local
    prune, then the per-group exact head after one bounded shuffle."""
    import hashlib

    def add_rank(t: pa.Table) -> pa.Table:
        # crypto hash is inherently per-item; ~1µs/row, outside any regex
        # or join hot path
        rk = [hashlib.md5(f"{seed}:{v}".encode()).hexdigest()
              for v in t[id_col].to_pylist()]
        return t.append_column("__rk", pa.array(rk, pa.string()))

    ranked = ds.map_batches(add_rank, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = topk_per_group(ranked, group_keys, ["__rk"], n,
                         descending=[False])
    return out.map_batches(lambda t: t.drop_columns(["__rk"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def hash_mixture_sample(ds: rd.Dataset, rates: dict[str, float],
                        group_col: str, id_col: str,
                        default_rate: float = 0.0,
                        seed: int = 7) -> rd.Dataset:
    """Deterministic per-group Bernoulli sampling by hash threshold — the
    training-data MIXTURE primitive (source-weighted subsampling to a
    target composition). A row is kept iff the first 8 hex digits of
    md5('{seed}:{id}') sort below floor(rate_g · 16^8) in hex (rate ≥ 1
    keeps everything). Row-local and shuffle-free: no per-group counting
    pass, and the keep-set is identical under any engine or partitioning
    (resumable, and the DuckDB oracle states the same predicate).
    Expected-fraction semantics, not exact counts — use
    deterministic_sample_per_group for an exact n per group."""
    import hashlib

    thresh = {g: mixture_threshold_hex(r) for g, r in rates.items()}
    default_thresh = mixture_threshold_hex(default_rate)

    def fn(t: pa.Table) -> pa.Table:
        groups = t[group_col].to_pylist()
        ids = t[id_col].to_pylist()
        keep = []
        for g, v in zip(groups, ids):
            th = thresh.get(g, default_thresh)
            keep.append(th is None or
                        hashlib.md5(f"{seed}:{v}".encode())
                               .hexdigest()[:8] < th)
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def mixture_threshold_hex(rate: float) -> str | None:
    """8-hex-digit keep threshold for hash_mixture_sample; None = keep all
    (a rate of exactly 1.0 has no 8-digit upper bound)."""
    if rate >= 1.0:
        return None
    return format(max(int(rate * 16**8), 0), "08x")


def global_percent_rank(ds: rd.Dataset, value_col: str,
                        out_col: str = "pr",
                        ndigits: int = 6) -> rd.Dataset:
    """Exact global ``percent_rank() OVER (ORDER BY value)`` (ties share a
    rank) for a BOUNDED-cardinality value column (lengths, scores, counts).

    Scale shape: row count is unbounded but only DISTINCT VALUES ever
    reach the driver — per-block value histograms combine via grouped_agg
    (O(distinct) driver state), the cumulative below-count map broadcasts
    back, and each row is one searchsorted lookup:
    pr = #{rows with smaller value} / (N − 1). No sort, no shuffle of row
    data. For unbounded/continuous values use the t-digest quantile path
    instead (approximate)."""
    hist = grouped_agg(ds.select_columns([value_col]), [value_col],
                       [(value_col, "count", "__n")]).take_all()
    vals = np.array(sorted(h[value_col] for h in hist))
    cnts = np.array([h["__n"] for h in
                     sorted(hist, key=lambda h: h[value_col])],
                    dtype=np.int64)
    below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    total = int(cnts.sum())
    denom = float(max(total - 1, 1))

    def fn(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vals, v)
        pr = below[idx] / denom
        from ..functions.rounding import round_np
        return t.append_column(out_col,
                               pa.array(round_np(pr, ndigits), pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _grouped_rank_apply(ds: rd.Dataset, key: str, value_col: str,
                        out_col: str, rank_of, out_type,
                        ndigits: int | None) -> rd.Dataset:
    """Shared core of the exact per-group window-rank family
    (percent_rank / dense_rank / cume_dist): per-(key, value) histograms
    combine via grouped_agg (driver state O(groups × distinct values) —
    bounded-cardinality contract), ``rank_of(vals, cnts)`` maps each
    group's sorted distinct values to their rank statistic on the driver,
    the per-group tables broadcast once, and each row is one searchsorted
    lookup — no sort, no shuffle of row data. Rows with null value pass
    through with a null rank (the non-null value-column contract)."""
    hist = grouped_agg(ds.select_columns([key, value_col]),
                       [key, value_col],
                       [(value_col, "count", "__n")]).take_all()
    per_g: dict = {}
    for h in hist:
        if h[value_col] is None:
            continue
        per_g.setdefault(h[key], []).append((h[value_col], int(h["__n"])))
    pr_tables: dict = {}
    for g, pairs in per_g.items():
        pairs.sort()
        vals = np.array([v for v, _ in pairs])
        cnts = np.array([c for _, c in pairs], np.int64)
        pr_tables[g] = (vals, rank_of(vals, cnts).astype(np.float64))
    ref = ray.put(pr_tables)

    def fn(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_np

        m = _BROADCAST_CACHE.get(ref)
        if m is None:
            m = ray.get(ref)
            _BROADCAST_CACHE.clear()
            _BROADCAST_CACHE[ref] = m
        kv = t[key].to_numpy(zero_copy_only=False)
        vv = t[value_col].to_numpy(zero_copy_only=False)
        pr = np.full(t.num_rows, np.nan)
        for g in pd.unique(kv):  # distinct groups per batch: bounded
            tab = m.get(g)
            if tab is None:
                continue
            vals, prv = tab
            mask = (kv == g) & pd.notna(vv)
            pr[mask] = prv[np.searchsorted(vals, vv[mask])]
        isnan = np.isnan(pr)
        if ndigits is not None:
            out = pa.array(round_np(pr, ndigits), out_type, mask=isnan)
        else:
            out = pa.array(np.where(isnan, 0, pr).astype(np.int64),
                           out_type, mask=isnan)
        return t.append_column(out_col, out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def grouped_percent_rank(ds: rd.Dataset, key: str, value_col: str,
                         out_col: str = "pr",
                         ndigits: int = 6) -> rd.Dataset:
    """Exact ``percent_rank() OVER (PARTITION BY key ORDER BY value)`` —
    the per-group normalization a curation pass filters on ("keep the top
    X% per language"): raw quality scores aren't comparable across
    languages, per-group percentile ranks are.

    Same scale shape as global_percent_rank, grouped — see
    ``_grouped_rank_apply`` for the histogram/broadcast/searchsorted
    contract. Nulls get null rank (SQL window semantics treat NULL as a
    peer group; here the contract is a non-null value column — rows with
    null value are passed through with null pr)."""
    def rank_of(vals, cnts):
        below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        return below / float(max(int(cnts.sum()) - 1, 1))

    return _grouped_rank_apply(ds, key, value_col, out_col, rank_of,
                               pa.float64(), ndigits)


def grouped_dense_rank(ds: rd.Dataset, key: str, value_col: str,
                       out_col: str = "dr") -> rd.Dataset:
    """Exact ``dense_rank() OVER (PARTITION BY key ORDER BY value)``:
    ties share a rank and ranks have no gaps — the 1-based index of the
    row's value among its group's sorted DISTINCT values. Same
    bounded-distinct scale shape as grouped_percent_rank (only distinct
    values reach the driver; rows never shuffle)."""
    def rank_of(vals, cnts):
        return np.arange(1, len(vals) + 1, dtype=np.int64)

    return _grouped_rank_apply(ds, key, value_col, out_col, rank_of,
                               pa.int64(), None)


def grouped_cume_dist(ds: rd.Dataset, key: str, value_col: str,
                      out_col: str = "cd", ndigits: int = 6) -> rd.Dataset:
    """Exact ``cume_dist() OVER (PARTITION BY key ORDER BY value)``:
    fraction of the group's rows with value ≤ this row's value (ties
    share). Same bounded-distinct scale shape as grouped_percent_rank."""
    def rank_of(vals, cnts):
        return np.cumsum(cnts) / float(max(int(cnts.sum()), 1))

    return _grouped_rank_apply(ds, key, value_col, out_col, rank_of,
                               pa.float64(), ndigits)


def drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Ray's hash-shuffle aggregate can emit 0-row blocks with an EMPTY
    schema (no columns at all). Most downstream ops skip empty blocks, but
    a Dataset.join crashes when one reaches a join partition (pyarrow
    can't resolve the key FieldRef against a column-less table). Rebuild
    the dataset from the non-empty blocks only. Forces materialization —
    use on SMALL shuffle outputs (label tables, aggregates) that feed a
    join, not on payload data."""
    mat = ds.materialize()
    refs = [ref for bundle in mat.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks if meta.num_rows]
    if not refs:
        return mat
    return rd.from_arrow_refs(refs)


def hash_join(left: rd.Dataset, right: rd.Dataset, on: list[str],
              join_type: str = "inner", num_partitions: int | None = None) -> rd.Dataset:
    """Large-large join: Ray Data's hash-partitioned Dataset.join (both
    sides shuffled on the key). For skewed keys, salt before calling."""
    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
    return left.join(right, join_type=join_type, on=tuple(on),
                     num_partitions=num_partitions)


def auto_join(left: rd.Dataset, right: rd.Dataset, on: list[str],
              join_type: str = "inner",
              broadcast_limit_bytes: int = 64 << 20,
              num_partitions: int | None = None) -> rd.Dataset:
    """Adaptive join-strategy pick (the optimizer decision the engine's
    sketches inform): if the RIGHT side's in-memory size — Ray's
    size_bytes(), parquet/footer metadata on a fresh read, never a scan
    — fits under ``broadcast_limit_bytes``, materialize it once and
    broadcast (zero shuffle); otherwise fall back to the
    hash-partitioned large-large join. Result is identical either way;
    only data movement differs. Callers who know the right side is
    key-skewed should use skew_salted_join instead — size says nothing
    about skew."""
    size = right.size_bytes()
    if size is not None and size <= broadcast_limit_bytes:
        small = pa.concat_tables(
            [pa.table(b) for b in right.iter_batches(batch_format="pyarrow")])
        if small.num_rows == 0:
            small = _dataset_schema_table(right)
        # pa.Table.join spells it "left outer"; Dataset.join "left_outer"
        return broadcast_join(left, small, on,
                              join_type=join_type.replace("_", " "))
    return hash_join(left, right, on,
                     join_type=join_type.replace(" ", "_"),
                     num_partitions=num_partitions)


def _dataset_schema_table(ds: rd.Dataset) -> pa.Table:
    sch = ds.schema()
    return pa.table({n: pa.array([], t)
                     for n, t in zip(sch.names, sch.types)})


def salted_join(left: rd.Dataset, right: rd.Dataset, on: str,
                num_salts: int = 16,
                num_partitions: int | None = None) -> rd.Dataset:
    """Inner hash join under LEFT-side key skew (SURVEY.md §4): a hot key
    sends all its left rows to one join partition in a plain hash join.
    Salt the left side with a per-ROW salt (position-derived, so a hot
    key's rows spread over ``num_salts`` partitions) and replicate every
    right row once per salt, then join on (key, salt). Right rows grow
    ×num_salts — use when the right side is too big to broadcast but far
    smaller than the skewed left (the classic fact⋈dim-too-big-for-
    broadcast case); result equals the plain join, row for row."""
    import ray as _ray

    if num_partitions is None:
        num_partitions = max(8, int(_ray.cluster_resources().get("CPU", 8)))

    def salt_left(t: pa.Table) -> pa.Table:
        # scrambled-position salt: a multiplicative hash of the row
        # position decorrelates residues, so a periodic row layout (hot
        # key at every k-th position) still spreads across all salts —
        # plain `pos % num_salts` would collapse it onto one
        pos = np.arange(t.num_rows, dtype=np.uint64)
        s = (((pos * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
             % np.uint64(num_salts)).astype(np.int32)
        return t.append_column("__salt", pa.array(s, pa.int32()))

    def replicate_right(t: pa.Table) -> pa.Table:
        idx = pa.array(np.repeat(np.arange(t.num_rows), num_salts),
                       pa.int64())
        s = (np.tile(np.arange(num_salts, dtype=np.int64), t.num_rows)
             .astype(np.int32))
        return t.take(idx).append_column("__salt", pa.array(s, pa.int32()))

    lsalted = left.map_batches(salt_left, batch_format="pyarrow",
                               zero_copy_batch=True)
    rrep = right.map_batches(replicate_right, batch_format="pyarrow",
                             zero_copy_batch=True)
    j = lsalted.join(rrep, join_type="inner", on=(on, "__salt"),
                     num_partitions=num_partitions)
    return j.drop_columns(["__salt"])


def suggest_salts(ds: rd.Dataset, key: str, total: int,
                  hot_frac: float = 0.01,
                  max_factor: int = 64) -> dict:
    """Skew diagnosis for ``skew_salted_join``: find the keys holding
    ≥ ``hot_frac`` of all rows (EXACT, via the Misra-Gries + recount
    heavy-hitter pass — never shuffles the raw key column) and assign
    each a salt factor ≈ its excess over the hot threshold, capped at
    ``max_factor``. Keys absent from the map are not skewed and should
    not be salted (factor 1). ``total`` is the row count (parquet
    metadata at the call site — no extra scan)."""
    from ..functions.sketches import heavy_hitters

    hh = heavy_hitters(ds, key, hot_frac, total, out_col="__n")
    out: dict = {}
    for b in hh.iter_batches(batch_format="pyarrow"):
        for k, n in zip(b[key].to_pylist(), b["__n"].to_pylist()):
            out[k] = int(min(max_factor,
                             max(2, -(-int(n) // max(int(hot_frac * total),
                                                     1)))))
    return out


def skew_salted_join(left: rd.Dataset, right: rd.Dataset, on: str,
                     salt_map: dict,
                     num_partitions: int | None = None) -> rd.Dataset:
    """Skew-aware inner join: ONLY the hot keys in ``salt_map`` (from
    ``suggest_salts``) are salted — a hot key's left rows spread over its
    per-key factor, and each right row replicates only as many times as
    ITS key's factor (cold keys: once, salt 0). Replication cost is
    Σ(factor over hot right rows) instead of ``salted_join``'s uniform
    ×num_salts over the whole right side; result equals the plain inner
    join row for row."""
    import ray as _ray

    if num_partitions is None:
        num_partitions = max(8, int(_ray.cluster_resources().get("CPU", 8)))
    ref = ray.put(dict(salt_map))

    def _factors(t: pa.Table) -> np.ndarray:
        m = ray.get(ref)
        kv = t[on].to_numpy(zero_copy_only=False)
        return pd.Series(kv).map(m).fillna(1).to_numpy(np.int64)

    def salt_left(t: pa.Table) -> pa.Table:
        f = _factors(t)
        # scrambled position (see salted_join): periodic layouts must not
        # collapse a hot key's rows onto one salt residue
        pos = np.arange(t.num_rows, dtype=np.uint64)
        scr = ((pos * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            .astype(np.int64)
        s = (scr % f).astype(np.int32)
        return t.append_column("__salt", pa.array(s, pa.int32()))

    def replicate_right(t: pa.Table) -> pa.Table:
        f = _factors(t)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), f)
        # salt 0..f_i-1 within each row's replica run
        starts = np.cumsum(f) - f
        s = (np.arange(int(f.sum()), dtype=np.int64)
             - np.repeat(starts, f)).astype(np.int32)
        return t.take(pa.array(idx, pa.int64())) \
            .append_column("__salt", pa.array(s, pa.int32()))

    lsalted = left.map_batches(salt_left, batch_format="pyarrow",
                               zero_copy_batch=True)
    rrep = right.map_batches(replicate_right, batch_format="pyarrow",
                             zero_copy_batch=True)
    j = lsalted.join(rrep, join_type="inner", on=(on, "__salt"),
                     num_partitions=num_partitions)
    return j.drop_columns(["__salt"])


def asof_broadcast_join(ds: rd.Dataset, right: pa.Table, left_ts: str,
                        right_ts: str, value_map: dict[str, str],
                        direction: str = "backward") -> rd.Dataset:
    """As-of join: for each left row, the latest right row with
    ``right[right_ts] <= left[left_ts]`` (direction="backward") or the
    earliest with ``right[right_ts] >= left[left_ts]``
    (direction="forward"); no match → nulls.

    Ray Data has no as-of join; this is the broadcast form — the right side
    is sorted once on the driver, shipped via ray.put, and each batch does a
    vectorized searchsorted (no shuffle, no per-row Python). Valid while the
    right side fits in memory; at scale use ``asof_partitioned_join``
    (range-partitions both sides on time with boundary-seed overlap).

    value_map: {output_col: right_col} columns to carry from the match."""
    right = right.filter(pc.is_valid(right[right_ts]))  # null ts can't match
    right = right.sort_by([(right_ts, "ascending")]).combine_chunks()
    ref = ray.put(right)

    def fn(t: pa.Table) -> pa.Table:
        r = _ASOF_CACHE.get(ref)
        if r is None:
            r = ray.get(ref)
            _ASOF_CACHE.clear()  # one pinned right side per worker
            _ASOF_CACHE[ref] = r
        r_ts = r[right_ts].to_numpy(zero_copy_only=False)
        l_ts = t[left_ts].to_numpy(zero_copy_only=False)
        if direction == "forward":
            idx = np.searchsorted(r_ts, l_ts, side="left")
            ok = (idx < len(r_ts)) & ~pd.isna(l_ts)
            idx = np.where(ok, idx, 0)
        else:
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            # null left ts sorts NaT-largest in searchsorted → no-match
            ok = (idx >= 0) & ~pd.isna(l_ts)
        valid = pa.array(ok)
        take = pa.array(np.where(ok, idx, 0), pa.int64())
        out = t
        for out_name, rcol in value_map.items():
            col = r[rcol].combine_chunks() if isinstance(r[rcol], pa.ChunkedArray) else r[rcol]
            v = pc.if_else(valid, pc.take(col, take), pa.scalar(None, col.type))
            out = out.append_column(out_name, v)
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_ASOF_CACHE: dict = {}


def asof_partitioned_join(left: rd.Dataset, right: rd.Dataset, left_ts: str,
                          right_ts: str, value_map: dict[str, str],
                          direction: str = "backward",
                          num_partitions: int | None = None,
                          boundaries: list[int] | None = None) -> rd.Dataset:
    """Range-partitioned as-of join — same semantics as
    ``asof_broadcast_join`` but neither side is ever broadcast or held on
    the driver: the scale path for a right side that is itself fact-sized.

    Both sides range-partition on epoch-µs time (boundaries from a
    deterministic per-block stride sample of the left side unless pinned
    by the caller), then one groupby exchange co-locates each time range
    and the same vectorized searchsorted kernel runs per partition.
    BOUNDARY OVERLAP is carried as at most ONE seed row per partition:
    backward = the latest right row strictly before the partition's lower
    bound (any older right row is dominated by it for every left row in
    the partition), forward = the earliest right row at/after the upper
    bound. Seeds come from a per-block per-partition argmax/argmin partial
    (bounded: ≤ blocks × partitions narrow rows), combined with a prefix/
    suffix scan over O(partitions) driver rows, and ride to workers via
    one ray.put. Shuffle volume is O(left + right); empty partitions are
    handled by the scan (a partition with no right rows still gets the
    correct seed from earlier/later ranges).

    ``value_map``: {output_col: right_col} columns carried from the match;
    the right side is pruned to right_ts + those columns before anything
    moves. Null left timestamps produce null matches (same as broadcast);
    null right timestamps are dropped (can't match)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    backward = direction == "backward"
    rcols = list(dict.fromkeys([right_ts, *value_map.values()]))

    def _types(ds: rd.Dataset) -> tuple[list[str], dict[str, pa.DataType]]:
        sch = ds.schema()
        base = getattr(sch, "base_schema", sch)
        if isinstance(base, pa.Schema):
            return list(base.names), {n: base.field(n).type
                                      for n in base.names}
        # pandas-backed blocks report numpy dtypes; object dtype means
        # strings in every caller here (text/ids) — same mapping Ray uses
        out = {}
        for n, t in zip(base.names, base.types):
            if isinstance(t, pa.DataType):
                out[n] = t
            elif getattr(t, "kind", None) == "O":
                out[n] = pa.string()
            else:
                out[n] = pa.from_numpy_dtype(t)
        return list(base.names), out

    lnames, ltypes = _types(left)
    _, rtypes_all = _types(right)
    rtypes = {c: rtypes_all[c] for c in rcols}
    reserved = {"__p", "__side"} | {f"__r_{c}" for c in rcols}
    if reserved & set(lnames):
        raise ValueError(f"left columns collide with internals: "
                         f"{reserved & set(lnames)}")

    right = right.map_batches(
        lambda t: t.filter(pc.is_valid(t[right_ts])).select(rcols),
        batch_format="pyarrow", zero_copy_batch=True)

    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8))
                             if ray.is_initialized() else 8)
    if boundaries is None:
        # stride sample: ≤16 deterministic probes per block — O(blocks)
        # driver rows (two-level sampling is the next rung if blocks ever
        # number in the millions)
        def sample_block(t: pa.Table) -> pa.Table:
            us = ts_as_us(t[left_ts]).drop_null()
            n = len(us)
            if n == 0:
                return pa.table({"us": pa.array([], pa.int64())})
            idx = pa.array(np.arange(0, n, max(1, n // 16), dtype=np.int64))
            return pa.table({"us": pc.take(us, idx)})

        samp_parts = [pa.table(b) for b in left.map_batches(
            sample_block, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow")]
        samp = (pa.concat_tables(samp_parts) if samp_parts
                else pa.table({"us": pa.array([], pa.int64())}))
        vals = np.sort(samp["us"].to_numpy(zero_copy_only=False))
        if len(vals) == 0:
            bounds = np.array([], np.int64)
        else:
            qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
            bounds = np.unique(np.quantile(vals, qs).astype(np.int64))
    else:
        bounds = np.unique(np.asarray(boundaries, dtype=np.int64))
    npart = len(bounds) + 1

    # ---- per-partition boundary seeds -----------------------------------
    def seed_partials(t: pa.Table) -> pa.Table:
        us = ts_as_us(t[right_ts]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = np.searchsorted(bounds, us, side="right").astype(np.int64)
        if len(us) == 0:
            return t.slice(0, 0).append_column("__p",
                                               pa.array([], pa.int32()))
        order = np.lexsort((us, p))
        ps = p[order]
        keep = (np.r_[ps[1:] != ps[:-1], True] if backward
                else np.r_[True, ps[1:] != ps[:-1]])
        idx = order[keep]
        return t.take(pa.array(idx, pa.int64())).append_column(
            "__p", pa.array(ps[keep].astype(np.int32), pa.int32()))

    pt_parts = [pa.table(b) for b in right.map_batches(
        seed_partials, batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_format="pyarrow")]
    pt = pa.concat_tables(pt_parts) if pt_parts else None
    seed_tables: dict[int, pa.Table] = {}
    if pt is not None and pt.num_rows:
        us_all = ts_as_us(pt[right_ts]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p_all = pt["__p"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((us_all, p_all))
        ps = p_all[order]
        keep = (np.r_[ps[1:] != ps[:-1], True] if backward
                else np.r_[True, ps[1:] != ps[:-1]])
        champ_p, champ_idx = ps[keep], order[keep]
        champ_us = us_all[champ_idx]
        run_idx, run_us = -1, 0
        scan = range(npart) if backward else range(npart - 1, -1, -1)
        for p in scan:
            if run_idx >= 0:
                seed_tables[p] = pt.take(
                    pa.array([run_idx], pa.int64())).select(rcols)
            j = int(np.searchsorted(champ_p, p))
            if j < len(champ_p) and champ_p[j] == p:
                better = (champ_us[j] >= run_us if backward
                          else champ_us[j] <= run_us)
                if run_idx < 0 or better:
                    run_idx, run_us = int(champ_idx[j]), int(champ_us[j])
    seeds_ref = ray.put(seed_tables)

    # ---- pad + union + one exchange --------------------------------------
    def pad_left(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in lnames}
        for c in rcols:
            cols[f"__r_{c}"] = pa.nulls(t.num_rows, rtypes[c])
        us = pc.fill_null(ts_as_us(t[left_ts]), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cols["__p"] = pa.array(
            np.searchsorted(bounds, us, side="right").astype(np.int32),
            pa.int32())
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8), pa.int8())
        return pa.table(cols)

    def pad_right(t: pa.Table) -> pa.Table:
        cols = {n: pa.nulls(t.num_rows, ltypes[n]) for n in lnames}
        for c in rcols:
            cols[f"__r_{c}"] = t[c]
        us = ts_as_us(t[right_ts]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cols["__p"] = pa.array(
            np.searchsorted(bounds, us, side="right").astype(np.int32),
            pa.int32())
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int8), pa.int8())
        return pa.table(cols)

    merged = left.map_batches(pad_left, batch_format="pyarrow",
                              zero_copy_batch=True).union(
        right.map_batches(pad_right, batch_format="pyarrow",
                          zero_copy_batch=True))

    def kernel(g: pa.Table) -> pa.Table:
        seeds = _BROADCAST_CACHE.get(seeds_ref)
        if seeds is None:
            seeds = ray.get(seeds_ref)
            _BROADCAST_CACHE.clear()
            _BROADCAST_CACHE[seeds_ref] = seeds
        is_left = pc.equal(g["__side"], pa.scalar(0, pa.int8()))
        lt = g.filter(is_left)
        rt = g.filter(pc.invert(is_left))
        out_cols = {n: lt[n] for n in lnames}
        n_l = lt.num_rows
        r_tbl = pa.table({c: rt[f"__r_{c}"] for c in rcols})
        p = int(g["__p"][0].as_py())
        seed = seeds.get(p)
        if seed is not None:
            r_tbl = pa.concat_tables([seed, r_tbl]).combine_chunks()
        if n_l == 0 or r_tbl.num_rows == 0:
            for out_name, rc in value_map.items():
                out_cols[out_name] = pa.nulls(n_l, rtypes[rc])
            return pa.table(out_cols)
        l_valid = pc.is_valid(lt[left_ts]).to_numpy(zero_copy_only=False)
        l_us = pc.fill_null(ts_as_us(lt[left_ts]), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        r_us = ts_as_us(r_tbl[right_ts]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(r_us, kind="stable")
        r_tbl = r_tbl.take(pa.array(order, pa.int64()))
        r_us = r_us[order]
        if backward:
            idx = np.searchsorted(r_us, l_us, side="right") - 1
            ok = (idx >= 0) & l_valid
        else:
            idx = np.searchsorted(r_us, l_us, side="left")
            ok = (idx < len(r_us)) & l_valid
        valid = pa.array(ok)
        take = pa.array(np.where(ok, idx, 0), pa.int64())
        for out_name, rc in value_map.items():
            col = r_tbl[rc]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out_cols[out_name] = pc.if_else(valid, pc.take(col, take),
                                            pa.scalar(None, col.type))
        return pa.table(out_cols)

    return merged.groupby("__p").map_groups(kernel, batch_format="pyarrow")


def salted_topk_per_group(ds: rd.Dataset, group_keys: list[str],
                          order_keys: list[str], k: int,
                          descending: list[bool], salt_col: str,
                          num_salts: int = 16) -> rd.Dataset:
    """Top-k per group under KEY SKEW (SURVEY.md §4): a hot group's rows
    would all land on one reducer in a plain groupby. Phase 1 groups by
    (key, salt) where salt = hash(salt_col) % num_salts, so a hot key's
    rows spread over ``num_salts`` reducers and each keeps only k; phase 2
    re-groups the ≤ k × num_salts survivors per key — a tiny exchange."""
    from ..functions.hashing import salt_column

    def add_salt(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__salt", pa.array(salt_column(t[salt_col], num_salts), pa.int32()))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    phase1 = topk_per_group(salted, group_keys + ["__salt"], order_keys, k,
                            descending)
    phase2 = topk_per_group(phase1, group_keys, order_keys, k, descending)
    return phase2.map_batches(lambda t: t.drop_columns(["__salt"]),
                              batch_format="pyarrow", zero_copy_batch=True)


def topk_per_group(ds: rd.Dataset, group_keys: list[str],
                   order_keys: list[str], k: int,
                   descending: list[bool]) -> rd.Dataset:
    """Top-k rows within each group (≙ SQL ROW_NUMBER() OVER (PARTITION BY
    …) <= k). Per-batch local prune first — only k rows per (batch, group)
    enter the shuffle — then an exact per-group top-k after the groupby."""
    ascending = [not d for d in descending]
    order = [(c, "descending" if d else "ascending")
             for c, d in zip(order_keys, descending)]

    def local(t: pa.Table) -> pa.Table:
        # Arrow-native prune (no pandas round-trip): sort by the order keys,
        # gather each group's row indices with a list aggregate, keep the
        # first k per group (O(groups) slicing, not O(rows)), one take.
        # NULL group keys form their own group (SQL window semantics).
        if t.num_rows <= k:
            return t
        s = t.sort_by(order)
        idx = s.select(group_keys).append_column(
            "__i", pa.array(np.arange(s.num_rows), pa.int64()))
        g = idx.group_by(group_keys, use_threads=False).aggregate([("__i", "list")])
        lists = g["__i_list"]
        take = np.concatenate([
            np.asarray(lists[i].values[:k])
            for i in range(len(lists))]) if len(lists) else np.array([], np.int64)
        return s.take(pa.array(np.sort(take), pa.int64()))

    pruned = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)

    def per_group(g: pa.Table) -> pa.Table:
        return g.sort_by(order).slice(0, k)

    return pruned.groupby(group_keys).map_groups(per_group, batch_format="pyarrow")


def range_join_count(left: rd.Dataset, right: rd.Dataset, left_ts: str,
                     right_ts: str, window_sec: float, key_col: str,
                     out_col: str = "n_nearby",
                     num_partitions: int = 8) -> rd.Dataset:
    """Band range join: for every left row, count right rows with
    ``|right_ts - left_ts| <= window_sec`` (inner semantics — left rows
    with zero matches are absent, like the SQL non-equi join + GROUP BY).

    Ray Data has no range join; the distributed form buckets both sides to
    ``floor(ts / window)``: a left row can only match right rows in its own
    or the two adjacent buckets, so left rows explode to 3 probe rows, the
    exchange is a plain hash-partitioned equi-join on the bucket id, and
    the exact |dt| predicate runs vectorized per joined batch. Shuffle
    volume O(3·|L| + |R|) — never a time-cross-product. Skewed time
    buckets (flash crowds) can be salted like any other hot key."""
    w_us = int(window_sec * 1_000_000)
    _as_us = ts_as_us

    def probes(t: pa.Table) -> pa.Table:
        b = _as_us(t[left_ts]).to_numpy(zero_copy_only=False) // w_us
        idx = np.repeat(np.arange(t.num_rows), 3)
        off = np.tile(np.array([-1, 0, 1], dtype=np.int64), t.num_rows)
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column("__bkt", pa.array(b[idx] + off, pa.int64()))

    def bucket_right(t: pa.Table) -> pa.Table:
        ts_us = _as_us(t[right_ts])
        b = ts_us.to_numpy(zero_copy_only=False) // w_us
        return pa.table({"__bkt": pa.array(b, pa.int64()), "__rts": ts_us})

    probed = left.map_batches(probes, batch_format="pyarrow",
                              zero_copy_batch=True)
    bucketed = right.map_batches(bucket_right, batch_format="pyarrow",
                                 zero_copy_batch=True)
    joined = hash_join(probed, bucketed, on=["__bkt"],
                       num_partitions=num_partitions)

    def in_window(t: pa.Table) -> pa.Table:
        dt = pc.abs(pc.subtract(t["__rts"], _as_us(t[left_ts])))
        return t.filter(pc.less_equal(dt, pa.scalar(w_us, pa.int64())))

    filtered = joined.map_batches(in_window, batch_format="pyarrow",
                                  zero_copy_batch=True)
    # per-left-key counts: key space grows with the data → shuffle reduce
    return grouped_agg(filtered.select_columns([key_col]), [key_col],
                       [(key_col, "count", out_col)], mode="bucket")


def interval_overlap_join(left: rd.Dataset, right: rd.Dataset,
                          l_id: str, l_start: str, l_end: str,
                          r_id: str, r_start: str, r_end: str,
                          cell_us: int,
                          num_partitions: int = 8) -> rd.Dataset:
    """Interval-overlap join: pairs (l_id, r_id) where
    [l_start, l_end] ∩ [r_start, r_end] ≠ ∅ (closed-interval
    ``s_a <= e_b AND s_b <= e_a`` semantics). Ray Data has no interval
    join; the distributed form is grid-cell banding:

      - each interval explodes to the cells floor(start/cell) ..
        floor(end/cell) it touches (fan-out = span/cell + 1; pick
        ``cell_us`` near the typical span so fan-out stays ~2);
      - a hash-partitioned equi-join on the cell id replaces the
        non-equi predicate — overlapping intervals MUST share a cell;
      - the exact overlap predicate runs vectorized per joined batch;
      - duplicates (a pair sharing several cells) are eliminated
        shuffle-free by the REPORTING-CELL rule: a pair is emitted only
        from the cell containing max(l_start, r_start) — exactly one
        cell per pair qualifies, so no global pair distinct is needed.

    Timestamps or int64 µs accepted; ts columns normalize through
    ts_as_us first."""
    cell = np.int64(cell_us)

    def explode(id_col: str, s_col: str, e_col: str, tag: str):
        def fn(t: pa.Table) -> pa.Table:
            s = ts_as_us(t[s_col]).to_numpy(zero_copy_only=False)
            e = ts_as_us(t[e_col]).to_numpy(zero_copy_only=False)
            if np.any(e < s):
                bad = int(np.flatnonzero(e < s)[0])
                raise ValueError(
                    f"interval_overlap_join: inverted interval at row "
                    f"{bad} of a '{tag}'-side block (end < start: "
                    f"{int(e[bad])} < {int(s[bad])}) — the closed-interval "
                    f"contract requires start <= end")
            c0 = s // cell
            n = (e // cell - c0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(s)), n)
            offs = np.concatenate([np.arange(k) for k in n]) if len(n) \
                else np.array([], dtype=np.int64)
            ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({
                f"id_{tag}": pa.array(ids[idx]),
                f"s_{tag}": pa.array(s[idx], pa.int64()),
                f"e_{tag}": pa.array(e[idx], pa.int64()),
                "__cell": pa.array(c0[idx] + offs, pa.int64()),
            })
        return fn

    la = left.map_batches(explode(l_id, l_start, l_end, "a"),
                          batch_format="pyarrow", zero_copy_batch=True)
    rb = right.map_batches(explode(r_id, r_start, r_end, "b"),
                           batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(la, rb, on=["__cell"],
                       num_partitions=num_partitions)

    def overlap(t: pa.Table) -> pa.Table:
        sa = t["s_a"].to_numpy(zero_copy_only=False)
        ea = t["e_a"].to_numpy(zero_copy_only=False)
        sb = t["s_b"].to_numpy(zero_copy_only=False)
        eb = t["e_b"].to_numpy(zero_copy_only=False)
        c = t["__cell"].to_numpy(zero_copy_only=False)
        keep = (sa <= eb) & (sb <= ea) & (np.maximum(sa, sb) // cell == c)
        return pa.table({"id_a": t["id_a"].filter(pa.array(keep)),
                         "id_b": t["id_b"].filter(pa.array(keep))})

    return joined.map_batches(overlap, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# time bucketing (≙ s3_analyzer window stats / db_stats rate windows)
# ---------------------------------------------------------------------------

def adaptive_bucket_count(n_rows: int | None, floor: int = 64,
                          target_rows: int = 1_000_000) -> int:
    """Bucket count for keyed-window partitioning, sized from data AND
    cluster instead of a constant: a fixed count caps reduce parallelism
    on big clusters and makes each bucket materialize rows/constant rows
    (an OOM at 10^9+ events). Rule, pinned by test:

        max(floor, 4 x cluster CPUs, ceil(n_rows / target_rows))

    so every bucket stays under ~target_rows rows and there are always
    enough buckets to feed every core. The bucket id is only a
    partitioning artifact — any count yields identical results."""
    cpus = int(ray.cluster_resources().get("CPU", 1)) if ray.is_initialized() else 1
    n = max(floor, 4 * cpus)
    if n_rows:
        n = max(n, -(-int(n_rows) // target_rows))
    return n


def keyed_window(ds: rd.Dataset, key_col: str,
                 window_fn: Callable[[pd.DataFrame], pd.DataFrame],
                 num_buckets: int | None = None,
                 n_rows: int | None = None) -> rd.Dataset:
    """Run an ordered/stateful per-key window function distributed: rows
    hash-partition by a BUCKET of keys (hash(key) % P) so each map_groups
    call receives whole keys and can compute the window vectorized over
    the bucket. A key's rows never split across buckets, so per-key state
    never leaves its group. P comes from adaptive_bucket_count unless
    pinned by the caller."""
    from ..functions.hashing import hash64

    if num_buckets is None:
        # n_rows=None → Dataset.count(); on a fresh parquet read that is
        # footer metadata only (no scan) — callers mid-pipeline should
        # pass an estimate instead
        num_buckets = adaptive_bucket_count(
            n_rows if n_rows is not None else ds.count())

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (hash64(t[key_col]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__b", pa.array(b, pa.int32()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)
    return bucketed.groupby("__b").map_groups(window_fn, batch_format="pandas")


def cohort_retention(ds: rd.Dataset, key_col: str, ts_col: str) -> rd.Dataset:
    """Cohort retention matrix — the canonical product-analytics rollup:
    cohort = each key's first active day, day_n = days since that first
    day, cell = DISTINCT active keys. Returns (cohort 'YYYY-MM-DD',
    day_n, n_users).

    Scale shape: ONE exchange total. Events reduce per batch to distinct
    (key, epoch-day) narrow ints, hash-partition by a bucket of keys
    (whole keys per bucket, sessionize's partition), and each bucket
    computes first-seen, day offsets AND partial (cohort, day_n) cell
    counts locally — no join, no second shuffle. The final combine is
    over the bounded cohorts × horizon cell table, so it
    driver-combines. Cohort day rides the exchange as int32; the
    'YYYY-MM-DD' label is minted on the driver-sized result."""
    from ..functions.hashing import hash64

    nb = adaptive_bucket_count(None)

    def add_day(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.divide(ts_as_us(t[ts_col]), 86_400_000_000),
                    pa.int32())
        out = pa.table({key_col: t[key_col], "__d": d})
        # local dedup before the exchange: at most one (key, day) row
        # per batch crosses the wire
        out = out.group_by([key_col, "__d"]).aggregate([])
        b = (hash64(out[key_col]) % np.uint64(nb)).astype(np.int32)
        return out.append_column("__b", pa.array(b, pa.int32()))

    days = ds.select_columns([key_col, ts_col]).map_batches(
        add_day, batch_format="pyarrow", zero_copy_batch=True)

    def cell_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([key_col, "__d"])
        first = g.groupby(key_col)["__d"].transform("min")
        cells = (pd.DataFrame({"__cohort": first,
                               "day_n": g["__d"] - first})
                 .groupby(["__cohort", "day_n"], sort=False).size())
        idx = cells.index
        return pd.DataFrame({
            "__cohort": idx.get_level_values(0).to_numpy(np.int32),
            "day_n": idx.get_level_values(1).to_numpy(np.int64),
            "n_p": cells.to_numpy(np.int64),
        })

    cells = days.groupby("__b").map_groups(cell_partials,
                                           batch_format="pandas")
    agg = grouped_agg(cells, ["__cohort", "day_n"],
                      [("n_p", "sum", "n_users")], mode="driver")

    def label(t: pa.Table) -> pa.Table:
        cohort_ts = pc.cast(pc.cast(t["__cohort"], pa.date32()),
                            pa.timestamp("s"))
        return pa.table({
            "cohort": pc.strftime(cohort_ts, format="%Y-%m-%d"),
            "day_n": pc.cast(t["day_n"], pa.int64()),
            "n_users": t["n_users"],
        })

    return agg.map_batches(label, batch_format="pyarrow",
                           zero_copy_batch=True)


def scd2_history(ds: rd.Dataset, key_col: str, state_col: str,
                 ts_col: str, order_cols: list[str] | None = None,
                 num_buckets: int | None = None,
                 n_rows: int | None = None) -> rd.Dataset:
    """Slowly-changing-dimension type-2 history from a change-event
    stream: per key, collapse consecutive rows with an unchanged
    ``state_col`` and emit one validity interval per state run —
    (key, state, valid_from, valid_to, is_current), valid_to NULL on the
    open (current) interval. The warehouse-standard dimension-history
    operator (Kimball SCD type 2), built on the same whole-key bucket
    partition as sessionize: a key's rows never split across buckets, so
    run detection is a single vectorized pass per bucket and no state
    crosses the exchange. Ordering within a key is (ts, *order_cols) —
    pass a unique tiebreaker (event id) for deterministic output under
    equal timestamps."""
    order_cols = list(order_cols or [])

    def history(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, *order_cols])
        k = g[key_col].to_numpy()
        s = g[state_col].to_numpy()
        ts = g[ts_col].to_numpy()
        if len(k) == 0:
            return pd.DataFrame({key_col: pd.Series([], dtype=g[key_col].dtype),
                                 "state": pd.Series([], dtype=object),
                                 "valid_from": pd.Series([], dtype=ts.dtype),
                                 "valid_to": pd.Series([], dtype=ts.dtype),
                                 "is_current": pd.Series([], dtype=bool)})
        change = np.empty(len(k), dtype=bool)
        change[0] = True
        change[1:] = (k[1:] != k[:-1]) | (s[1:] != s[:-1])
        starts = np.flatnonzero(change)
        vf = ts[starts]
        ku = k[starts]
        # valid_to = the NEXT change's valid_from when it belongs to the
        # same key, else open interval
        vt = np.empty(len(starts), dtype=ts.dtype)
        same_key = np.empty(len(starts), dtype=bool)
        same_key[:-1] = ku[1:] == ku[:-1]
        same_key[-1] = False
        vt[:-1] = vf[1:]
        out = pd.DataFrame({key_col: ku, "state": s[starts],
                            "valid_from": vf, "valid_to": vt,
                            "is_current": ~same_key})
        out.loc[~same_key, "valid_to"] = pd.NaT
        return out

    return keyed_window(ds, key_col, history, num_buckets=num_buckets,
                        n_rows=n_rows)


def ts_as_us(col) -> pa.ChunkedArray:
    """Timestamp column → int64 epoch-µs. Normalizes to µs BEFORE the int
    cast: a raw int64 cast yields the column's native unit (ns/ms/s), which
    would silently misscale bucket ids / window arithmetic downstream."""
    if pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.timestamp("us"))
    return pc.cast(col, pa.int64())


def time_bucket(ds: rd.Dataset, ts_col: str, unit: str = "hour",
                out_col: str = "bucket") -> rd.Dataset:
    return with_columns(ds, {out_col: lambda t: pc.floor_temporal(t[ts_col], unit=unit)})


def sliding_window_counts(ds: rd.Dataset, ts_col: str, window_sec: int,
                          hop_sec: int, out_ts: str = "win_us",
                          out_n: str = "n_events") -> rd.Dataset:
    """Hopping/sliding window counts: windows of ``window_sec`` starting
    every ``hop_sec`` (window_sec must be a multiple of hop_sec). Each
    event belongs to window_sec/hop_sec windows; the explode happens on a
    NARROW (window-index) column after per-batch partial counting, so the
    exchange is O(windows × blocks) rows, not O(events × overlap).
    Window start is emitted as int64 epoch-µs (tz-unambiguous on every
    engine)."""
    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec")
    overlap = window_sec // hop_sec
    hop_us = hop_sec * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        idx = ts_as_us(t[ts_col]).to_numpy(zero_copy_only=False) // hop_us
        # count per hop-bucket first (dense within a batch), THEN explode
        # the bucket counts to their `overlap` covering windows
        buckets, counts = np.unique(idx, return_counts=True)
        offs = np.arange(overlap, dtype=np.int64)
        win = (buckets[:, None] - offs[None, :]).ravel()
        n = np.repeat(counts, overlap)
        return pa.table({out_ts: pa.array(win * hop_us, pa.int64()),
                         "__n": pa.array(n, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return grouped_agg(partials, [out_ts], [("__n", "sum", out_n)])


def snapshot_diff(old: rd.Dataset, new: rd.Dataset, keys: list[str],
                  compare: list[str],
                  num_partitions: int | None = None) -> rd.Dataset:
    """Keyed change-data-capture between two snapshots of the same table
    shape: FULL OUTER hash join on ``keys``, then per-row classification —
    ``added`` (key only in new), ``removed`` (key only in old),
    ``changed`` (key in both, any ``compare`` column differs, null-safe).
    Unchanged rows are DROPPED: at scale the diff is the small output and
    the snapshots are the big inputs, so nothing beyond the changed keys
    ever reaches the driver (generalizes the reference's
    processed-vs-listed reconciliation, app/s3_manager.py:208-211, from
    set membership to value-level drift).

    Output columns: keys…, ``status``, then ``old_<c>`` / ``new_<c>`` per
    compare column (nulls on the absent side). Each side must be unique
    per key (pre-aggregate first — same contract as SQL FULL OUTER diff).
    """
    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def mark(side: str):
        def _m(t: pa.Table) -> pa.Table:
            cols = {f"__{side}_{k}": t[k] for k in keys}
            for c in compare:
                cols[f"{side}_{c}"] = t[c]
            cols[f"__{side}"] = pa.array(np.ones(len(t), np.int8))
            return pa.table(cols)
        return _m

    lhs = drop_empty_blocks(old.map_batches(mark("old"),
                            batch_format="pyarrow", zero_copy_batch=True))
    rhs = drop_empty_blocks(new.map_batches(mark("new"),
                            batch_format="pyarrow", zero_copy_batch=True))
    joined = lhs.join(rhs, join_type="full_outer",
                      num_partitions=num_partitions,
                      on=tuple(f"__old_{k}" for k in keys),
                      right_on=tuple(f"__new_{k}" for k in keys))

    def classify(t: pa.Table) -> pa.Table:
        in_old = pc.is_valid(t["__old"])
        in_new = pc.is_valid(t["__new"])
        # null-safe inequality on any compare column
        diff = pa.array(np.zeros(len(t), np.bool_))
        for c in compare:
            a, b = t[f"old_{c}"], t[f"new_{c}"]
            ne = pc.fill_null(pc.not_equal(a, b), False)
            nullness = pc.xor(pc.is_valid(a), pc.is_valid(b))
            diff = pc.or_(diff, pc.or_(ne, nullness))
        status = pc.if_else(
            pc.and_(in_old, in_new),
            pc.if_else(diff, "changed", pa.scalar(None, pa.string())),
            pc.if_else(in_new, "added", "removed"))
        # Ray coalesces the key into the LEFT column name on full_outer
        cols = {k: t[f"__old_{k}"] for k in keys}
        cols["status"] = status
        for c in compare:
            cols[f"old_{c}"] = t[f"old_{c}"]
            cols[f"new_{c}"] = t[f"new_{c}"]
        return pa.table(cols).filter(pc.is_valid(status))

    return joined.map_batches(classify, batch_format="pyarrow",
                              zero_copy_batch=True)


def grouped_linreg(ds: rd.Dataset, keys: list[str], x: str, y: str,
                   ndigits: int = 2) -> pa.Table:
    """Per-group ordinary-least-squares fit of ``y = slope·x + intercept``
    (SQL regr_slope(y, x) / regr_intercept(y, x)), rounded
    half-away-from-zero to ``ndigits``. Thin selection over
    ops/stats.bivariate_stats — two shuffle-free centered passes whose
    moments agree with SQL engines to ~1e-14 relative (the earlier
    one-pass Σxy − Σx·Σy/n form cancelled catastrophically at 1e4-value
    magnitudes and capped the safe rounding at 2 digits)."""
    from ..functions.rounding import round_np
    from .stats import bivariate_stats

    t = bivariate_stats(ds, x, y, by=keys)
    cols: dict[str, pa.Array] = {k: t[k] for k in keys}
    for name in ("slope", "intercept"):
        cols[name] = pa.array(round_np(
            t[name].to_numpy(zero_copy_only=False), ndigits),
            pa.float64(), from_pandas=True)
    return pa.table(cols)


def weighted_sample(ds: rd.Dataset, id_col: str, weight_col: str,
                    k: int) -> rd.Dataset:
    """Weighted random sample WITHOUT REPLACEMENT of k rows, one pass, no
    shuffle: A-Res (Efraimidis & Spirakis 2006) — each row gets key
    ln(u)/w and the k largest keys win, which draws each row with
    probability proportional to its weight. u is DETERMINISTIC
    (md5(id) → uniform in (0,1)), so the sample is identical on any
    engine, any partitioning, any run — same reproducibility contract as
    the md5 train/val split. Per-batch local top-k prunes to ≤ k rows per
    block before the tiny global reduce (rel.topk), so only O(k·blocks)
    rows ever leave the map stage. Weights must be > 0."""
    import hashlib

    def add_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        u = np.fromiter(
            ((int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) + 0.5)
             / 4294967296.0 for v in ids),
            dtype=np.float64, count=len(ids))
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("__ares", pa.array(np.log(u) / w))

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)
    return topk(keyed, ["__ares"], k).drop_columns(["__ares"])


def exact_quantile_disc(ds: rd.Dataset, col: str, qs: list[float],
                        num_bins: int = 512,
                        collect_limit: int = 200_000,
                        max_passes: int = 8) -> list[float]:
    """EXACT discrete quantiles (SQL quantile_disc: the element at
    0-indexed rank ceil(n·q)−1) over an unbounded column WITHOUT
    collecting it: iterative histogram refinement. Each pass is one
    map-reduce — every block histograms the values inside each quantile's
    current half-open range, the driver sums the per-block counts,
    locates the bucket holding the target rank, and narrows that
    quantile's range ×num_bins. When a range holds ≤ collect_limit values
    the survivors are pulled and the rank read off directly. log_512(n)
    passes (2 passes cover 10¹⁰ rows at the default limit) — the exact
    counterpart to the mergeable t-digest (approximate) and the
    driver-collect small path (doc_chars_quantiles). All quantiles share
    each pass's scan. Values must be numeric, nulls ignored."""
    # pass 0: global n / min / max (single tiny reduce)
    def nmm(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"n": [len(v)], "lo": [float(v.min())],
                         "hi": [float(v.max())]})

    parts = [pa.table(b) for b in ds.map_batches(
        nmm, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow")]
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:  # every block all-null/NaN → no quantiles exist
        return [float("nan")] * len(qs)
    allp = pa.concat_tables(nonempty)
    n = int(pc.sum(allp["n"]).as_py())
    if n == 0:
        return [float("nan")] * len(qs)
    gmin = float(pc.min(allp["lo"]).as_py())
    gmax = float(pc.max(allp["hi"]).as_py())

    ranks = [max(0, int(np.ceil(n * q)) - 1) for q in qs]
    return _exact_rank_values(ds, col, ranks, n, gmin, gmax,
                              num_bins, collect_limit, max_passes)


def exact_quantile_cont(ds: rd.Dataset, col: str, qs: list[float],
                        num_bins: int = 512,
                        collect_limit: int = 200_000,
                        max_passes: int = 8) -> list[float]:
    """EXACT interpolated quantiles (SQL quantile_cont / median: linear
    interpolation at position (n−1)·q) with the same no-collect histogram
    refinement as exact_quantile_disc: both bracketing order statistics
    resolve in the shared passes, then the driver interpolates two
    scalars."""
    def nmm(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"n": [len(v)], "lo": [float(v.min())],
                         "hi": [float(v.max())]})

    parts = [pa.table(b) for b in ds.map_batches(
        nmm, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow")]
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:  # every block all-null/NaN → no quantiles exist
        return [float("nan")] * len(qs)
    allp = pa.concat_tables(nonempty)
    n = int(pc.sum(allp["n"]).as_py())
    if n == 0:
        return [float("nan")] * len(qs)
    gmin = float(pc.min(allp["lo"]).as_py())
    gmax = float(pc.max(allp["hi"]).as_py())

    pos = [(n - 1) * q for q in qs]
    ranks = sorted({r for p in pos
                    for r in (int(np.floor(p)), int(np.ceil(p)))})
    vals = dict(zip(ranks, _exact_rank_values(
        ds, col, ranks, n, gmin, gmax, num_bins, collect_limit,
        max_passes)))
    out = []
    for p in pos:
        lo, hi = vals[int(np.floor(p))], vals[int(np.ceil(p))]
        f = p - np.floor(p)
        out.append(float(lo + f * (hi - lo)))
    return out


def _exact_rank_values(ds: rd.Dataset, col: str, ranks: list[int],
                       n: int, gmin: float, gmax: float,
                       num_bins: int, collect_limit: int,
                       max_passes: int) -> list[float]:
    """Core of the histogram-refinement selection: the element at each
    0-indexed global rank (over the sorted non-null column), one shared
    scan per pass for all ranks."""
    # per-rank state: (target rank within range, lo, hi_excl, done value)
    state = [{"k": k, "lo": gmin,
              "hi": float(np.nextafter(gmax, np.inf)), "n": n,
              "val": None} for k in ranks]

    for _ in range(max_passes):
        active = [i for i, s in enumerate(state)
                  if s["val"] is None and s["n"] > collect_limit]
        if not active:
            break
        ranges = [(i, state[i]["lo"], state[i]["hi"]) for i in active]

        def hist(t: pa.Table, ranges=ranges) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            rows_i, rows_c = [], []
            for i, lo, hi in ranges:
                m = v[(v >= lo) & (v < hi)]
                c, _ = np.histogram(m, bins=num_bins, range=(lo, hi))
                rows_i.append(i)
                rows_c.append(c.astype(np.int64))
            return pa.table({"qi": pa.array(rows_i, pa.int32()),
                             "counts": pa.array(rows_c)})

        sums: dict[int, np.ndarray] = {i: np.zeros(num_bins, np.int64)
                                       for i in active}
        for b in ds.map_batches(hist, batch_format="pyarrow",
                                zero_copy_batch=True
                                ).iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            for qi, cnts in zip(t["qi"].to_pylist(), t["counts"].to_pylist()):
                sums[qi] += np.asarray(cnts, np.int64)
        for i in active:
            s = state[i]
            cum = np.cumsum(sums[i])
            b = int(np.searchsorted(cum, s["k"] + 1))
            edges = np.linspace(s["lo"], s["hi"], num_bins + 1)
            s["k"] -= int(cum[b - 1]) if b else 0
            s["n"] = int(sums[i][b])
            s["lo"], s["hi"] = float(edges[b]), float(edges[b + 1])
            if s["hi"] <= np.nextafter(s["lo"], np.inf):
                s["val"] = s["lo"]  # range collapsed to one float

    # final: collect each small surviving range once (shared pass)
    pending = [(i, state[i]["lo"], state[i]["hi"])
               for i, s in enumerate(state) if s["val"] is None]
    if pending:
        def survivors(t: pa.Table, pending=pending) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            ii, vv = [], []
            for i, lo, hi in pending:
                m = v[(v >= lo) & (v < hi)]
                ii.extend([i] * len(m))
                vv.extend(m.tolist())
            return pa.table({"qi": pa.array(ii, pa.int32()),
                             "v": pa.array(vv, pa.float64())})

        got: dict[int, list] = {i: [] for i, _, _ in pending}
        for b in ds.map_batches(survivors, batch_format="pyarrow",
                                zero_copy_batch=True
                                ).iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            for qi, v in zip(t["qi"].to_pylist(), t["v"].to_pylist()):
                got[qi].append(v)
        for i, _, _ in pending:
            vs = np.sort(np.array(got[i]))
            state[i]["val"] = float(vs[state[i]["k"]])
    return [s["val"] for s in state]


def exact_quantile_disc_by(ds: rd.Dataset, key: str, col: str,
                           q: float | list[float],
                           num_bins: int = 256,
                           collect_limit: int = 200_000,
                           max_passes: int = 8) -> pa.Table:
    """Per-group EXACT discrete quantile(s) (quantile_disc semantics: the
    group's element at 0-indexed rank ceil(n·q)−1) for a BOUNDED group
    key, without collecting any group's values: the same iterative
    histogram refinement as exact_quantile_disc, with every group's —
    and every requested quantile's — candidate range narrowed in the
    SAME shared pass over the column (``q`` may be a list: winsorize's
    p5+p95 cost one set of scans, not two). Driver state is
    O(groups × qs); per pass the exchange is O(groups × qs × num_bins)
    counts. Nulls ignored. Returns (key, q<percent>...) with one row per
    group and one column per requested quantile."""
    qs = [q] if isinstance(q, (int, float)) else list(q)
    # pass 0: per-group n / min / max — bounded keys → driver combine
    base = grouped_agg(ds, [key], [(col, "count", "n"),
                                   (col, "min", "lo"),
                                   (col, "max", "hi")]).take_all()
    state: dict = {}  # (group, q-index) → refinement state
    groups: list = []
    for r in base:
        n = int(r["n"])
        if n == 0:
            continue
        groups.append(r[key])
        for j, qq in enumerate(qs):
            state[(r[key], j)] = {
                "k": max(0, int(np.ceil(n * qq)) - 1),
                "lo": float(r["lo"]),
                "hi": float(np.nextafter(float(r["hi"]), np.inf)),
                "n": n, "val": None}

    for _ in range(max_passes):
        active = {gj: (s["lo"], s["hi"]) for gj, s in state.items()
                  if s["val"] is None and s["n"] > collect_limit}
        if not active:
            break

        def hist(t: pa.Table, active=active) -> pa.Table:
            kv = t[key].to_numpy(zero_copy_only=False)
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            gs, js, cs = [], [], []
            for (g, j), (lo, hi) in active.items():
                m = v[(kv == g) & (v >= lo) & (v < hi)]
                c, _ = np.histogram(m, bins=num_bins, range=(lo, hi))
                gs.append(g)
                js.append(j)
                cs.append(c.astype(np.int64))
            return pa.table({"g": pa.array(gs),
                             "j": pa.array(js, pa.int32()),
                             "counts": pa.array(cs)})

        sums = {gj: np.zeros(num_bins, np.int64) for gj in active}
        for b in ds.map_batches(hist, batch_format="pyarrow",
                                zero_copy_batch=True
                                ).iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            for g, j, cnts in zip(t["g"].to_pylist(), t["j"].to_pylist(),
                                  t["counts"].to_pylist()):
                sums[(g, j)] += np.asarray(cnts, np.int64)
        for gj in active:
            s = state[gj]
            cum = np.cumsum(sums[gj])
            bi = int(np.searchsorted(cum, s["k"] + 1))
            edges = np.linspace(s["lo"], s["hi"], num_bins + 1)
            s["k"] -= int(cum[bi - 1]) if bi else 0
            s["n"] = int(sums[gj][bi])
            s["lo"], s["hi"] = float(edges[bi]), float(edges[bi + 1])
            if s["hi"] <= np.nextafter(s["lo"], np.inf):
                s["val"] = s["lo"]

    pending = {gj: (s["lo"], s["hi"]) for gj, s in state.items()
               if s["val"] is None}
    if pending:
        def survivors(t: pa.Table, pending=pending) -> pa.Table:
            kv = t[key].to_numpy(zero_copy_only=False)
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            gs, js, vv = [], [], []
            for (g, j), (lo, hi) in pending.items():
                m = v[(kv == g) & (v >= lo) & (v < hi)]
                gs.extend([g] * len(m))
                js.extend([j] * len(m))
                vv.extend(m.tolist())
            return pa.table({"g": pa.array(gs),
                             "j": pa.array(js, pa.int32()),
                             "v": pa.array(vv, pa.float64())})

        got = {gj: [] for gj in pending}
        for b in ds.map_batches(survivors, batch_format="pyarrow",
                                zero_copy_batch=True
                                ).iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            for g, j, v in zip(t["g"].to_pylist(), t["j"].to_pylist(),
                               t["v"].to_pylist()):
                got[(g, j)].append(v)
        for gj in pending:
            vs = np.sort(np.array(got[gj]))
            state[gj]["val"] = float(vs[state[gj]["k"]])

    ks = sorted(set(groups))
    cols: dict = {key: pa.array(ks)}
    for j, qq in enumerate(qs):
        out_name = f"q{int(round(qq * 100)):02d}"
        cols[out_name] = pa.array([state[(g, j)]["val"] for g in ks],
                                  pa.float64())
    return pa.table(cols)


def grouped_string_agg(ds: rd.Dataset, key: str, col: str, out: str,
                       sep: str = ",") -> rd.Dataset:
    """collect_list / string_agg family: per group, the values of ``col``
    sorted and joined into one string (SQL string_agg(col, sep ORDER BY
    col)). Group cardinality is unbounded (≈ one group per key value), so
    the exchange runs on hash(key) %% adaptive buckets — the bucket-mode
    rule from grouped_agg — and each bucket builds its groups' lists with
    one vectorized pandas groupby. A group's rows meet in exactly one
    bucket, so lists are complete by construction. Per-group output size
    grows with group size — this is the one aggregate whose OUTPUT is as
    big as its input, so it shares the facts' partitioning rather than a
    driver combine."""
    nb = adaptive_bucket_count(None)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key], index=False).to_numpy()
        return df.assign(__gb=(h % np.uint64(nb)).astype(np.int32))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(col, kind="mergesort")
        s = g.groupby(key, sort=False)[col].agg(
            lambda v: sep.join(map(str, v)))
        return pa.table({key: pa.array(s.index.to_numpy()),
                         out: pa.array(s.to_numpy(), pa.string())})

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")
    res = bucketed.groupby("__gb").map_groups(per_bucket,
                                              batch_format="pandas")
    return drop_empty_blocks(res)


def mad_outlier_filter(ds: rd.Dataset, key: str, col: str,
                       thresh: float = 3.5) -> rd.Dataset:
    """Robust per-group outlier filter: keep rows with
    |x − median_g| <= thresh · MAD_g (MAD = median of |x − median_g|) —
    the median/MAD rule that survives the outliers a mean/stddev z-score
    is corrupted by. The standard telemetry-cleaning gate before
    aggregation (value spikes, sensor glitches).

    Two shared-pass exact per-group medians (exact_quantile_disc_by —
    iterative histogram refinement, driver state O(groups), no group ever
    collects), then one broadcast map filter. Bounded group keys (same
    contract as grouped_agg mode="driver"). Null values drop (SQL
    comparison semantics)."""
    med_tbl = exact_quantile_disc_by(ds, key, col, 0.5)
    med = dict(zip(med_tbl[key].to_pylist(), med_tbl["q50"].to_pylist()))
    med_ref = ray.put(med)

    def add_dev(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = pd.Series(kv).map(ray.get(med_ref)).to_numpy(np.float64)
        return pa.table({key: t[key],
                         "__dev": pa.array(np.abs(v - m), pa.float64())})

    dev = ds.map_batches(add_dev, batch_format="pyarrow",
                         zero_copy_batch=True)
    mad_tbl = exact_quantile_disc_by(dev, key, "__dev", 0.5)
    mad = dict(zip(mad_tbl[key].to_pylist(), mad_tbl["q50"].to_pylist()))
    bounds_ref = ray.put({g: (med[g], thresh * mad[g]) for g in mad
                          if g in med})

    def keep(t: pa.Table) -> pa.Table:
        bounds = ray.get(bounds_ref)
        kv = t[key].to_numpy(zero_copy_only=False)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        meds = pd.Series(kv).map({g: b[0] for g, b in bounds.items()}) \
            .to_numpy(np.float64)
        lims = pd.Series(kv).map({g: b[1] for g, b in bounds.items()}) \
            .to_numpy(np.float64)
        m = np.abs(v - meds) <= lims     # NaN (null value / unseen key) → drop
        return t.filter(pa.array(m & ~np.isnan(v)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def winsorize_by(ds: rd.Dataset, key: str, col: str,
                 q_lo: float = 0.05, q_hi: float = 0.95,
                 out_col: str | None = None) -> rd.Dataset:
    """Per-group winsorization: clip ``col`` to its group's
    [quantile(q_lo), quantile(q_hi)] — the heavy-tail taming that keeps
    outlier rows (unlike the MAD gate, which drops them) while bounding
    their leverage on downstream means/regressions. Quantiles are EXACT
    (shared-pass histogram refinement, ``exact_quantile_disc_by`` —
    driver state O(groups), no group ever collects); the clip is one
    broadcast row-local map picking existing values, so output bytes
    match the SQL least/greatest definition exactly. Null values drop
    (SQL join semantics); bounded group keys."""
    qt = exact_quantile_disc_by(ds, key, col, [q_lo, q_hi])
    lo_name, hi_name = qt.column_names[1], qt.column_names[2]
    lo = dict(zip(qt[key].to_pylist(), qt[lo_name].to_pylist()))
    hi = dict(zip(qt[key].to_pylist(), qt[hi_name].to_pylist()))
    ref = ray.put((lo, hi))
    out = out_col or f"{col}_w"

    def clip(t: pa.Table) -> pa.Table:
        lo_map, hi_map = _BROADCAST_CACHE.get(ref) or (None, None)
        if lo_map is None:
            lo_map, hi_map = ray.get(ref)
            _BROADCAST_CACHE.clear()
            _BROADCAST_CACHE[ref] = (lo_map, hi_map)
        kv = t[key].to_numpy(zero_copy_only=False)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        los = pd.Series(kv).map(lo_map).to_numpy(np.float64)
        his = pd.Series(kv).map(hi_map).to_numpy(np.float64)
        ok = ~(np.isnan(v) | np.isnan(los))  # null value / unseen key
        t = t.filter(pa.array(ok))
        w = np.minimum(np.maximum(v[ok], los[ok]), his[ok])
        return t.append_column(out, pa.array(w, pa.float64()))

    return ds.map_batches(clip, batch_format="pyarrow",
                          zero_copy_batch=True)


def funnel_counts(ds: rd.Dataset, user_col: str, ts_col: str,
                  type_col: str, steps: list[str],
                  max_span_s: float | None = None,
                  num_buckets: int | None = None,
                  n_rows: int | None = None) -> pa.Table:
    """Ordered funnel: for each prefix of ``steps``, how many users
    completed it IN ORDER (step i strictly after their earliest completion
    of step i-1; first step = their earliest step-0 event) — the
    conversion-funnel analysis a log pipeline feeds (view → click →
    purchase). Greedy earliest-completion is the standard semantics and
    is what the SQL chained-min oracle defines.

    With ``max_span_s`` set, each later step must also land WITHIN that
    many seconds of the previous step's completion (the attribution-
    window variant: a purchase an hour after the click no longer
    converts); step 0 is never bounded.

    Distributed shape: rows prune to the step types at the scan, exchange
    ONCE on a user-hash bucket (keyed_window contract: a user's rows never
    split), and each bucket computes per-user completion vectorized —
    sort by (user, ts), then per step a chained earliest-after lookup.
    Only (bucket, step, count) partials reach the driver."""
    span_us = (None if max_span_s is None
               else np.int64(round(max_span_s * 1_000_000)))
    steps = list(steps)
    step_idx = {s: i for i, s in enumerate(steps)}

    pruned = filter_batches(
        ds.select_columns([user_col, ts_col, type_col]),
        lambda t: pc.and_(pc.is_in(t[type_col],
                                   value_set=pa.array(steps)),
                          pc.is_valid(t[ts_col])))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col], kind="mergesort")
        users = g[user_col].to_numpy()
        ts = ts_as_us(pa.Array.from_pandas(g[ts_col])).to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes = g[type_col].map(step_idx).to_numpy(np.int64)
        uniq, inv = np.unique(users, return_inverse=True)
        n_u = len(uniq)
        # completion_time[u] for the current prefix; NaT sentinel = not yet
        SENT = np.int64(2**62)
        counts = []
        done = np.full(n_u, -SENT)  # "completed step -1 at -inf"
        for i in range(len(steps)):
            nxt = np.full(n_u, SENT)
            m = codes == i
            # earliest step-i event strictly after the user's prefix time
            # (after -inf for step 0 → their earliest step-0 event)
            cand_u, cand_t = inv[m], ts[m]
            ok = cand_t > done[cand_u]
            if span_us is not None and i > 0:
                # bounded window after the previous step's completion;
                # done is a real timestamp for every candidate that
                # passed the > check against a completed prefix
                ok &= cand_t <= done[cand_u] + span_us
            np.minimum.at(nxt, cand_u[ok], cand_t[ok])
            done = nxt
            counts.append(int((done < SENT).sum()))
        return pd.DataFrame({"step": steps, "__i": np.arange(len(steps)),
                             "n_users": np.asarray(counts, np.int64)})

    bucketed = keyed_window(pruned, user_col, per_bucket,
                            num_buckets=num_buckets, n_rows=n_rows)
    parts = [pa.table(b) for b in bucketed.iter_batches(batch_format="pyarrow")]
    if not parts:
        return pa.table({"step": pa.array(steps),
                         "n_users": pa.array([0] * len(steps), pa.int64())})
    allp = pa.concat_tables(parts)
    agg = allp.group_by(["__i", "step"]).aggregate([("n_users", "sum")])
    agg = agg.sort_by([("__i", "ascending")])
    return pa.table({"step": agg["step"],
                     "n_users": pc.cast(agg["n_users_sum"], pa.int64())})


# ---------------------------------------------------------------------------
# skyline / Pareto frontier
# ---------------------------------------------------------------------------

def _local_skyline_idx(arr: np.ndarray) -> np.ndarray:
    """Indices of the Pareto-maximal rows of a float64 (m, d) matrix.

    A row p is dominated iff some q has q >= p on every column with at
    least one strict >. Duplicate rows never dominate each other, so every
    copy of a maximal point survives. d == 2 uses the classic sort scan
    (O(m log m)); d > 2 falls back to chunked pairwise dominance (O(m²/64)
    numpy ops — fine for per-block candidate sets, see ``skyline``)."""
    m, d = arr.shape
    if m == 0:
        return np.empty(0, np.int64)
    if d == 2:
        # sort by (a desc, b desc); within equal a only the max-b value
        # survives (same a, larger b dominates), then a strict running-max
        # scan over b decides between distinct a's
        order = np.lexsort((-arr[:, 1], -arr[:, 0]))
        a, b = arr[order, 0], arr[order, 1]
        new_a = np.empty(m, bool)
        new_a[0] = True
        new_a[1:] = a[1:] != a[:-1]
        grp = np.cumsum(new_a) - 1                  # distinct-a group id
        ga = b[new_a]        # per-a max b (b sorted desc within equal a)
        # best b over all strictly-greater a: exclusive running max of ga
        prev = np.concatenate(([-np.inf], np.maximum.accumulate(ga)[:-1]))
        keep_sorted = (b > prev[grp]) & (b == ga[grp])
        keep = np.zeros(m, bool)
        keep[order] = keep_sorted
        return np.flatnonzero(keep)
    keep = np.ones(m, bool)
    # chunked pairwise: for each chunk of candidate rows, test dominance
    # against ALL rows (vectorized); dominated rows drop out of later
    # chunks' comparisons only as an optimization-free correctness no-op
    chunk = max(1, 2_000_000 // max(m, 1))
    for s in range(0, m, chunk):
        block = arr[s:s + chunk]                    # (c, d)
        ge = (arr[None, :, :] >= block[:, None, :]).all(2)   # (c, m)
        gt = (arr[None, :, :] > block[:, None, :]).any(2)
        dominated = (ge & gt).any(1)
        keep[s:s + chunk] = ~dominated
    return np.flatnonzero(keep)


def skyline(ds: rd.Dataset, cols: list[str],
            maximize: list[bool] | None = None,
            candidate_limit: int = 2_000_000) -> rd.Dataset:
    """Pareto frontier (SQL NOT-EXISTS dominance): rows no other row
    dominates on ``cols`` (>= everywhere, > somewhere; per-column
    direction via ``maximize``). Rows with a null OR NaN on any skyline
    column are dropped first (SQL comparison-with-NULL semantics — mirror
    with IS NOT NULL in the oracle; NaN is excluded explicitly because
    the two prune kernels would otherwise disagree on it).

    Distributed shape: each block prunes to its LOCAL skyline over
    distinct value tuples (a globally maximal point is maximal in its own
    block, so the prune is lossless); only those candidates — O(frontier)
    per block for real-valued data, not O(rows) — reach the driver, which
    resolves the exact global frontier and broadcasts it back as an inner
    join on the value tuple. The broadcast is gated at
    ``candidate_limit`` total candidate rows (same order as the other
    driver gates here); an adversarial corpus whose blocks are entirely
    mutually non-dominated fails loudly rather than silently collecting.

    Timestamps/dates participate as int64 epoch units (exact in float64
    below 2^53 — microseconds until year 2255)."""
    if maximize is None:
        maximize = [True] * len(cols)
    sign = np.array([1.0 if m else -1.0 for m in maximize])

    def to_mat(t: pa.Table) -> np.ndarray:
        mat = np.empty((t.num_rows, len(cols)))
        for j, c in enumerate(cols):
            col = t[c]
            if pa.types.is_timestamp(col.type):
                col = ts_as_us(col)
            elif pa.types.is_date32(col.type):
                col = pc.cast(col, pa.int32())   # days; monotone is enough
            elif pa.types.is_date64(col.type):
                col = pc.cast(col, pa.int64())
            mat[:, j] = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return mat * sign

    def valid_mask(t: pa.Table) -> np.ndarray:
        # null OR NaN on any skyline column drops the row (SQL comparison
        # semantics; NaN would otherwise split behavior between the d==2
        # sort kernel and the d>2 pairwise kernel)
        mask = np.ones(t.num_rows, bool)
        for c in cols:
            col = t[c]
            mask &= pc.is_valid(col).to_numpy(zero_copy_only=False)
            if pa.types.is_floating(col.type):
                mask &= ~pc.fill_null(pc.is_nan(col), False).to_numpy(
                    zero_copy_only=False)
        return mask

    def local(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        t = t.filter(pa.array(valid_mask(t)))
        # distinct tuples only: duplicates carry no extra information for
        # the frontier and inflate the driver gather
        t = t.group_by(cols).aggregate([])
        idx = _local_skyline_idx(to_mat(t))
        return t.take(pa.array(idx, pa.int64()))

    cand_parts: list[pa.Table] = []
    gathered = 0
    for b in ds.map_batches(local, batch_format="pyarrow",
                            zero_copy_batch=True,
                            ).iter_batches(batch_format="pyarrow"):
        p = pa.table(b)
        if not p.num_rows:
            continue
        gathered += p.num_rows
        if gathered > candidate_limit:
            # raise BEFORE the gather grows past the gate, not after
            raise ValueError(
                f"skyline: local-frontier candidates exceed "
                f"candidate_limit={candidate_limit}; the data's frontier "
                "does not fit the driver gather — raise the limit or "
                "reduce dims")
        cand_parts.append(p)
    if not cand_parts:
        return ds.limit(0)
    cand = pa.concat_tables(cand_parts, promote_options="default")
    # the same value tuple can reach the gather from several blocks —
    # distinct here, or the membership join below would duplicate rows
    cand = cand.group_by(cols).aggregate([])
    idx = _local_skyline_idx(to_mat(cand))
    frontier = cand.take(pa.array(idx, pa.int64()))

    def member(t: pa.Table) -> pa.Table:
        # inner join on the value tuple: frontier tuples are distinct, so
        # this is an exact semi-join keeping every original column
        return t.join(frontier, keys=cols, join_type="inner"
                      ).select(t.column_names)

    out = filter_batches(ds, lambda t: pa.array(valid_mask(t.select(cols))))
    return out.map_batches(member, batch_format="pyarrow",
                           zero_copy_batch=True)


def ewm_rolling_mean(ds: rd.Dataset, key_col: str, order_cols: list[str],
                     value_col: str, alpha: float = 0.3, k: int = 16,
                     out: str = "ewma", ndigits: int | None = 6,
                     num_buckets: int | None = None,
                     n_rows: int | None = None) -> rd.Dataset:
    """Exponentially-weighted rolling mean per key over a bounded k-row
    frame: for each row t (ordered by ``order_cols`` within the key),
        ewma_t = Σ_{i<m} b^i·x_{t-i} / Σ_{i<m} b^i,  b = 1-alpha,
    with m = min(k, rows so far) — the pandas ``ewm(adjust=True)``
    recurrence truncated to a hard lookback so the weights are an
    explicit finite sum BOTH engines can evaluate (the untruncated
    recurrence needs SQL recursion whose pow(1/b, rn) terms overflow /
    lose precision at depth; b^k here stays bounded). The smoothing the
    log pipeline's rate dashboards want, expressed as one user-bucket
    exchange + a per-key numpy convolution — python iterates KEYS inside
    a bucket, never rows.

    Output: input columns + ``out``; ``ndigits`` rounds half-away-from-
    zero on both engines (None = raw floats)."""
    from ..functions.rounding import round_np

    b = 1.0 - alpha
    w = b ** np.arange(k)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        x = g[value_col].to_numpy(np.float64)
        keys = g[key_col].to_numpy()
        n = len(g)
        res = np.empty(n, np.float64)
        start = np.flatnonzero(np.concatenate(
            ([True], keys[1:] != keys[:-1])))
        bounds = np.append(start, n)
        for s, e in zip(bounds[:-1], bounds[1:]):
            xs = x[s:e]
            m = len(xs)
            # numerator: convolution with the weight kernel, causal part
            num = np.convolve(xs, w)[:m]
            mm = np.minimum(np.arange(1, m + 1), k)
            den = (1.0 - b ** mm) / (1.0 - b)
            res[s:e] = num / den
        g = g.copy()
        g[out] = round_np(res, ndigits) if ndigits is not None else res
        return g

    return keyed_window(ds, key_col, per_bucket,
                        num_buckets=num_buckets, n_rows=n_rows)


def grouped_mode(ds: rd.Dataset, keys: list[str], value_col: str,
                 out_col: str = "mode", count_col: str = "n",
                 mode: str = "shuffle") -> rd.Dataset:
    """Most-frequent value of ``value_col`` per group (SQL mode()), with a
    DETERMINISTIC tie rule (highest count, then smallest value) so results
    are reproducible across engines and partitionings — DuckDB's mode()
    leaves ties unspecified, so the oracle uses the explicit window form.

    Composition, not a new kernel: one partial-combined count aggregate on
    (keys, value) — cardinality ≤ keys x values, exchanged per ``mode``
    ("shuffle" default; "bucket" when value space ≈ rows) — then the
    existing per-group top-1 (local per-batch prune, O(1) rows per
    (batch, group) into the final exchange)."""
    counts = grouped_agg(ds, [*keys, value_col],
                         [(value_col, "count", count_col)], mode=mode)
    top = topk_per_group(counts, keys, [count_col, value_col], k=1,
                         descending=[True, False])
    return top.map_batches(
        lambda t: t.rename_columns(
            [out_col if c == value_col else c for c in t.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)


def table_checksum(ds: rd.Dataset, cols: list[str]) -> pa.Table:
    """Order-insensitive content digest of a dataset: per row, md5 of the
    '|'-joined column values (null → ''), lower 64 bits summed mod 2^64,
    plus the row count. The cross-cluster consistency check a replicated
    100 TB corpus needs (verify a copy / a migration / an engine port
    without moving data): each block reduces to ONE (sum, count) partial,
    the driver folds O(blocks) scalars, and the digest is independent of
    partitioning and row order by construction.

    Cryptographic md5 per row is the point (the digest must match other
    engines: DuckDB md5_number_lower(concat_ws('|', …)) computes the
    identical value); engine-internal fingerprints that don't need parity
    should use functions.hashing.stable_hash64 instead (vectorized).
    Returns a one-row table {checksum: str, n: int64} — the sum is decimal
    -stringified because it exceeds int64."""
    import hashlib

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"s": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        parts = []
        for c in cols:
            a = t[c]
            if not pa.types.is_string(a.type):
                a = pc.cast(a, pa.string())
            parts.append(pc.fill_null(a, ""))
        joined = pc.binary_join_element_wise(*parts, "|")
        total = 0
        for s in joined.to_pylist():
            total += int.from_bytes(
                hashlib.md5(s.encode()).digest()[8:16], "little")
        return pa.table({"s": pa.array([str(total % (1 << 64))]),
                         "n": pa.array([t.num_rows], pa.int64())})

    total, n = 0, 0
    for b in ds.select_columns(cols).map_batches(
            partial, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for i in range(t.num_rows):
            total = (total + int(t["s"][i].as_py())) % (1 << 64)
            n += int(t["n"][i].as_py())
    return pa.table({"checksum": pa.array([str(total)]),
                     "n": pa.array([n], pa.int64())})


def debounce(ds: rd.Dataset, key_col: str, ts_col: str,
             min_gap_s: float, tie_cols: list[str] | None = None,
             num_buckets: int | None = None,
             n_rows: int | None = None) -> rd.Dataset:
    """Event de-bouncing: drop any row closer than ``min_gap_s`` seconds to
    the IMMEDIATELY PRECEDING row of the same key (lag semantics — each row
    compares to its predecessor whether or not that predecessor was kept,
    which is exactly SQL `lag(ts) OVER (PARTITION BY key ORDER BY ts, tie)`
    and, unlike the greedy kept-anchor variant, window-expressible on both
    engines). The throttling/refractory filter every clickstream and
    sensor pipeline needs before rate stats.

    Same scale shape as every ordered per-key window here: one
    keyed_window bucket exchange, vectorized predecessor diff per bucket
    (rows never iterate in Python). Ties (equal ts) order by ``tie_cols``
    so the drop set is deterministic."""
    tie = tie_cols or []

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, *tie], kind="mergesort")
        ts = ts_as_us(pa.Array.from_pandas(g[ts_col])).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keys = g[key_col].to_numpy()
        same = np.concatenate(([False], keys[1:] == keys[:-1]))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        keep = ~same | (gap >= np.int64(round(min_gap_s * 1_000_000)))
        return g[keep].drop(columns=["__b"], errors="ignore")

    return keyed_window(ds, key_col, window,
                        num_buckets=num_buckets, n_rows=n_rows)


def merge_intervals(ds: rd.Dataset, key_col: str, start_col: str,
                    end_col: str, num_buckets: int | None = None,
                    n_rows: int | None = None) -> rd.Dataset:
    """Coalesce overlapping/touching CLOSED intervals per key into their
    union (SQL's islands-and-gaps pattern; the session-union /
    availability-window / span-merge primitive). Two intervals merge when
    the later one starts at or before the running max end of everything
    before it.

    Columns must be integer-comparable (epoch micros, offsets) so the
    overlap predicate is exact on every engine. One keyed_window bucket
    exchange; inside the bucket everything is vectorized: running-max end
    via np.maximum.accumulate per key segment, island ids via cumsum of
    the gap indicator, island min/max via reduceat — no per-interval
    Python. Output: (key, start, end) per merged island."""

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, start_col, end_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        s = g[start_col].to_numpy(np.int64)
        e = g[end_col].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame({key_col: keys, start_col: s, end_col: e})
        kstart = np.flatnonzero(np.concatenate(
            ([True], keys[1:] != keys[:-1])))
        # running max of end within each key segment
        run_max = np.empty(n, np.int64)
        bounds = np.append(kstart, n)
        for a, b in zip(bounds[:-1], bounds[1:]):
            np.maximum.accumulate(e[a:b], out=run_max[a:b])
        # new island when this start exceeds the max end BEFORE this row
        prev_max = np.empty(n, np.int64)
        prev_max[1:] = run_max[:-1]
        new_island = np.zeros(n, bool)
        new_island[kstart] = True
        inner = ~new_island
        new_island[inner] = s[inner] > prev_max[inner]
        starts = np.flatnonzero(new_island)
        out_end = np.maximum.reduceat(e, starts)
        return pd.DataFrame({key_col: keys[starts], start_col: s[starts],
                             end_col: out_end})

    return keyed_window(ds, key_col, window,
                        num_buckets=num_buckets, n_rows=n_rows)


def ffill_by(ds: rd.Dataset, key_col: str, order_cols: list[str],
             val_col: str, out_col: str | None = None,
             num_buckets: int | None = None,
             n_rows: int | None = None) -> rd.Dataset:
    """Last-observation-carried-forward imputation per key (SQL
    `last_value(x IGNORE NULLS) OVER (PARTITION BY key ORDER BY …)`):
    fill each null with the key's most recent non-null value in event
    order; leading nulls stay null. The standard sensor/metrics gap
    repair before rate math.

    Same keyed_window bucket shape as every ordered per-key op here;
    in-bucket fill is pandas groupby().ffill() (C-vectorized). The filled
    value is a VERBATIM copy of an input float, so cross-engine equality
    is exact — no rounding games."""
    out = out_col or val_col

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        g = g.drop(columns=["__b"], errors="ignore").copy()
        g[out] = g.groupby(key_col, sort=False)[val_col].ffill()
        if out != val_col:
            g = g.drop(columns=[val_col])
        return g

    return keyed_window(ds, key_col, window,
                        num_buckets=num_buckets, n_rows=n_rows)


def weighted_quantile(ds: rd.Dataset, col: str, w_col: str,
                      qs: list[float], num_bins: int = 512,
                      collect_limit: int = 200_000,
                      max_passes: int = 8) -> list[float]:
    """EXACT weighted quantiles over an unbounded column WITHOUT
    collecting it: for each q, the smallest value v with
    W(≤ v) >= q · W_total (the weighted quantile_disc convention — e.g.
    the token-weighted median document length, where long docs count by
    their tokens, not once). Same iterative histogram refinement as
    exact_quantile_disc, but the bins accumulate WEIGHT MASS instead of
    row counts; all quantiles share each pass's scan.

    Exactness contract: weights cast to int64 (they must be integral and
    non-negative — counts, tokens, quantities), so every cumulative mass
    is an exact integer and the q·W threshold is the same double on every
    engine; rows where value or weight is null drop pairwise. ~log_bins
    passes of one map-reduce each, O(num_bins · len(qs)) driver state."""
    def base(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = t[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(v) | np.isnan(w))
        v, w = v[ok], w[ok].astype(np.int64)
        if not len(v):
            return pa.table({"w": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"w": [int(w.sum())], "n": [len(v)],
                         "lo": [float(v.min())], "hi": [float(v.max())]})

    parts = [pa.table(b) for b in ds.map_batches(
        base, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow")]
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return [float("nan")] * len(qs)
    allp = pa.concat_tables(nonempty)
    W = int(pc.sum(allp["w"]).as_py())
    n = int(pc.sum(allp["n"]).as_py())
    if W <= 0:
        return [float("nan")] * len(qs)
    gmin = float(pc.min(allp["lo"]).as_py())
    gmax = float(pc.max(allp["hi"]).as_py())

    state = [{"target": q * W, "below": 0, "lo": gmin,
              "hi": float(np.nextafter(gmax, np.inf)), "n": n,
              "val": None} for q in qs]

    for _ in range(max_passes):
        active = [i for i, s in enumerate(state)
                  if s["val"] is None and s["n"] > collect_limit]
        if not active:
            break
        ranges = [(i, state[i]["lo"], state[i]["hi"]) for i in active]

        def hist(t: pa.Table, ranges=ranges) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            w = t[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
            ok = ~(np.isnan(v) | np.isnan(w))
            v, w = v[ok], w[ok].astype(np.int64)
            rows_i, rows_w, rows_c = [], [], []
            for i, lo, hi in ranges:
                m = (v >= lo) & (v < hi)
                mv = v[m]
                ws, _ = np.histogram(mv, bins=num_bins, range=(lo, hi),
                                     weights=w[m].astype(np.float64))
                cs, _ = np.histogram(mv, bins=num_bins, range=(lo, hi))
                rows_i.append(i)
                rows_w.append(ws.astype(np.int64))
                rows_c.append(cs.astype(np.int64))
            return pa.table({"qi": pa.array(rows_i, pa.int32()),
                             "wsum": pa.array(rows_w),
                             "cnt": pa.array(rows_c)})

        wsums = {i: np.zeros(num_bins, np.int64) for i in active}
        cnts = {i: np.zeros(num_bins, np.int64) for i in active}
        for b in ds.map_batches(hist, batch_format="pyarrow",
                                zero_copy_batch=True
                                ).iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            for qi, wrow, crow in zip(t["qi"].to_pylist(),
                                      t["wsum"].to_pylist(),
                                      t["cnt"].to_pylist()):
                wsums[qi] += np.asarray(wrow, np.int64)
                cnts[qi] += np.asarray(crow, np.int64)
        for i in active:
            s = state[i]
            cumw = np.cumsum(wsums[i])
            b = int(np.searchsorted(cumw, s["target"] - s["below"],
                                    side="left"))
            b = min(b, num_bins - 1)
            edges = np.linspace(s["lo"], s["hi"], num_bins + 1)
            s["below"] += int(cumw[b - 1]) if b else 0
            s["n"] = int(cnts[i][b])
            s["lo"], s["hi"] = float(edges[b]), float(edges[b + 1])
            if s["hi"] <= np.nextafter(s["lo"], np.inf):
                s["val"] = s["lo"]

    pending = [(i, state[i]["lo"], state[i]["hi"])
               for i, s in enumerate(state) if s["val"] is None]
    if pending:
        def survivors(t: pa.Table, pending=pending) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            w = t[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
            ok = ~(np.isnan(v) | np.isnan(w))
            v, w = v[ok], w[ok].astype(np.int64)
            ii, vv, ww = [], [], []
            for i, lo, hi in pending:
                m = (v >= lo) & (v < hi)
                ii.extend([i] * int(m.sum()))
                vv.extend(v[m].tolist())
                ww.extend(w[m].tolist())
            return pa.table({"qi": pa.array(ii, pa.int32()),
                             "v": pa.array(vv, pa.float64()),
                             "w": pa.array(ww, pa.int64())})

        got: dict[int, list] = {i: ([], []) for i, _, _ in pending}
        for b in ds.map_batches(survivors, batch_format="pyarrow",
                                zero_copy_batch=True
                                ).iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            for qi, v, w in zip(t["qi"].to_pylist(), t["v"].to_pylist(),
                                t["w"].to_pylist()):
                got[qi][0].append(v)
                got[qi][1].append(w)
        for i, _, _ in pending:
            s = state[i]
            vs = np.asarray(got[i][0], np.float64)
            ws = np.asarray(got[i][1], np.int64)
            order = np.argsort(vs, kind="mergesort")
            vs, ws = vs[order], ws[order]
            # cumulative mass AT each distinct value includes its peers
            uniq, inv = np.unique(vs, return_inverse=True)
            mass = np.bincount(inv, weights=ws.astype(np.float64)
                               ).astype(np.int64)
            cum = s["below"] + np.cumsum(mass)
            j = int(np.searchsorted(cum, s["target"], side="left"))
            s["val"] = float(uniq[min(j, len(uniq) - 1)])
    return [s["val"] for s in state]


def transition_counts(ds: rd.Dataset, key_col: str, order_cols: list[str],
                      state_col: str,
                      num_buckets: int | None = None,
                      n_rows: int | None = None) -> pa.Table:
    """First-order Markov transition matrix over a BOUNDED state column:
    per key, each consecutive (previous state → state) step counts once
    (SQL lag() pairs), then the bounded |states|² matrix carries counts
    and row-normalized probabilities. The clickstream/session sequence
    -mining primitive (what follows what, per entity).

    One keyed_window bucket exchange; inside each bucket the step pairs
    come from a vectorized shift and reduce immediately to per-bucket
    (prev, cur) value_counts — only O(states²) partial rows per bucket
    leave the exchange, driver-combined like every bounded aggregate."""

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        st = g[state_col].to_numpy()
        keys = g[key_col].to_numpy()
        same = np.concatenate(([False], keys[1:] == keys[:-1]))
        prev = np.concatenate(([None], st[:-1]))
        sub = pd.DataFrame({"prev": prev[same], "cur": st[same]})
        out = (sub.value_counts(["prev", "cur"]).rename("n")
               .reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = keyed_window(ds, key_col, window,
                            num_buckets=num_buckets, n_rows=n_rows)
    combined = pa.concat_tables([pa.table(b) for b in grouped_agg(
        partials, ["prev", "cur"], [("n", "sum", "n")],
        mode="driver").iter_batches(batch_format="pyarrow")])
    tot = combined.group_by("prev").aggregate([("n", "sum")])
    t = combined.join(tot, keys="prev").sort_by(
        [("prev", "ascending"), ("cur", "ascending")])
    from ..functions.rounding import round_np
    p = round_np(pc.divide(pc.cast(t["n"], pa.float64()),
                           pc.cast(t["n_sum"], pa.float64())
                           ).to_numpy(zero_copy_only=False), 6)
    return pa.table({"prev": t["prev"], "cur": t["cur"], "n": t["n"],
                     "p": pa.array(p, pa.float64())})


def union_by_name(a: rd.Dataset, b: rd.Dataset) -> rd.Dataset:
    """Schema-evolution union (SQL UNION ALL BY NAME): columns match by
    NAME, not position; a column missing on one side fills with TYPED
    nulls of the other side's type. The heterogeneous-source merge every
    long-lived ingestion needs when upstream schemas drift (new fields
    appear, old ones retire) — plain Dataset.union would mis-align
    positional schemas or route blocks through pandas null-padding
    (int64 → float64 + NaN, the union pitfall documented in the repo
    invariants).

    Zero exchange: each side gets one row-local map that projects onto
    the unified column order (shared names keep the LEFT side's type as
    the contract; a conflicting right-side type fails loudly in the cast
    rather than silently coercing), then the block streams union."""
    def _arrow_type(t) -> pa.DataType:
        # Ray schemas carry numpy dtypes for pandas-backed blocks; object
        # dtype means strings in every table this engine produces
        if isinstance(t, pa.DataType):
            return t
        dt = np.dtype(t)
        if dt == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(dt)

    sa, sb = a.schema(), b.schema()
    ta = {n: _arrow_type(t) for n, t in zip(sa.names, sa.types)}
    tb = {n: _arrow_type(t) for n, t in zip(sb.names, sb.types)}
    names = list(dict.fromkeys([*sa.names, *sb.names]))
    unified = {n: (ta[n] if n in ta else tb[n]) for n in names}

    def pad_to(schema_types: dict, have: dict):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for n in names:
                if n in have:
                    col = t[n]
                    if col.type != schema_types[n]:
                        col = pc.cast(col, schema_types[n])
                    cols[n] = col
                else:
                    cols[n] = pa.nulls(t.num_rows,
                                       type=schema_types[n])
            return pa.table(cols)
        return fn

    a2 = a.map_batches(pad_to(unified, ta), batch_format="pyarrow",
                       zero_copy_batch=True)
    b2 = b.map_batches(pad_to(unified, tb), batch_format="pyarrow",
                       zero_copy_batch=True)
    return a2.union(b2)


def systematic_weighted_sample(ds: rd.Dataset, id_col: str,
                               w_col: str, k: int) -> pa.Table:
    """SYSTEMATIC weighted sampling (probability-proportional-to-size
    with replacement, midpoint rule): draw j of k selects the row whose
    cumulative-weight interval, in ascending ``id_col`` order, contains
    position (j + 0.5)·W/k — the deterministic, zero-randomness PPS
    design survey statistics uses (Madow 1949), and the reproducible
    alternative to multinomial draws for mixture construction.

    Each draw is a WEIGHTED RANK SELECTION, so the whole sample reuses
    weighted_quantile's no-collect histogram refinement: all k draws
    share each pass's scan, nothing sorts globally, and integer weights
    make every cumulative mass exact (``w_col`` must be integral, e.g.
    pre-floored cents). Rows with weight ≥ W/k can be drawn more than
    once — that is with-replacement semantics, not a bug. Returns
    (draw, picked id)."""
    qs = [(j + 0.5) / k for j in range(k)]
    vals = weighted_quantile(ds, id_col, w_col, qs)
    return pa.table({
        "draw": pa.array(np.arange(k, dtype=np.int64)),
        id_col: pa.array([None if v != v else int(v) for v in vals],
                         pa.int64()),
    })


def bloom_filtered_hash_join(left: rd.Dataset, right: rd.Dataset,
                             on: str, join_type: str = "inner",
                             fpp: float = 0.01,
                             n_right: int | None = None,
                             num_partitions: int | None = None
                             ) -> rd.Dataset:
    """Hash join with a Bloom PRE-FILTER on the probe side: the standard
    runtime-filter pushdown every warehouse engine applies when the build
    side is too big to broadcast but still selective against the probe
    side. The right side's join keys fold into one Bloom filter
    DISTRIBUTED (per-block partial bit arrays with shared (m, k) sizing,
    OR-combined on the driver — ~10 bits/key at fpp=0.01, mergeable
    because the layout is fixed up front); the left side drops definite
    non-matches BEFORE the all-to-all exchange, so the shuffle moves
    ~match_rate + fpp of the probe rows instead of all of them. Results
    are EXACT for inner joins — false positives are eliminated by the
    join itself.

    ``n_right`` sizes the filter without a count() when the caller knows
    it (parquet footers); inner join only (an outer probe side must keep
    non-matching rows, which the pre-filter would drop)."""
    if join_type != "inner":
        raise ValueError("bloom_filtered_hash_join: pre-filtering the "
                         "probe side is only sound for inner joins")
    from ..functions.sketches import BloomFilter

    n = n_right if n_right is not None else right.count()
    proto = BloomFilter(max(int(n), 1), fpp)
    m, k = proto.m, proto.k

    def partial_bits(t: pa.Table) -> pa.Table:
        b = BloomFilter.__new__(BloomFilter)
        b.m, b.k = m, k
        b.bits = np.zeros(m, dtype=bool)
        b.add_array(t[on].combine_chunks()
                    if isinstance(t[on], pa.ChunkedArray) else t[on])
        return pa.table({"bits": pa.array([np.packbits(b.bits).tobytes()],
                                          pa.binary())})

    bloom = BloomFilter.__new__(BloomFilter)
    bloom.m, bloom.k = m, k
    acc = np.zeros((m + 7) // 8, dtype=np.uint8)
    for b in right.select_columns([on]).map_batches(
            partial_bits, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for i in range(t.num_rows):
            acc |= np.frombuffer(t["bits"][i].as_py(), dtype=np.uint8)
    bloom.bits = np.unpackbits(acc)[:m].astype(bool)
    ref = ray.put(bloom)

    def prefilter(t: pa.Table) -> pa.Table:
        bf = _BLOOM_JOIN_CACHE.get(ref)
        if bf is None:
            _BLOOM_JOIN_CACHE.clear()
            bf = _BLOOM_JOIN_CACHE[ref] = ray.get(ref)
        col = t[on].combine_chunks() if isinstance(t[on], pa.ChunkedArray) \
            else t[on]
        return t.filter(pa.array(bf.contains_array(col)))

    pruned = left.map_batches(prefilter, batch_format="pyarrow",
                              zero_copy_batch=True)
    return hash_join(pruned, right, on=[on], join_type=join_type,
                     num_partitions=num_partitions)


_BLOOM_JOIN_CACHE: dict = {}


def path_ngram_counts(ds: rd.Dataset, key_col: str, order_cols: list[str],
                      state_col: str, n: int = 3,
                      num_buckets: int | None = None,
                      n_rows: int | None = None) -> rd.Dataset:
    """Sequential pattern mining: counts of every length-``n`` CONSECUTIVE
    state path per key (the n-gram generalization of the first-order
    transition matrix — top user journeys, error signatures, session
    shapes). State space must be bounded: the result is ≤ |states|^n
    rows.

    Same keyed_window shape as transition_counts: per bucket one sort,
    n shifted views masked so no path crosses a key boundary, immediate
    reduce to per-bucket value_counts — only O(|states|^n) partial rows
    per bucket leave the exchange, driver-combined."""

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        st = g[state_col].to_numpy()
        keys = g[key_col].to_numpy()
        m = len(g)
        cols = [f"s{i + 1}" for i in range(n)]
        if m < n:
            return pd.DataFrame({**{c: pd.Series([], dtype=object)
                                    for c in cols},
                                 "n": pd.Series([], dtype=np.int64)})
        # a window starting at i is valid iff rows i..i+n-1 share the key
        same = keys[1:] == keys[:-1]
        valid = np.ones(m - n + 1, dtype=bool)
        for j in range(n - 1):
            valid &= same[j:m - n + 1 + j]
        idx = np.flatnonzero(valid)
        sub = pd.DataFrame({c: st[idx + j] for j, c in enumerate(cols)})
        out = sub.value_counts(cols).rename("n").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    cols = [f"s{i + 1}" for i in range(n)]
    partials = keyed_window(ds, key_col, window,
                            num_buckets=num_buckets, n_rows=n_rows)
    return grouped_agg(partials, cols, [("n", "sum", "n")], mode="driver")


def weighted_quantile_by(ds: rd.Dataset, key: str, col: str, w_col: str,
                         q: float | list[float],
                         num_bins: int = 256,
                         collect_limit: int = 200_000,
                         max_passes: int = 8) -> pa.Table:
    """Per-group EXACT WEIGHTED quantiles for a BOUNDED group key: for
    each group and each q, the smallest value v with
    W_g(≤ v) >= q · W_g — the token-weighted median doc length PER
    LANGUAGE shape. Marries exact_quantile_disc_by's shared-pass grouped
    refinement with weighted_quantile's weight-mass histograms: every
    (group, q) range narrows in the SAME scan, weights are int64 so
    every cumulative mass is exact (null value/weight pairs drop).
    Returns (key, q<percent>…) one row per group."""
    qs = [q] if isinstance(q, (int, float)) else list(q)

    def wsum(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = t[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(v) | np.isnan(w))
        return pa.table({key: t[key].filter(pa.array(ok)),
                         "__v": pa.array(v[ok]),
                         "__w": pa.array(w[ok].astype(np.int64))})

    clean = ds.select_columns([key, col, w_col]).map_batches(
        wsum, batch_format="pyarrow", zero_copy_batch=True)
    base = grouped_agg(clean, [key], [("__w", "sum", "W"),
                                      ("__v", "count", "n"),
                                      ("__v", "min", "lo"),
                                      ("__v", "max", "hi")]).take_all()
    state: dict = {}
    groups: list = []
    for r in base:
        if int(r["n"]) == 0 or int(r["W"]) <= 0:
            continue
        groups.append(r[key])
        for j, qq in enumerate(qs):
            state[(r[key], j)] = {
                "target": qq * int(r["W"]), "below": 0,
                "lo": float(r["lo"]),
                "hi": float(np.nextafter(float(r["hi"]), np.inf)),
                "n": int(r["n"]), "val": None}

    for _ in range(max_passes):
        active = {gj: (s["lo"], s["hi"]) for gj, s in state.items()
                  if s["val"] is None and s["n"] > collect_limit}
        if not active:
            break

        def hist(t: pa.Table, active=active) -> pa.Table:
            kv = t[key].to_numpy(zero_copy_only=False)
            v = t["__v"].to_numpy(zero_copy_only=False)
            w = t["__w"].to_numpy(zero_copy_only=False)
            gs, js, ws, cs = [], [], [], []
            for (g, j), (lo, hi) in active.items():
                m = (kv == g) & (v >= lo) & (v < hi)
                mv = v[m]
                hw, _ = np.histogram(mv, bins=num_bins, range=(lo, hi),
                                     weights=w[m].astype(np.float64))
                hc, _ = np.histogram(mv, bins=num_bins, range=(lo, hi))
                gs.append(g)
                js.append(j)
                ws.append(hw.astype(np.int64))
                cs.append(hc.astype(np.int64))
            return pa.table({"g": pa.array(gs),
                             "j": pa.array(js, pa.int32()),
                             "wsum": pa.array(ws), "cnt": pa.array(cs)})

        wsums = {gj: np.zeros(num_bins, np.int64) for gj in active}
        cnts = {gj: np.zeros(num_bins, np.int64) for gj in active}
        for b in clean.map_batches(hist, batch_format="pyarrow",
                                   zero_copy_batch=True
                                   ).iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            for g, j, wrow, crow in zip(t["g"].to_pylist(),
                                        t["j"].to_pylist(),
                                        t["wsum"].to_pylist(),
                                        t["cnt"].to_pylist()):
                wsums[(g, j)] += np.asarray(wrow, np.int64)
                cnts[(g, j)] += np.asarray(crow, np.int64)
        for gj in active:
            s = state[gj]
            cumw = np.cumsum(wsums[gj])
            bi = int(np.searchsorted(cumw, s["target"] - s["below"],
                                     side="left"))
            bi = min(bi, num_bins - 1)
            edges = np.linspace(s["lo"], s["hi"], num_bins + 1)
            s["below"] += int(cumw[bi - 1]) if bi else 0
            s["n"] = int(cnts[gj][bi])
            s["lo"], s["hi"] = float(edges[bi]), float(edges[bi + 1])
            if s["hi"] <= np.nextafter(s["lo"], np.inf):
                s["val"] = s["lo"]

    pending = {gj: (s["lo"], s["hi"]) for gj, s in state.items()
               if s["val"] is None}
    if pending:
        def survivors(t: pa.Table, pending=pending) -> pa.Table:
            kv = t[key].to_numpy(zero_copy_only=False)
            v = t["__v"].to_numpy(zero_copy_only=False)
            w = t["__w"].to_numpy(zero_copy_only=False)
            gs, js, vv, ww = [], [], [], []
            for (g, j), (lo, hi) in pending.items():
                m = (kv == g) & (v >= lo) & (v < hi)
                k = int(m.sum())
                gs.extend([g] * k)
                js.extend([j] * k)
                vv.extend(v[m].tolist())
                ww.extend(w[m].tolist())
            return pa.table({"g": pa.array(gs),
                             "j": pa.array(js, pa.int32()),
                             "v": pa.array(vv, pa.float64()),
                             "w": pa.array(ww, pa.int64())})

        got = {gj: ([], []) for gj in pending}
        for b in clean.map_batches(survivors, batch_format="pyarrow",
                                   zero_copy_batch=True
                                   ).iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            for g, j, v, w in zip(t["g"].to_pylist(), t["j"].to_pylist(),
                                  t["v"].to_pylist(), t["w"].to_pylist()):
                got[(g, j)][0].append(v)
                got[(g, j)][1].append(w)
        for gj in pending:
            s = state[gj]
            vs = np.asarray(got[gj][0], np.float64)
            ws = np.asarray(got[gj][1], np.int64)
            order = np.argsort(vs, kind="mergesort")
            vs, ws = vs[order], ws[order]
            uniq, inv = np.unique(vs, return_inverse=True)
            mass = np.bincount(inv, weights=ws.astype(np.float64)
                               ).astype(np.int64)
            cum = s["below"] + np.cumsum(mass)
            jj = int(np.searchsorted(cum, s["target"], side="left"))
            s["val"] = float(uniq[min(jj, len(uniq) - 1)])

    ks = sorted(set(groups))
    cols: dict = {key: pa.array(ks)}
    for j, qq in enumerate(qs):
        out_name = f"q{int(round(qq * 100)):02d}"
        cols[out_name] = pa.array([state[(g, j)]["val"] for g in ks],
                                  pa.float64())
    return pa.table(cols)
