"""Privacy-preserving release operators: k-anonymity by suppression and by
generalization (Sweeney 2002 / Samarati 2001), the table-release guards a
training-data pipeline needs before exporting user-derived tables.

Complements textops' pattern-level PII redaction: redaction scrubs values
INSIDE a row, k-anonymity bounds what the released quasi-identifier
COMBINATIONS reveal — every released row must share its quasi-id tuple
with at least k-1 others.

Scale shape: quasi-id group sizes come from grouped_agg (partial combine
per batch, so the exchange moves O(groups × blocks) rows); the small
group table is broadcast-gated with a hash-join fallback, mirroring
curation's anti-join — nothing assumes the group table fits in memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .relational import (drop_empty_blocks, filter_batches, grouped_agg,
                         hash_join)

_GROUP_CACHE: dict = {}


def _group_sizes(ds: rd.Dataset, quasi_cols: list[str]) -> rd.Dataset:
    first = quasi_cols[0]
    return grouped_agg(ds.select_columns(quasi_cols), quasi_cols,
                       [(first, "count", "__gn")], mode="shuffle")


def k_anonymize_suppress(ds: rd.Dataset, quasi_cols: list[str], k: int,
                         broadcast_groups_max: int = 2_000_000) -> rd.Dataset:
    """Release only rows whose quasi-identifier tuple occurs >= k times
    (suppression-model k-anonymity). Two passes: group sizes via
    partial-combined grouped_agg, then a semi-join of the input against
    the >=k groups — broadcast set when the group table is small, hash
    join when it is not."""
    sizes = _group_sizes(ds, quasi_cols)
    big = filter_batches(sizes, lambda t: pc.greater_equal(t["__gn"], k)) \
        .select_columns(quasi_cols)
    big = big.materialize()
    if big.count() <= broadcast_groups_max:
        ref = ray.put(big.to_pandas())

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            gt = _GROUP_CACHE.get(ref)
            if gt is None:
                _GROUP_CACHE.clear()
                gt = _GROUP_CACHE[ref] = ray.get(ref)
            # vectorized semi-join: gt rows are distinct group keys, so the
            # inner merge never duplicates input rows
            return df.merge(gt, on=quasi_cols, how="inner")

        return ds.map_batches(keep, batch_format="pandas")
    # semi-join fallback: inner join against the distinct >=k group keys
    return hash_join(ds, drop_empty_blocks(big), on=quasi_cols)


def k_anonymity_violations(ds: rd.Dataset, quasi_cols: list[str],
                           k: int) -> rd.Dataset:
    """Audit view: the quasi-id groups (with sizes) that violate
    k-anonymity — what a release gate reports instead of silently
    suppressing."""
    sizes = _group_sizes(ds, quasi_cols)
    return filter_batches(sizes, lambda t: pc.less(t["__gn"], k)) \
        .map_batches(lambda t: t.rename_columns([*quasi_cols, "group_n"]),
                     batch_format="pyarrow")


def l_diversity_report(ds: rd.Dataset, quasi_cols: list[str],
                       sensitive_col: str, l: int) -> rd.Dataset:
    """l-diversity audit (Machanavajjhala 2007): per quasi-id group, the
    count of DISTINCT sensitive values and whether it reaches l —
    k-anonymity's companion gate (a k-anonymous group whose sensitive
    attribute is constant still leaks it). Emitted as a full report, not
    just violations, so the release log always records every group.

    Scale shape: distinct (quasi, sensitive) pairs via per-batch local
    dedup + hash-bucket exchange (pair space ≈ rows — never one Ray
    group per pair), then a partial-combined count per quasi group."""
    from .dedup import _distinct_rows_bucketed

    cols = [*quasi_cols, sensitive_col]

    def local_dedup(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols).aggregate([])

    pairs = _distinct_rows_bucketed(
        ds.select_columns(cols).map_batches(
            local_dedup, batch_format="pyarrow", zero_copy_batch=True),
        cols)
    counts = grouped_agg(pairs, quasi_cols,
                         [(sensitive_col, "count", "n_distinct")],
                         mode="shuffle")
    return counts.map_batches(
        lambda t: t.append_column(
            "diverse", pc.greater_equal(t["n_distinct"], l)),
        batch_format="pyarrow", zero_copy_batch=True)


def k_anonymize_generalize(ds: rd.Dataset, quasi_cols: list[str],
                           num_col: str, k: int,
                           widths: list[int]) -> rd.Dataset:
    """Generalization-model k-anonymity on one numeric quasi-identifier:
    coarsen ``num_col`` to bins of width w (floor(x/w)*w), choosing the
    FINEST width from the ``widths`` ladder (ascending) under which every
    (quasi_cols, bin) group reaches size k; falls back to full
    suppression of the column (single bin) if none does.

    All ladder levels are counted in ONE pass (per-batch partials emit a
    (level, quasi, bin) key — O(levels) fan-out on narrow columns only),
    so choosing the level costs one aggregate, not len(widths) scans.
    Returns the released table with ``num_col`` replaced by
    [bin_lo, bin_hi) columns."""
    widths = sorted(int(w) for w in widths)
    if not widths:
        raise ValueError("widths ladder must be non-empty")
    cols = [*quasi_cols, num_col]

    def level_rows(t: pa.Table) -> pa.Table:
        x = pc.cast(t[num_col], pa.float64())
        parts = []
        for li, w in enumerate(widths):
            b = pc.multiply(pc.floor(pc.divide(x, float(w))), float(w))
            parts.append(pa.table({
                "__lvl": pa.array(np.full(t.num_rows, li, np.int32)),
                **{q: t[q] for q in quasi_cols},
                "__bin": b,
            }))
        return pa.concat_tables(parts)

    lv = ds.select_columns(cols).map_batches(
        level_rows, batch_format="pyarrow", zero_copy_batch=True)
    sizes = grouped_agg(lv, ["__lvl", *quasi_cols, "__bin"],
                        [("__bin", "count", "__gn")], mode="shuffle")
    # min group size per level is a bounded table (len(widths) rows)
    mins = grouped_agg(sizes, ["__lvl"], [("__gn", "min", "min_n")],
                       mode="driver").to_pandas()
    ok = mins[mins["min_n"] >= k].sort_values("__lvl")
    level = int(ok["__lvl"].iloc[0]) if len(ok) else None

    def release(t: pa.Table) -> pa.Table:
        out = {q: t[q] for q in quasi_cols}
        x = pc.cast(t[num_col], pa.float64())
        if level is None:
            # no ladder level reaches k → suppress the attribute entirely
            out["bin_lo"] = pa.nulls(t.num_rows, pa.float64())
            out["bin_hi"] = pa.nulls(t.num_rows, pa.float64())
        else:
            w = float(widths[level])
            lo = pc.multiply(pc.floor(pc.divide(x, w)), w)
            out["bin_lo"] = lo
            out["bin_hi"] = pc.add(lo, w)
        return pa.table(out)

    return ds.map_batches(release, batch_format="pyarrow",
                          zero_copy_batch=True)
