"""Dataset profiler: per-column stats in two bounded exchanges.

The `stats` surface of a data engine (≙ the reference's db_stats.py
reporting, generalized from queue counters to data profiling): for every
column — row count, null count, exact distinct count, lexicographic
min/max of the string form. Exact by design so the DuckDB oracle can
check it value-for-value; `functions.sketches.hll_distinct` is the
documented approximate path when an exact per-column distinct (a full
exchange of (column, value) pairs) is too expensive at corpus scale.

Shape: one map stage explodes each batch to (col_name, value-as-string)
pairs, a shuffle groupby collapses them to the distinct-value table, and
a driver-combined aggregate (keys = column names, bounded) folds that
into one row per column. Values are compared as strings — exact for
ints/strings/bools; float columns are excluded by default because float
formatting differs across engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .relational import grouped_agg


def profile_table(ds: rd.Dataset, columns: list[str] | None = None) -> rd.Dataset:
    """→ one row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_val, max_val), min/max lexicographic over the string form."""
    if columns is None:
        sch = ds.schema()
        base = getattr(sch, "base_schema", sch)
        if hasattr(base, "field"):  # arrow schema
            columns = [n for n in base.names
                       if not pa.types.is_floating(base.field(n).type)]
        else:  # PandasBlockSchema: names + numpy/arrow dtypes
            def _is_float(t) -> bool:
                if isinstance(t, pa.DataType):
                    return pa.types.is_floating(t)
                try:
                    return np.issubdtype(t, np.floating)
                except TypeError:
                    return False
            columns = [n for n, t in zip(base.names, base.types)
                       if not _is_float(t)]
    names = list(columns)

    def explode(t: pa.Table) -> pa.Table:
        parts = []
        for n in names:
            v = pc.cast(t[n], pa.string())
            parts.append(pa.table({
                "col_name": pa.array(np.repeat(n, t.num_rows)),
                "v": v,
            }))
        return pa.concat_tables(parts)

    rows = ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)
    # distinct-value table: count rows per (column, value) — count on
    # col_name (never null) so the null-value group keeps its size
    dv = grouped_agg(rows, ["col_name", "v"],
                     [("col_name", "count", "cnt")], mode="bucket")

    def indicators(t: pa.Table) -> pa.Table:
        valid = pc.is_valid(t["v"])
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "col_name": t["col_name"],
            "v": t["v"],
            "cnt": t["cnt"],
            "null_cnt": pc.if_else(valid, zero, t["cnt"]),
            "distinct_ind": pc.cast(valid, pa.int64()),
        })

    dv = dv.map_batches(indicators, batch_format="pyarrow",
                        zero_copy_batch=True)
    # keys = column names (bounded) → driver combine is the scale shape
    out = grouped_agg(dv, ["col_name"],
                      [("cnt", "sum", "n_rows"),
                       ("null_cnt", "sum", "n_nulls"),
                       ("distinct_ind", "sum", "n_distinct"),
                       ("v", "min", "min_val"),
                       ("v", "max", "max_val")], mode="driver")
    return out.map_batches(lambda t: pa.table({
        "col_name": t["col_name"],
        "n_rows": pc.cast(t["n_rows"], pa.int64()),
        "n_nulls": pc.cast(t["n_nulls"], pa.int64()),
        "n_distinct": pc.cast(t["n_distinct"], pa.int64()),
        "min_val": t["min_val"], "max_val": t["max_val"]}),
        batch_format="pyarrow", zero_copy_batch=True)


def benford_digit_test(ds: rd.Dataset, col: str) -> pa.Table:
    """Benford's-law first-digit audit of a positive numeric column: the
    classic fabricated-/synthetic-data screen (Newcomb 1881, Benford
    1938). Returns one row per leading digit 1-9 with observed count,
    observed and expected proportions (p_d = log10(1 + 1/d)), and the
    digit's chi-square contribution (o − e)²/e — the total statistic is
    their sum, checkable per digit.

    Exactness: the leading digit comes from the DECIMAL STRING of
    floor(v) (rows with v < 1 drop), never from float log10 — at exact
    powers of ten a 1-ulp log difference would flip the digit between
    engines. One bounded (9-key) count pass, O(1) driver math."""
    from ..functions.rounding import round_np

    def digits(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t[col], 1))
        d = pc.utf8_slice_codeunits(
            pc.cast(pc.cast(pc.floor(t[col]), pa.int64()), pa.string()),
            0, 1)
        return pa.table({"digit": d})

    counts = pa.concat_tables([pa.table(b) for b in grouped_agg(
        ds.select_columns([col]).map_batches(
            digits, batch_format="pyarrow", zero_copy_batch=True),
        ["digit"], [("digit", "count", "n")],
        mode="driver").iter_batches(batch_format="pyarrow")])
    df = counts.to_pandas().set_index("digit")["n"]
    n = np.array([int(df.get(str(d), 0)) for d in range(1, 10)],
                 np.float64)
    total = n.sum()
    exp_p = np.log10(1 + 1.0 / np.arange(1, 10))
    exp_n = total * exp_p
    chi2_part = (n - exp_n) ** 2 / exp_n
    return pa.table({
        "digit": pa.array([str(d) for d in range(1, 10)]),
        "n": pa.array(n.astype(np.int64), pa.int64()),
        "obs_p": pa.array(round_np(n / total, 6)),
        "exp_p": pa.array(round_np(exp_p, 6)),
        "chi2_part": pa.array(round_np(chi2_part, 6)),
    })
