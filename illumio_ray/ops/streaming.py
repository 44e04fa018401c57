"""Event-time watermarks over an arrival-ordered stream, in batch form.

The missing §2.9 streaming semantic: the reference's poll loop
(app/main.py's while-True over new S3 fragments) processes fragments in
ARRIVAL order while their contents carry EVENT time — a row can arrive
after the clock has moved past it. Streaming engines handle that with a
watermark: after each arrival unit, the watermark is the max event time
seen so far minus an allowed lateness; a row is LATE when it arrives in
a unit whose starting watermark already passed its event time. Late rows
are excluded from on-time window aggregates and routed to a side report
(the dead-letter convention, same as validate.split).

Batch re-expression, fully distributed:
  1. per-block partial (arrival_unit, max event ts) — tiny;
  2. driver prefix-max over the unit table (bounded: #arrival units ≈
     #polls, NOT #rows) → per-unit starting watermark;
  3. broadcast the (sorted units, watermark) arrays back through a
     row-local map_batches flag — searchsorted lookup, no shuffle.
The only driver state is O(#units), the same bound the reference's
processed-keys manifest already accepts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .relational import grouped_agg


def _unit_watermarks(ds: rd.Dataset, ts_col: str, unit_col: str,
                     lateness_us: int) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unit ids, starting watermark per unit as int64 us).
    Watermark BEFORE unit u = max(ts over units < u) − lateness; the
    first unit has no predecessor → int64 min (nothing is late)."""
    mx = grouped_agg(ds.select_columns([unit_col, ts_col]), [unit_col],
                     [(ts_col, "max", "__mx")], mode="driver")
    t = pa.concat_tables(
        mx.iter_batches(batch_format="pyarrow", batch_size=None))
    units = t[unit_col].to_numpy(zero_copy_only=False)
    mxs = t["__mx"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
        .astype(np.int64)
    order = np.argsort(units, kind="stable")
    units, mxs = units[order], mxs[order]
    if len(units) == 0:  # empty input: nothing to flag
        return units, np.empty(0, np.int64)
    prefix = np.maximum.accumulate(mxs)
    wm = np.empty(len(units), np.int64)
    wm[0] = np.iinfo(np.int64).min
    if len(units) > 1:
        # subtract lateness only where a predecessor exists (iinfo.min
        # minus anything would wrap)
        wm[1:] = prefix[:-1] - lateness_us
    return units, wm


def flag_late_rows(ds: rd.Dataset, ts_col: str, unit_col: str,
                   lateness_sec: float,
                   out_col: str = "is_late") -> rd.Dataset:
    """Append ``out_col``: True where the row's event time is older than
    the watermark its arrival unit started with."""
    units, wm = _unit_watermarks(ds, ts_col, unit_col,
                                 int(lateness_sec * 1_000_000))

    def fn(t: pa.Table) -> pa.Table:
        if len(units) == 0:
            return t.append_column(
                out_col, pa.array(np.zeros(t.num_rows, bool)))
        u = t[unit_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(units, u)
        ts = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return t.append_column(out_col, pa.array(ts < wm[idx]))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def late_report(ds: rd.Dataset, ts_col: str, unit_col: str,
                lateness_sec: float) -> rd.Dataset:
    """→ (unit, n_late, n_rows) per arrival unit — the per-poll health
    row the reference's report thread would print. Bounded output."""
    flagged = flag_late_rows(ds, ts_col, unit_col, lateness_sec)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            unit_col: t[unit_col],
            "__l": pc.cast(t["is_late"], pa.int64()),
            "__n": pa.array(np.ones(t.num_rows, np.int64)),
        })

    return grouped_agg(flagged.map_batches(partial, batch_format="pyarrow",
                                           zero_copy_batch=True),
                       [unit_col],
                       [("__l", "sum", "n_late"), ("__n", "sum", "n_rows")],
                       mode="driver")
