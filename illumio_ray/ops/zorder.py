"""Z-order (Morton) data layout: multi-column data skipping at the read.

A single-column sort gives perfect parquet min/max pruning on that column
and NONE on any other. Interleaving the bits of 2–3 scaled columns into
one sort key clusters rows so every file covers a small rectangle of the
key space — a range predicate on ANY of the interleaved columns then
prunes most files from their footer stats alone, before a byte of data
moves. This is the "prune at the read" story for workloads that filter on
more than one dimension (user AND time), paid once at layout time like
the hash-bucketed join layout in bucketing.py.

The layout job is one extra narrow column + one distributed sort; reading
is plain ray.data.read_parquet with a filter (pyarrow prunes row groups
from statistics). fraction_scanned() measures the skip rate from footer
metadata only — the number the layout exists to minimize.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _spread_bits_21(v: np.ndarray) -> np.ndarray:
    """Spread each of the low 21 bits of v two positions apart (classic
    Morton magic-number dilation, 64-bit)."""
    x = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def zorder_key(cols: list[np.ndarray], los: list[float],
               his: list[float], bits: int = 21) -> np.ndarray:
    """Interleaved Morton key for up to 3 columns. Each column is scaled
    linearly from its [lo, hi] data range onto [0, 2^bits) first —
    interleaving raw values with wildly different ranges would let one
    column dominate the high bits."""
    if not 1 <= len(cols) <= 3:
        raise ValueError("zorder_key interleaves 1-3 columns")
    if bits > 21:
        raise ValueError("21 bits per column is the 64-bit budget at 3 cols")
    top = float(2**bits - 1)
    out = np.zeros(len(cols[0]), dtype=np.uint64)
    for i, (c, lo, hi) in enumerate(zip(cols, los, his)):
        span = max(float(hi) - float(lo), 1e-300)
        scaled = np.clip((c.astype(np.float64) - lo) / span, 0.0, 1.0)
        q = (scaled * top).astype(np.uint64)
        out |= _spread_bits_21(q) << np.uint64(i)
    return out


def write_zordered(ds: rd.Dataset, cols: list[str], out_dir: str | Path,
                   num_files: int = 64, bits: int = 21) -> str:
    """Write ``ds`` z-ordered by ``cols`` into ~num_files parquet files.
    One bounded stats pass (per-column min/max — six numbers), one narrow
    key column, one distributed sort; files then cover near-disjoint
    rectangles of the col space."""
    stats = [(ds.min(c), ds.max(c)) for c in cols]
    los = [float(s[0]) for s in stats]
    his = [float(s[1]) for s in stats]

    def add_z(t: pa.Table) -> pa.Table:
        arrs = [pc.cast(t[c], pa.float64()).to_numpy(zero_copy_only=False)
                for c in cols]
        z = zorder_key(arrs, los, his, bits)
        return t.append_column("__z", pa.array(z.astype(np.int64)))

    keyed = ds.map_batches(add_z, batch_format="pyarrow",
                           zero_copy_batch=True)
    (keyed.sort("__z")
          .repartition(num_files)
          .drop_columns(["__z"])
          .write_parquet(str(out_dir)))
    return str(out_dir)


def fraction_scanned(layout_dir: str | Path, col: str,
                     lo, hi) -> float:
    """Fraction of ROW GROUPS whose [min, max] stats intersect
    [lo, hi] — computed from parquet footers only (what a pushed-down
    filter actually reads). The data-skipping effectiveness metric."""
    import pyarrow.parquet as pq

    total = hit = 0
    for f in sorted(Path(layout_dir).glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i
               for i in range(len(md.schema))}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                hit += 1
            elif not (st.max < lo or st.min > hi):
                hit += 1
    return hit / max(total, 1)
