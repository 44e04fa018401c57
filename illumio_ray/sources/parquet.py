"""Column-pruned parquet sources.

≙ the reference's S3 listing + download + gunzip chain
(app/s3_manager.py:160-354), subsumed by ray.data.read_parquet: fragment
discovery = listing (S1), Arrow's decompression/projection = download +
gunzip (S2), reader-task retries = the retry decorators (S3). Always pass
``columns`` — a read that loads all columns for a narrow transform is
wrong at 100 TB.
"""

from __future__ import annotations

from pathlib import Path

import ray.data as rd


def read_pages(pages_dir: str | Path, columns: list[str] | None = None,
               **kwargs) -> rd.Dataset:
    return rd.read_parquet(str(pages_dir), columns=columns, **kwargs)


def read_table(sf_dir: str | Path, name: str,
               columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Read one driver testdata table (region/nation/.../documents)."""
    return rd.read_parquet(str(Path(sf_dir) / f"{name}.parquet"),
                           columns=columns, **kwargs)


def compact_parquet(in_path: str | Path, out_dir: str | Path,
                    target_mb: int = 64) -> dict:
    """Small-file compaction: rewrite a parquet directory into blocks of
    ~``target_mb`` on-disk bytes (the operational fix for the classic
    many-tiny-files layout that makes every later read pay per-file open
    + footer costs). Sizing uses the REAL input bytes from the fragment
    footers — never Ray's row-count heuristic; one streaming
    repartition, no driver materialization."""
    import pyarrow.dataset as pads

    frags = pads.dataset(str(in_path)).files
    total = sum(Path(f).stat().st_size for f in frags)
    n_blocks = max(1, total // (target_mb * 1024 * 1024))
    ds = rd.read_parquet(str(in_path))
    ds.repartition(int(n_blocks)).write_parquet(
        str(out_dir), min_rows_per_file=10**9)  # one file per block
    out_files = list(Path(out_dir).glob("*.parquet"))
    return {"files_in": len(frags), "files_out": len(out_files),
            "bytes_in": int(total)}
