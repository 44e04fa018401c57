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
