"""CSV source: schema-coerced, gzip-aware ingestion.

≙ the reference's line-oriented ingest path (app/s3_manager.py download +
gunzip + line split) for delimited exports rather than JSONL. Built on
ray.data.read_csv → pyarrow.csv streaming reader: decompression is inferred
from the .gz extension, parsing is block-streamed (never whole-file), and an
EXPLICIT column_types mapping pins the schema — type inference over a
sample is how a big CSV silently flips an int column to string mid-ingest
at scale. Pass ``columns`` to prune at the read, same contract as the
parquet sources.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data as rd


def read_csv_table(path: str | Path, schema: pa.Schema,
                   columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Read a CSV (optionally .gz) with the schema PINNED, not inferred.

    ``schema`` declares every column's type; timestamps must be ISO-8601
    (pyarrow's CSV timestamp parser). ``columns`` prunes during parse
    (include_columns), so dropped columns never materialize."""
    convert = pacsv.ConvertOptions(
        column_types={f.name: f.type for f in schema},
        include_columns=columns or None,
    )
    return rd.read_csv(str(path), convert_options=convert, **kwargs)


EVENTS_CSV_SCHEMA = pa.schema([
    ("event_id", pa.int64()),
    ("ts", pa.timestamp("us")),
    ("user_id", pa.int64()),
    ("event_type", pa.string()),
    ("value", pa.float64()),
    ("props", pa.string()),
])


def read_events_csv(path: str | Path,
                    columns: list[str] | None = None) -> rd.Dataset:
    """The events table from a CSV/CSV.gz export (same schema as the
    parquet testdata table)."""
    return read_csv_table(path, EVENTS_CSV_SCHEMA, columns=columns)
