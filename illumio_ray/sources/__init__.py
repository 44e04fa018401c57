from .parquet import read_pages, read_table  # noqa: F401
from .jsonl import read_pages_jsonl  # noqa: F401
from .csv import read_csv_table, read_events_csv  # noqa: F401
