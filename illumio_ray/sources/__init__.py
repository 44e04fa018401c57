from .parquet import read_pages, read_table  # noqa: F401
from .jsonl import read_pages_jsonl  # noqa: F401
