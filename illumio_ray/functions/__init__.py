"""Vectorized scalar-function library (pyarrow.compute / numpy kernels).

Every hot-path function here is batch-vectorized — no per-row Python in
pipeline stages. ≙ the reference's scalar-function inventory
(SURVEY.md §2.8; reference app/log_processor.py safe_get/format helpers),
re-expressed as Arrow kernels.
"""

from .extract import extract_page_fields, safe_get_normalize  # noqa: F401
from .hashing import hash64, salt_column  # noqa: F401
