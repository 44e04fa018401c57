"""Arrow schemas and transform constants for the flagship pipeline.

The pages table is the graft's analogue of the reference's gzipped-JSONL
log files (reference: app/s3_manager.py:304-346); the routed output schema
is the analogue of the reference's fixed, ordered SIEM output projection
(reference: app/log_processor.py:379-389 `field_order`).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: Common-Crawl-style pages (BASELINE.json input_hint)
# ---------------------------------------------------------------------------
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Enrichment small sides (broadcast lookup tables; ≙ reference PCE label
# context that arrives pre-joined in src_labels/dst_labels,
# app/log_processor.py:452-453 — externalized here as dimension tables).
LOOKUP_LANG_SCHEMA = pa.schema(
    [
        pa.field("lang", pa.string()),
        pa.field("lang_name", pa.string()),
        pa.field("lang_family", pa.string()),
    ]
)

LOOKUP_HOST_SCHEMA = pa.schema(
    [
        pa.field("url_host", pa.string()),
        pa.field("host_category", pa.string()),
        pa.field("host_rank", pa.int64()),
    ]
)

# ---------------------------------------------------------------------------
# Routed output (per-sink parquet; ≙ reference transformed record,
# app/log_processor.py:368-478, minus the heavy html payload)
# ---------------------------------------------------------------------------
ROUTED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("url_host", pa.string()),
        pa.field("url_path", pa.string()),
        pa.field("title", pa.string()),
        pa.field("page_event", pa.string()),
        pa.field("extracted_text", pa.string()),  # byte-identity column
        pa.field("n_tokens", pa.int64()),
        pa.field("lang_name", pa.string()),
        pa.field("lang_family", pa.string()),
        pa.field("host_category", pa.string()),
        pa.field("host_rank", pa.int64()),
        pa.field("event_class", pa.string()),
        pa.field("hour", pa.timestamp("us")),
        pa.field("wire", pa.string()),  # serialized SIEM-style line (M10)
    ]
)

AGGREGATE_SCHEMA = pa.schema(
    [
        pa.field("sink", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("hour", pa.timestamp("us")),
        pa.field("n_docs", pa.int64()),
        pa.field("sum_tokens", pa.int64()),
    ]
)

# ---------------------------------------------------------------------------
# Extraction patterns — RE2-compatible so the Ray side (pyarrow.compute
# extract_regex, RE2) and the DuckDB oracle (regexp_extract, RE2) share
# byte-exact semantics. ≙ the reference's per-log-type field mappers
# (app/log_processor.py:399-446) recast as grok-style patterns over html.
# ---------------------------------------------------------------------------
TITLE_RE = r"<title>(?P<title>[^<]*)</title>"
EVENT_RE = r'<meta name="event" content="(?P<page_event>[^"]*)"/>'
BODY_RE = r"<body>(?P<extracted_text>.*?)</body>"
HOST_RE = r"^https?://(?P<url_host>[^/]+)(?P<url_path>/.*)?$"
TOKEN_RE = r"[A-Za-z0-9_]+"

# Router rule (≙ log_type derivation from the S3 key path,
# app/s3_manager.py:311, generalized to N sinks):
#   audit   — security-relevant page events or risky host categories
#   summary — everything else with a parseable event marker
#   unknown — body parsed but no event marker
AUDIT_EVENTS = ("login", "error", "admin")
AUDIT_CATEGORIES = ("gov", "malware")
CLASS_AUDIT = "auditable_events"
CLASS_SUMMARY = "summaries"
CLASS_UNKNOWN = "unknown"
EVENT_CLASSES = (CLASS_AUDIT, CLASS_SUMMARY, CLASS_UNKNOWN)

# SIEM wire format constants (≙ app/log_processor.py:480-497).
BEATNAME = "webbeat"
MAX_MESSAGE_LENGTH = 2048
