"""Declarative per-event-class field-mapping registry.

≙ the reference's ``transform_log_based_on_policy``
(app/log_processor.py:368-478): a fixed, ordered output projection per log
type, constants injected (beatname / device_type), None/empty fields
dropped at serialization. Adding an event class here touches no engine
code — this is the user-extension surface (SURVEY.md §2.10).

Each spec maps an ordered list of (siem_key, source_column) pairs; source
columns are the post-enrichment routed columns. ``time`` is derived from
``warc_ts`` (input-derived, reproducible — the documented deviation from
the reference's wall-clock syslog header, SURVEY.md M11).
"""

from __future__ import annotations

from ..schema import CLASS_AUDIT, CLASS_SUMMARY, CLASS_UNKNOWN

DEVICE_TYPES = {
    CLASS_AUDIT: "IllumioAudit",
    CLASS_SUMMARY: "IllumioSummary",
    CLASS_UNKNOWN: "IllumioUnknown",
}

# Ordered (siem_key, column) projections per class — ≙ field_order
# (app/log_processor.py:379-389) restricted to fields this payload has.
FIELD_SPECS: dict[str, list[tuple[str, str]]] = {
    CLASS_AUDIT: [
        ("time", "time_iso"),
        ("objectname", "title"),
        ("url", "url"),
        ("command", "page_event"),
        ("severity", "host_category"),
        ("login", "lang"),
        ("vmid", "page_event"),
    ],
    CLASS_SUMMARY: [
        ("time", "time_iso"),
        ("object", "url_host"),
        ("objectname", "title"),
        ("objecttype", "host_category"),
        ("process", "page_event"),
        ("quantity", "n_tokens_str"),
        ("sname", "url_host"),
        ("login", "lang"),
        ("tag5", "lang_family"),
    ],
    CLASS_UNKNOWN: [
        ("time", "time_iso"),
        ("object", "url_host"),
        ("status", "const_unparsed"),
    ],
}
