"""Independent pure-Python per-row oracle for the flagship transform.

Deliberately row-at-a-time and `re`-based (like the reference's own
per-line loop, app/log_processor.py:337-356) so it shares no code with
the vectorized Arrow pipeline it checks.
"""

from __future__ import annotations

import re

TITLE = re.compile(r"<title>([^<]*)</title>")
EVENT = re.compile(r'<meta name="event" content="([^"]*)"/>')
BODY = re.compile(r"<body>(.*?)</body>")
HOST = re.compile(r"^https?://([^/]+)(/.*)?$")
TOKEN = re.compile(r"[A-Za-z0-9_]+")

AUDIT_EVENTS = {"login", "error", "admin"}
AUDIT_CATEGORIES = {"gov", "malware"}
BEATNAME = "webbeat"
MAX_LEN = 2048
DEVICE_TYPES = {
    "auditable_events": "IllumioAudit",
    "summaries": "IllumioSummary",
    "unknown": "IllumioUnknown",
}
FIELD_SPECS = {
    "auditable_events": [
        ("time", "time_iso"), ("objectname", "title"), ("url", "url"),
        ("command", "page_event"), ("severity", "host_category"),
        ("login", "lang"), ("vmid", "page_event"),
    ],
    "summaries": [
        ("time", "time_iso"), ("object", "url_host"), ("objectname", "title"),
        ("objecttype", "host_category"), ("process", "page_event"),
        ("quantity", "n_tokens_str"), ("sname", "url_host"),
        ("login", "lang"), ("tag5", "lang_family"),
    ],
    "unknown": [
        ("time", "time_iso"), ("object", "url_host"), ("status", "const_unparsed"),
    ],
}


def _safe(v):
    if v is None:
        return None
    if isinstance(v, str):
        v = v.strip()
        return v or None
    return v


def transform_row(row: dict, lang_lookup: dict, host_lookup: dict) -> dict | None:
    """pages row → routed row dict, or None if the row is dropped."""
    html = row["html"].decode("utf-8")
    m = BODY.search(html)
    if m is None:
        return None
    extracted_text = m.group(1)
    title = _safe(TITLE.search(html).group(1) if TITLE.search(html) else None)
    em = EVENT.search(html)
    page_event = em.group(1) if em else None
    hm = HOST.match(row["url"])
    url_host = hm.group(1) if hm else None
    url_path = hm.group(2) if hm else None
    n_tokens = len(TOKEN.findall(extracted_text))
    lang = row["lang"]
    lang_name, lang_family = lang_lookup.get(lang, (None, None))
    host_category, host_rank = host_lookup.get(url_host, (None, None))

    if (page_event in AUDIT_EVENTS) or (host_category in AUDIT_CATEGORIES):
        event_class = "auditable_events"
    elif page_event is None:
        event_class = "unknown"
    else:
        event_class = "summaries"

    ts = row["warc_ts"]
    hour = ts.replace(minute=0, second=0, microsecond=0)

    out = {
        "url": row["url"],
        "warc_ts": ts,
        "lang": lang,
        "url_host": url_host,
        "url_path": url_path,
        "title": title,
        "page_event": page_event,
        "extracted_text": extracted_text,
        "n_tokens": n_tokens,
        "lang_name": lang_name,
        "lang_family": lang_family,
        "host_category": host_category,
        "host_rank": host_rank,
        "event_class": event_class,
        "hour": hour,
    }
    out["wire"] = wire_for(out)
    return out


def wire_for(r: dict) -> str:
    device_type = DEVICE_TYPES[r["event_class"]]
    vals = dict(r)
    # Always-6-digit fractional seconds: pyarrow's timestamp→string cast
    # (and the SQL oracle's '%Y-%m-%d %H:%M:%S.%f') print '.000000' for
    # whole seconds, which str(pandas.Timestamp) drops.
    vals["time_iso"] = r["warc_ts"].strftime("%Y-%m-%d %H:%M:%S.%f")
    vals["n_tokens_str"] = str(r["n_tokens"])
    vals["const_unparsed"] = "unparsed"
    pieces = [f"beatname={BEATNAME}", f"device_type={device_type}",
              f"fullyqualifiedbeatname={BEATNAME}"]
    for key, src in FIELD_SPECS[r["event_class"]]:
        v = vals.get(src)
        if v is None or v == "":
            continue
        pieces.append(f"{key}={str(v).replace('|', '_')}")
    pieces.append(f"tag1={device_type}")
    fields_str = "|".join(pieces)
    orig = (r["extracted_text"] or "").replace("|", "_")
    prefix = "|original_message="
    budget = MAX_LEN - len(prefix) - len(fields_str)
    if len(orig) > budget:
        orig = orig[: max(0, budget - 3)] + "..."
    return fields_str + prefix + orig


def run_oracle(pages_df, lang_df, host_df) -> list[dict]:
    lang_lookup = {r.lang: (r.lang_name, r.lang_family) for r in lang_df.itertuples()}
    host_lookup = {r.url_host: (r.host_category, r.host_rank) for r in host_df.itertuples()}
    out = []
    for row in pages_df.to_dict("records"):
        t = transform_row(row, lang_lookup, host_lookup)
        if t is not None:
            out.append(t)
    return out
