"""Regex field extraction over zero-copy Arrow batches.

The grok-style parse step: RE2 patterns (pyarrow.compute.extract_regex is
RE2-backed, same engine as the DuckDB oracle's regexp_extract) pulling
structured fields out of the raw ``html`` payload. ≙ the reference's
per-log-type field mappers (app/log_processor.py:399-446) and its
json.loads + drop-invalid-line path (app/log_processor.py:344-356).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import BODY_RE, EVENT_RE, HOST_RE, TITLE_RE, TOKEN_RE


def safe_get_normalize(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Trim whitespace; empty-after-trim → null.

    Vectorized analogue of the reference's ``safe_get``
    (app/log_processor.py:391-397: ``value.strip() or None``).
    """
    trimmed = pc.utf8_trim_whitespace(col)
    return pc.if_else(pc.equal(trimmed, ""), pa.scalar(None, pa.string()), trimmed)


def _group(col, pattern: str, field: str):
    """extract_regex → one named group column (null when no match)."""
    struct = pc.extract_regex(col, pattern)
    return pc.struct_field(struct, field)


def extract_page_fields(batch: pa.Table) -> pa.Table:
    """html/url → structured fields; rows whose <body> cannot be extracted
    are DROPPED (the parse-error-drop path). Output drops the heavy html
    column — nothing downstream re-reads payload bytes.

    Input schema:  PAGES_SCHEMA (url, warc_ts, html, text, lang)
    Output schema: url, warc_ts, lang, url_host, url_path, title,
                   page_event, extracted_text, n_tokens
    """
    html = pc.cast(batch["html"], pa.string())  # validates UTF-8
    extracted_text = _group(html, BODY_RE, "extracted_text")
    keep = pc.is_valid(extracted_text)

    out = pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "html_str": html,
            "extracted_text": extracted_text,
        }
    ).filter(keep)

    html_kept = out["html_str"]
    title = safe_get_normalize(_group(html_kept, TITLE_RE, "title"))
    page_event = _group(html_kept, EVENT_RE, "page_event")
    # one RE2 pass over url yields BOTH named groups (extract_regex returns
    # the full struct; running it per-field doubled the scan)
    url_struct = pc.extract_regex(out["url"], HOST_RE)
    url_host = pc.struct_field(url_struct, "url_host")
    url_path = pc.struct_field(url_struct, "url_path")
    n_tokens = pc.cast(
        pc.count_substring_regex(out["extracted_text"], TOKEN_RE), pa.int64()
    )

    return pa.table(
        {
            "url": out["url"],
            "warc_ts": out["warc_ts"],
            "lang": out["lang"],
            "url_host": url_host,
            "url_path": url_path,
            "title": title,
            "page_event": page_event,
            "extracted_text": out["extracted_text"],
            "n_tokens": n_tokens,
        }
    )
