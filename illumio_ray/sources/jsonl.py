"""Gzipped-JSONL source — the reference's actual wire-in format.

≙ app/s3_manager.py:304-354 (``download_and_extract``: stream-gunzip a
``.gz`` object, split lines, count valid vs invalid JSON) recast as a Ray
Data read: ``read_json`` handles discovery, decompression, and parallel
parse; malformed lines are DROPPED per the reference's
skip-and-log-per-line policy (app/log_processor.py:353-356) rather than
failing the file. Rows are cast to the canonical pages schema
(warc_ts accepted as ISO-8601 strings or epoch microseconds; html as
base64 or plain text bytes).
"""

from __future__ import annotations

import base64
import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..schema import PAGES_SCHEMA

_REQUIRED = ("url", "warc_ts", "html", "text", "lang")


def _parse_lines_batch(batch: pa.Table) -> pa.Table:
    """text-line batch → pages rows; invalid/malformed lines dropped.

    Per-line json.loads is inherent to schemaless JSONL validation (the
    reference does the same, line by line); everything downstream of this
    boundary is vectorized Arrow."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for line in batch["text"].to_pylist():
        if not line or not line.strip():
            continue
        try:
            obj = json.loads(line)
            url = obj["url"]
            ts_raw = obj["warc_ts"]
            if isinstance(ts_raw, (int, float)):
                ts = np.datetime64(int(ts_raw), "us")
            else:
                ts = np.datetime64(str(ts_raw).replace("Z", ""), "us")
            html_raw = obj["html"]
            if isinstance(html_raw, str):
                try:
                    html = base64.b64decode(html_raw, validate=True)
                except (ValueError, TypeError):
                    html = html_raw.encode("utf-8")
            else:
                raise TypeError("html must be a string")
            text = obj["text"]
            lang = obj["lang"]
            if not isinstance(url, str) or not isinstance(text, str) \
                    or not isinstance(lang, str):
                raise TypeError("bad field types")
        except (KeyError, TypeError, ValueError, json.JSONDecodeError):
            continue  # drop-invalid-line policy
        urls.append(url)
        tss.append(ts)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(np.array(tss, dtype="datetime64[us]")
                            if tss else [], pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }, schema=PAGES_SCHEMA)


def read_pages_jsonl(path: str | Path, **kwargs) -> rd.Dataset:
    """Read .jsonl / .jsonl.gz page files into the canonical pages schema.

    Uses read_text (arrow handles gzip by extension) + a vectorized-batch
    parse stage; line-level errors drop the line, never the file."""
    ds = rd.read_text(str(path), **kwargs)
    return ds.map_batches(_parse_lines_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
