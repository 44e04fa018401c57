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


def _parse_ts(ts_raw) -> np.datetime64:
    """ISO-8601 string (optionally with a single trailing 'Z') or epoch
    microseconds. Offset-bearing timestamps ('+02:00') are REJECTED rather
    than passed to numpy — numpy's tz parsing is deprecated and would flip
    such rows from parsed to silently dropped on an upgrade."""
    if isinstance(ts_raw, bool):  # bool is an int subclass; not a timestamp
        raise TypeError("bool is not a timestamp")
    if isinstance(ts_raw, (int, float)):
        return np.datetime64(int(ts_raw), "us")
    s = str(ts_raw)
    if s.endswith("Z"):
        s = s[:-1]
    if "+" in s or (len(s) > 10 and s[10:].count("-")):
        raise ValueError(f"tz offsets not supported: {ts_raw!r}")
    return np.datetime64(s, "us")


def _parse_lines_batch(batch: pa.Table, html_encoding: str) -> pa.Table:
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
            if any(k not in obj for k in _REQUIRED):
                raise KeyError("missing required field")
            url = obj["url"]
            ts = _parse_ts(obj["warc_ts"])
            html_raw = obj["html"]
            if not isinstance(html_raw, str):
                raise TypeError("html must be a string")
            if html_encoding == "base64":
                html = base64.b64decode(html_raw, validate=True)
            else:  # "utf8": payload is the literal text
                html = html_raw.encode("utf-8")
            text = obj["text"]
            lang = obj["lang"]
            if not isinstance(url, str) or not isinstance(text, str) \
                    or not isinstance(lang, str):
                raise TypeError("bad field types")
        except (KeyError, TypeError, ValueError, OverflowError,
                json.JSONDecodeError):
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


def read_pages_jsonl(path: str | Path, html_encoding: str = "base64",
                     **kwargs) -> rd.Dataset:
    """Read .jsonl / .jsonl.gz page files into the canonical pages schema.

    Uses read_text (arrow handles gzip by extension) + a batch parse
    stage; line-level errors drop the line, never the file.

    ``html_encoding`` is EXPLICIT ('base64' or 'utf8'): sniffing would
    silently corrupt plain-text payloads that happen to be valid base64."""
    if html_encoding not in ("base64", "utf8"):
        raise ValueError("html_encoding must be 'base64' or 'utf8'")
    ds = rd.read_text(str(path), **kwargs)
    return ds.map_batches(
        lambda t: _parse_lines_batch(t, html_encoding),
        batch_format="pyarrow", zero_copy_batch=True)


def write_pages_jsonl(ds: rd.Dataset, out_dir: str | Path,
                      gzip_level: int = 6) -> list[str]:
    """Gzipped-JSONL SINK — the inverse of ``read_pages_jsonl``, for
    interchange with the reference's wire-in format and any downstream
    JSONL consumer. One ``.jsonl.gz`` member per block, written via a
    content-addressed temp name + atomic rename (retry-safe like every
    sink here); html bytes ride base64, timestamps ISO-8601 microseconds.
    Returns the written paths. Round-trips bit-exactly through
    ``read_pages_jsonl`` (pinned by test)."""
    import gzip
    import hashlib
    import os

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        lines = []
        urls = t["url"].to_pylist()
        tss = t["warc_ts"].to_pylist()
        htmls = t["html"].to_pylist()
        texts = t["text"].to_pylist()
        langs = t["lang"].to_pylist()
        for u, ts, h, x, lg in zip(urls, tss, htmls, texts, langs):
            lines.append(json.dumps({
                "url": u,
                "warc_ts": ts.isoformat(timespec="microseconds"),
                "html": base64.b64encode(h or b"").decode("ascii"),
                "text": x, "lang": lg,
            }, ensure_ascii=False, sort_keys=True))
        payload = gzip.compress(("\n".join(lines) + "\n").encode(),
                                compresslevel=gzip_level, mtime=0)
        name = hashlib.sha256(payload).hexdigest()[:16]
        final = out / f"pages-{name}.jsonl.gz"
        tmp = out / f".{final.name}.tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, final)  # atomic commit; rerun rewrites same name
        return pa.table({"path": pa.array([str(final)]),
                         "n": pa.array([t.num_rows], pa.int64())})

    res = ds.map_batches(write_block, batch_format="pyarrow",
                         zero_copy_batch=True)
    return [p for b in res.iter_batches(batch_format="pyarrow")
            for p in pa.table(b)["path"].to_pylist()]
