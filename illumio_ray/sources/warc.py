"""WARC source/sink — Common Crawl's native container (ISO 28500 /
WARC 1.1, public spec). Fourth proof of the §2.10 extension surface
(ORC = columnar stripes, CSV.gz = compressed text, Avro = row
containers, WARC = archival records), and the one that matches the
flagship's input domain: the pages table (`url, warc_ts, html`) IS the
payload a WARC response record carries.

Layout follows the Common Crawl convention: every record is its own
gzip MEMBER, so a `.warc.gz` is a concatenation of independently
compressed records and a reader can stream record-at-a-time without
decompressing the whole file (stdlib ``gzip.GzipFile`` walks members
transparently). Each file leads with a `warcinfo` record (skipped on
read, like any non-response record).

Built on ray.data's FileBasedDatasource: discovery/parallelism/
filesystem come from the base class; this class only decodes. WARC is
a ROW format — ``columns`` prunes what leaves the decode stage (object
store bytes), not what is scanned, and the docstring says so instead
of pretending otherwise.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import FileBasedDatasource

_CRLF = b"\r\n"
_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
])
# records per yielded Arrow table: html payloads run ~1-10 KB, so this
# keeps output blocks in the low-MB range Ray Data streams comfortably
_BATCH_RECORDS = 2048


def _warc_date(us_epoch: int) -> bytes:
    """WARC-Date (WARC 1.1 allows fractional seconds): microsecond UTC."""
    sec, us = divmod(us_epoch, 1_000_000)  # int split — no float rounding
    dt = datetime.fromtimestamp(sec, tz=timezone.utc)
    return (dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{us:06d}Z").encode()


def _parse_warc_date(raw: bytes) -> int:
    """Microseconds since epoch — integer timedelta arithmetic, no float."""
    s = raw.decode()
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
    d = dt - datetime(1970, 1, 1, tzinfo=timezone.utc)
    return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds


def _record(headers: list[tuple[bytes, bytes]], payload: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF + b"".join(
        k + b": " + v + _CRLF for k, v in headers)
    return (head + b"Content-Length: " + str(len(payload)).encode() + _CRLF
            + _CRLF + payload + _CRLF + _CRLF)


def write_warc(table: pa.Table, path) -> int:
    """Write (url, warc_ts, html) rows as a per-record-gzip-member
    `.warc.gz` (Common Crawl layout). Deterministic bytes for a given
    table. Returns the record count (excluding the warcinfo header)."""
    urls = table["url"].to_pylist()
    ts = table["warc_ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()
    htmls = table["html"].to_pylist()
    with open(path, "wb") as raw:
        info = _record(
            [(b"WARC-Type", b"warcinfo"),
             (b"WARC-Date", _warc_date(ts[0] if ts else 0)),
             (b"Content-Type", b"application/warc-fields")],
            b"software: illumio_ray\r\nformat: WARC File Format 1.1\r\n")
        raw.write(gzip.compress(info, 6, mtime=0))
        for url, t, html in zip(urls, ts, htmls):
            body = html or b""
            http = (b"HTTP/1.1 200 OK" + _CRLF
                    + b"Content-Type: text/html; charset=UTF-8" + _CRLF
                    + b"Content-Length: " + str(len(body)).encode() + _CRLF
                    + _CRLF + body)
            rec = _record(
                [(b"WARC-Type", b"response"),
                 (b"WARC-Target-URI", url.encode()),
                 (b"WARC-Date", _warc_date(t)),
                 (b"Content-Type", b"application/http; msgtype=response")],
                http)
            raw.write(gzip.compress(rec, 6, mtime=0))
    return len(urls)


def _iter_records(stream: io.BufferedIOBase):
    """Yield (warc_headers: dict[bytes, bytes], payload: bytes) from a
    decompressed WARC byte stream. Tolerates any number of blank lines
    between records (the spec mandates exactly two CRLFs)."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record boundary: {line[:40]!r}")
        headers: dict[bytes, bytes] = {}
        while True:
            line = stream.readline()
            if line.strip() == b"":
                break
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers[b"content-length"])
        payload = stream.read(clen)
        if len(payload) != clen:
            raise ValueError("truncated WARC record payload")
        yield headers, payload


class _Buf:
    """Forward-only buffered reader over the datasource stream (same
    shape as avro._Fwd, plus readline): only the current chunk is ever
    resident, so a multi-GB WARC never materializes in the read task."""

    _CHUNK = 1 << 20

    def __init__(self, f):
        self._f = f
        self._buf = b""
        self._pos = 0
        self._eof = False

    def _more(self) -> bool:
        if self._eof:
            return False
        chunk = self._f.read(self._CHUNK)
        if not chunk:
            self._eof = True
            return False
        self._buf = self._buf[self._pos:] + chunk
        self._pos = 0
        return True

    def peek2(self) -> bytes:
        while len(self._buf) - self._pos < 2 and self._more():
            pass
        return self._buf[self._pos:self._pos + 2]

    def read(self, n: int = -1) -> bytes:
        if n < 0:
            while self._more():
                pass
            out = self._buf[self._pos:]
            self._pos = len(self._buf)
            return out
        while len(self._buf) - self._pos < n and self._more():
            pass
        out = self._buf[self._pos:self._pos + n]
        self._pos += len(out)
        return out

    def readline(self) -> bytes:
        while True:
            i = self._buf.find(b"\n", self._pos)
            if i >= 0:
                out = self._buf[self._pos:i + 1]
                self._pos = i + 1
                return out
            if not self._more():
                out = self._buf[self._pos:]
                self._pos = len(self._buf)
                return out


class WARCDatasource(FileBasedDatasource):
    _FILE_EXTENSIONS = ["warc.gz", "warc"]

    def __init__(self, paths, columns: list[str] | None = None, **kwargs):
        super().__init__(paths, file_extensions=self._FILE_EXTENSIONS,
                         **kwargs)
        if columns is not None:
            unknown = set(columns) - set(_SCHEMA.names)
            if unknown:
                raise ValueError(f"unknown WARC columns: {sorted(unknown)}")
        self._columns = columns

    def _read_stream(self, f, path: str):
        # The stream may arrive raw OR already gunzipped (pyarrow
        # filesystems default compression='detect' on open), so sniff
        # the magic instead of trusting the extension. Multi-member
        # gzip: GzipFile walks member boundaries itself.
        buf = _Buf(f)
        stream = (io.BufferedReader(
            gzip.GzipFile(fileobj=buf))  # type: ignore[arg-type]
            if buf.peek2() == b"\x1f\x8b" else buf)
        urls: list[str] = []
        ts: list[int] = []
        htmls: list[bytes] = []

        def flush() -> pa.Table:
            t = pa.table({
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.int64()).cast(
                    pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
            })
            urls.clear(); ts.clear(); htmls.clear()
            return t.select(self._columns) if self._columns else t

        for headers, payload in _iter_records(stream):
            if headers.get(b"warc-type") != b"response":
                continue
            # payload = HTTP response: headers, blank line, body
            sep = payload.find(b"\r\n\r\n")
            body = payload[sep + 4:] if sep >= 0 else payload
            urls.append(headers[b"warc-target-uri"].decode())
            ts.append(_parse_warc_date(headers[b"warc-date"]))
            htmls.append(body)
            if len(urls) >= _BATCH_RECORDS:
                yield flush()
        if urls:
            yield flush()


def read_warc(paths, columns: list[str] | None = None,
              **kwargs) -> rd.Dataset:
    """Read WARC file(s)/dir(s) (gzip-per-record or plain) into a
    Dataset of (url, warc_ts, html) response rows."""
    return rd.read_datasource(WARCDatasource(paths, columns=columns),
                              **kwargs)
