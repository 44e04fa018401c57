"""WARC source/sink — Common Crawl's native container (ISO 28500 /
WARC 1.1, public spec). Fourth proof of the §2.10 extension surface
(ORC = columnar stripes, CSV.gz = compressed text, Avro = row
containers, WARC = archival records), and the one that matches the
flagship's input domain: the pages table (`url, warc_ts, html`) IS the
payload a WARC response record carries.

Layout follows the Common Crawl convention: every record is its own
gzip MEMBER, so a `.warc.gz` is a concatenation of independently
compressed records — the reader decompresses member-at-a-time and a
corrupt/truncated record drops only its own member (resync at the next
gzip magic, the standard crawl-archive recovery). Each file leads with
a `warcinfo` record (skipped on read, like any non-response record).

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
    # WARC/1.1, not 1.0: fractional-second WARC-Dates (which _warc_date
    # always emits) only exist in 1.1 — a strict validator rejects them
    # under a 1.0 version stamp
    head = b"WARC/1.1" + _CRLF + b"".join(
        k + b": " + v + _CRLF for k, v in headers)
    return (head + b"Content-Length: " + str(len(payload)).encode() + _CRLF
            + _CRLF + payload + _CRLF + _CRLF)


# Bump whenever write_warc's output bytes change for the same input —
# derived caches key on it (same pattern as _SHINGLE_SCHEME in
# ops/dedup.py), so a stale cache can never mask a writer change.
WRITER_VERSION = 2


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


def _iter_member_records(buf: "_Buf"):
    """Yield records from per-record-gzip-member WARC: each member
    decompresses and parses INDEPENDENTLY, so a truncated/corrupt record
    drops only itself — the standard crawl-archive recovery, and the
    reason Common Crawl uses member-per-record.

    A healthy member's byte length is taken from the inflater's own
    accounting (never from magic scanning, which compressed bytes can
    fake), so false magics inside healthy members are never visited. On
    a corrupt member the scan resumes from the byte AFTER its start, so
    every true member boundary downstream is eventually tried — the
    gzip CRC trailer rejects misaligned attempts. Framing or field
    defects inside one member drop the member, never the file."""
    import zlib

    _CH = 1 << 20
    data = buf.read(_CH)
    eof_in = len(data) < _CH  # _Buf.read returns short only at EOF
    pos = 0
    while pos < len(data) or not eof_in:
        if pos >= len(data):
            data = buf.read(_CH)
            eof_in = len(data) < _CH
            pos = 0
            if not data:
                return
        d = zlib.decompressobj(31)
        parts: list[bytes] = []
        ok = False
        try:
            parts.append(d.decompress(data[pos:]))
            while not d.eof and not eof_in:
                chunk = buf.read(_CH)
                eof_in = len(chunk) < _CH
                data += chunk
                parts.append(d.decompress(chunk))
            ok = d.eof
        except zlib.error:
            ok = False
        if ok:
            consumed = (len(data) - pos) - len(d.unused_data)
            member = io.BufferedReader(io.BytesIO(b"".join(parts)))
            try:
                yield from _iter_records(member)
            except (ValueError, KeyError):
                pass  # malformed record inside this member → drop member
            pos += consumed
        else:
            i = data.find(b"\x1f\x8b\x08", pos + 1)
            while i < 0 and not eof_in:
                keep_from = max(pos + 1, len(data) - 2)
                chunk = buf.read(_CH)
                eof_in = len(chunk) < _CH
                data += chunk
                i = data.find(b"\x1f\x8b\x08", keep_from)
            if i < 0:
                return  # corrupt tail, no further member boundary
            pos = i
        if pos > _CH:  # bound resident memory to the unconsumed suffix
            data = data[pos:]
            pos = 0


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

    def _open_input_source(self, filesystem, path, **open_args):
        # compression=None: keep the RAW bytes. pyarrow's default
        # 'detect' would gunzip upstream as one continuous stream, whose
        # inflater aborts the whole file on the first corrupt member —
        # member-level decompression (and resync past bad members) is
        # this reader's job.
        open_args.pop("compression", None)
        return filesystem.open_input_stream(path, compression=None,
                                            **open_args)

    def _read_stream(self, f, path: str):
        # The stream may arrive raw OR already gunzipped (pyarrow
        # filesystems default compression='detect' on open), so sniff
        # the magic instead of trusting the extension. Gzipped input
        # goes through the member-resyncing iterator (a corrupt record
        # drops only its member — the jsonl drop-invalid-line policy at
        # record granularity); a plain .warc has no resync points, so
        # framing stays strict there and only FIELD defects drop.
        buf = _Buf(f)
        records = (_iter_member_records(buf)
                   if buf.peek2() == b"\x1f\x8b" else _iter_records(buf))
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

        for headers, payload in records:
            if headers.get(b"warc-type") != b"response":
                continue
            try:
                # field defects (odd WARC-Date formats, missing URI,
                # non-utf8 URI) drop the record, never the file
                url = headers[b"warc-target-uri"].decode()
                t = _parse_warc_date(headers[b"warc-date"])
            except (KeyError, ValueError, UnicodeDecodeError):
                continue
            # payload = HTTP response: headers, blank line, body
            sep = payload.find(b"\r\n\r\n")
            body = payload[sep + 4:] if sep >= 0 else payload
            urls.append(url)
            ts.append(t)
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
