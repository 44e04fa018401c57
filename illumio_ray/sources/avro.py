"""Avro source — pure-stdlib Object Container File reader/writer.

≙ SURVEY §2.10 extension surface: neither Ray Data nor this container's
pyarrow ships an Avro codec, so this module implements the OCF spec
(magic, varint-zigzag primitives, deflate blocks, sync markers) directly
and plugs it into ray.data's FileBasedDatasource — same contract as
sources/orc.py. Each OCF *block* yields as its own Arrow table, so one
large file streams block-by-block with bounded memory; ``columns``
prunes at decode time (Avro is row-oriented, so skipped fields are still
walked over but never materialize into Python objects or Arrow arrays).

The per-row decode loop is inherent to a row-oriented container without
a C library (pyarrow decodes ORC/CSV natively; Avro it does not) — the
loop is bounded per block and the datasource exists to prove the format
plugs in, with the block/prune plumbing a real C decoder would reuse.

Supported schema subset (all the testdata tables need): records of
primitives {null, boolean, int, long, float, double, string, bytes},
nullable via ["null", T] unions, and the timestamp-micros logical type.
The writer is deterministic byte-for-byte (fixed sync marker derived
from the schema JSON) so cached fixtures are marker-keyed safely.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
import zlib
from pathlib import Path

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import FileBasedDatasource

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- varints

def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    return buf[pos:pos + n], pos + n


# ------------------------------------------------------- schema mapping

_ARROW_TO_AVRO = {
    pa.int32(): "int",
    pa.int64(): "long",
    pa.float32(): "float",
    pa.float64(): "double",
    pa.string(): "string",
    pa.binary(): "bytes",
    pa.bool_(): "boolean",
}


def _avro_schema_for(schema: pa.Schema, name: str = "row") -> dict:
    """Arrow schema → Avro record schema (every field nullable via
    ["null", T] — simplest and round-trips Arrow validity exactly)."""
    fields = []
    for f in schema:
        if pa.types.is_timestamp(f.type):
            if f.type.unit != "us":
                raise ValueError(f"only timestamp[us] supported: {f}")
            t: object = {"type": "long", "logicalType": "timestamp-micros"}
        elif pa.types.is_list(f.type):
            it = f.type.value_type
            if it not in _ARROW_TO_AVRO:
                raise ValueError(f"unsupported Avro array item type: {f}")
            t = {"type": "array", "items": _ARROW_TO_AVRO[it]}
        elif f.type in _ARROW_TO_AVRO:
            t = _ARROW_TO_AVRO[f.type]
        else:
            raise ValueError(f"unsupported Arrow type for Avro: {f}")
        fields.append({"name": f.name, "type": ["null", t]})
    return {"type": "record", "name": name, "fields": fields}


def _field_kinds(avro_schema: dict) -> list[tuple[str, str]]:
    """[(field_name, wire_kind)] with unions/logical types resolved.
    Kind is the wire primitive ('long' for timestamp-micros) or
    'array:<item_kind>' for arrays."""
    kinds = []
    for f in avro_schema["fields"]:
        t = f["type"]
        if isinstance(t, list):  # ["null", T]
            t = [x for x in t if x != "null"][0]
        if isinstance(t, dict):
            if t.get("type") == "array":
                t = f"array:{t['items']}"
            else:
                t = t["type"]
        kinds.append((f["name"], t))
    return kinds


def _arrow_type_for(avro_schema: dict) -> pa.Schema:
    prim = {"int": pa.int32(), "long": pa.int64(),
            "float": pa.float32(), "double": pa.float64(),
            "string": pa.string(), "bytes": pa.binary(),
            "boolean": pa.bool_()}
    out = []
    for f in avro_schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            t = [x for x in t if x != "null"][0]
        logical = None
        items = None
        if isinstance(t, dict):
            logical = t.get("logicalType")
            items = t.get("items")
            t = t["type"]
        if logical == "timestamp-micros":
            at: pa.DataType = pa.timestamp("us")
        elif t == "array":
            at = pa.list_(prim[items])
        else:
            at = prim[t]
        out.append(pa.field(f["name"], at))
    return pa.schema(out)


# --------------------------------------------------------------- writer

def _write_prim(body: io.BytesIO, kind: str, v) -> None:
    if kind in ("long", "int"):
        _write_long(body, int(v))
    elif kind == "double":
        body.write(struct.pack("<d", v))
    elif kind == "float":
        body.write(struct.pack("<f", v))
    elif kind == "string":
        _write_bytes(body, v.encode())
    elif kind == "bytes":
        _write_bytes(body, v)
    elif kind == "boolean":
        body.write(b"\x01" if v else b"\x00")
    else:  # pragma: no cover - guarded by _avro_schema_for
        raise ValueError(kind)

def write_avro(table: pa.Table, path: str | Path,
               block_rows: int = 8192, codec: str = "deflate") -> None:
    """Write an Arrow table as a deterministic Avro OCF (deflate blocks)."""
    avro_schema = _avro_schema_for(table.schema)
    kinds = _field_kinds(avro_schema)
    schema_json = json.dumps(avro_schema, sort_keys=True).encode()
    sync = hashlib.md5(schema_json).digest()  # deterministic 16 bytes

    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {"avro.schema": schema_json, "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)

    cols = []
    for name, _ in kinds:
        col = table[name]
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())  # timestamp-micros wire = long
        cols.append(col.to_pylist())
    n = table.num_rows
    for start in range(0, n, block_rows):
        stop = min(start + block_rows, n)
        body = io.BytesIO()
        for i in range(start, stop):
            for c, (_, kind) in enumerate(kinds):
                v = cols[c][i]
                if v is None:
                    _write_long(body, 0)  # union branch: null
                    continue
                _write_long(body, 1)  # union branch: value
                if kind.startswith("array:"):
                    # one item block (count, items) + 0 terminator; item
                    # elements are non-nullable (arrow list validity is
                    # row-level via the union branch above)
                    ik = kind[6:]
                    if len(v):
                        _write_long(body, len(v))
                        for item in v:
                            if item is None:
                                raise ValueError(
                                    "null array element unsupported")
                            _write_prim(body, ik, item)
                    _write_long(body, 0)
                else:
                    _write_prim(body, kind, v)
        payload = body.getvalue()
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        _write_long(out, stop - start)
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)

    Path(path).write_bytes(out.getvalue())


# --------------------------------------------------------------- reader

def _read_prim(buf: bytes, pos: int, kind: str,
               want: bool) -> tuple[object, int]:
    if kind in ("long", "int"):
        return _read_long(buf, pos)
    if kind == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if kind == "string":
        raw, pos = _read_bytes(buf, pos)
        return (raw.decode() if want else None), pos
    if kind == "bytes":
        return _read_bytes(buf, pos)
    if kind == "boolean":
        return buf[pos] == 1, pos + 1
    raise ValueError(kind)  # pragma: no cover


def _decode_block(buf: bytes, n_rows: int, kinds: list[tuple[str, str]],
                  keep: set[str] | None) -> dict[str, list]:
    """Decode one uncompressed block body into per-column Python lists.
    Fields not in ``keep`` are skipped over without materializing."""
    cols: dict[str, list] = {
        name: [] for name, _ in kinds if keep is None or name in keep}
    pos = 0
    for _ in range(n_rows):
        for name, kind in kinds:
            want = keep is None or name in keep
            branch, pos = _read_long(buf, pos)
            if branch == 0:
                if want:
                    cols[name].append(None)
                continue
            if kind.startswith("array:"):
                ik = kind[6:]
                items: list = []
                while True:
                    cnt, pos = _read_long(buf, pos)
                    if cnt == 0:
                        break
                    bsize = None
                    if cnt < 0:  # spec: negative count → byte size follows
                        cnt = -cnt
                        bsize, pos = _read_long(buf, pos)
                    if not want and bsize is not None:
                        pos += bsize
                        continue
                    for _i in range(cnt):
                        iv, pos = _read_prim(buf, pos, ik, want)
                        items.append(iv)
                v: object = items
            else:
                v, pos = _read_prim(buf, pos, kind, want)
            if want:
                cols[name].append(v)
    return cols


class _Fwd:
    """Forward-only buffered reader over the datasource stream: the file
    is pulled in 1 MiB chunks, so only the current block's compressed
    bytes (plus one read-ahead chunk) are ever resident — a multi-GB OCF
    never materializes in the read task."""

    _CHUNK = 1 << 20

    def __init__(self, f):
        self._f = f
        self._buf = b""
        self._pos = 0

    def _fill(self, n: int) -> None:
        if len(self._buf) - self._pos >= n:
            return
        # gather chunks and join ONCE: growing bytes by `buf + chunk`
        # per 1 MiB refill re-copies the accumulated prefix every
        # iteration — O(block²) memcpy on tens-of-MB blocks
        parts = [self._buf[self._pos:]]
        have = len(parts[0])
        while have < n:
            chunk = self._f.read(self._CHUNK)
            if not chunk:
                break
            parts.append(chunk)
            have += len(chunk)
        self._buf = b"".join(parts)
        self._pos = 0

    def read_exact(self, n: int) -> bytes:
        self._fill(n)
        out = self._buf[self._pos:self._pos + n]
        if len(out) != n:
            raise ValueError("truncated Avro file")
        self._pos += n
        return out

    def read_long(self) -> int | None:
        """Zigzag varint; None on clean EOF at a value boundary."""
        shift = 0
        acc = 0
        first = True
        while True:
            self._fill(1)
            if self._pos >= len(self._buf):
                if first:
                    return None
                raise ValueError("truncated varint in Avro file")
            b = self._buf[self._pos]
            self._pos += 1
            first = False
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                return (acc >> 1) ^ -(acc & 1)
            shift += 7

    def read_long_req(self) -> int:
        """read_long, but EOF is a format error (use at positions where
        the spec guarantees a value follows — a None returned into e.g.
        read_exact(None) would surface as a TypeError, not the reader's
        'truncated' contract)."""
        v = self.read_long()
        if v is None:
            raise ValueError("truncated Avro file")
        return v


class AvroDatasource(FileBasedDatasource):
    """Streams an Avro OCF block-by-block into Arrow tables."""

    _FILE_EXTENSIONS = ["avro"]

    def __init__(self, paths, columns: list[str] | None = None, **kwargs):
        super().__init__(paths, file_extensions=self._FILE_EXTENSIONS,
                         **kwargs)
        self._columns = columns

    def _read_stream(self, f, path: str):
        r = _Fwd(f)
        if r.read_exact(4) != _MAGIC:
            raise ValueError(f"not an Avro OCF: {path}")
        meta: dict[str, bytes] = {}
        while True:
            n = r.read_long()
            if n is None:
                raise ValueError(f"truncated Avro header: {path}")
            if n == 0:
                break
            if n < 0:  # spec: negative count means byte-size follows
                n = -n
                r.read_long_req()
            for _ in range(n):
                k = r.read_exact(r.read_long_req())
                v = r.read_exact(r.read_long_req())
                meta[k.decode()] = v
        sync = r.read_exact(16)

        avro_schema = json.loads(meta["avro.schema"])
        codec = meta.get("avro.codec", b"null").decode()
        kinds = _field_kinds(avro_schema)
        arrow_schema = _arrow_type_for(avro_schema)
        keep = set(self._columns) if self._columns is not None else None
        if keep is not None:
            arrow_schema = pa.schema(
                [f for f in arrow_schema if f.name in keep])

        while True:
            n_rows = r.read_long()
            if n_rows is None:  # clean EOF after a sync marker
                return
            size = r.read_long_req()
            payload = r.read_exact(size)
            if r.read_exact(16) != sync:
                raise ValueError(f"sync marker mismatch in {path}")
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            elif codec != "null":
                raise ValueError(f"unsupported codec: {codec}")
            cols = _decode_block(payload, n_rows, kinds, keep)
            yield pa.table(
                {f.name: pa.array(cols[f.name], f.type)
                 for f in arrow_schema})


def read_avro(paths, columns: list[str] | None = None,
              **kwargs) -> rd.Dataset:
    """Read Avro OCF file(s)/dir(s) into a Dataset, column-pruned at
    decode (skipped fields never materialize)."""
    return rd.read_datasource(AvroDatasource(paths, columns=columns),
                              **kwargs)
