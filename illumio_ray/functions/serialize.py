"""SIEM wire-format serializer — the byte-identity surface.

≙ the reference's ``format_log_for_siem`` (app/log_processor.py:480-497):
``key=value`` pairs joined by ``|``; ``|``→``_`` escaping in values and in
the appended original message; None/empty fields dropped; truncation to
MAX_MESSAGE_LENGTH with a ``...`` suffix. Deviation (documented, SURVEY.md
M11): ``time`` comes from ``warc_ts`` (input-derived) instead of the
reference's non-reproducible wall clock, and ``original_message`` carries
the extracted text instead of the original JSON line.

Vectorized: Arrow kernels for escaping/joining; only the rare
over-length rows take a Python fallback for per-row truncation.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import BEATNAME, MAX_MESSAGE_LENGTH
from .fieldmap import DEVICE_TYPES, FIELD_SPECS

_ORIG_PREFIX = "|original_message="


def _escape(col) -> pa.Array:
    return pc.replace_substring(pc.cast(col, pa.string()), "|", "_")


def _piece(key: str, col) -> pa.Array:
    """'key=escaped(v)' or '' when v is null/empty (empty-field drop)."""
    esc = _escape(col)
    blank = pc.or_kleene(pc.is_null(esc), pc.equal(esc, ""))
    return pc.if_else(
        pc.fill_null(blank, True), "", pc.binary_join_element_wise(f"{key}=", esc, "")
    )


def serialize_wire(tbl: pa.Table, event_class: str) -> pa.Array:
    """Build the wire string column for a single-class table."""
    n = len(tbl)
    device_type = DEVICE_TYPES[event_class]
    header = f"beatname={BEATNAME}|device_type={device_type}|fullyqualifiedbeatname={BEATNAME}"

    cols: dict[str, pa.ChunkedArray | pa.Array] = {name: tbl[name] for name in tbl.column_names}
    cols["time_iso"] = pc.cast(tbl["warc_ts"], pa.string())
    cols["n_tokens_str"] = pc.cast(tbl["n_tokens"], pa.string())
    cols["const_unparsed"] = pa.array(["unparsed"] * n, pa.string())

    pieces = [pa.array([header] * n, pa.string())]
    for key, src in FIELD_SPECS[event_class]:
        pieces.append(_piece(key, cols[src]))
    # tag1 mirrors device_type (reference app/log_processor.py:464).
    pieces.append(pa.array([f"tag1={device_type}"] * n, pa.string()))

    joined = pc.binary_join_element_wise(*pieces, "|")
    # Dropped (empty) fields left '||' runs behind — collapse, trim edges.
    fields_str = pc.replace_substring_regex(joined, r"\|{2,}", "|")

    orig = _escape(pc.fill_null(tbl["extracted_text"], ""))
    budget = pc.subtract(
        pa.scalar(MAX_MESSAGE_LENGTH - len(_ORIG_PREFIX)), pc.utf8_length(fields_str)
    )
    over = pc.greater(pc.utf8_length(orig), budget)

    wire = pc.binary_join_element_wise(fields_str, _ORIG_PREFIX, orig, "")

    if pc.any(over).as_py():
        # Rare path: per-row truncation budget → Python ONLY for the
        # over-length rows (take by index, patch back via if_else) — the
        # under-budget bulk of the batch never leaves Arrow.
        import numpy as np

        mask = over.to_numpy(zero_copy_only=False).astype(bool)
        pos = np.flatnonzero(mask)
        fs_sub = pc.take(fields_str, pa.array(pos, pa.int64())).to_pylist()
        og_sub = pc.take(orig, pa.array(pos, pa.int64())).to_pylist()
        scattered = np.full(n, None, dtype=object)
        for p, f, o in zip(pos, fs_sub, og_sub):
            b = MAX_MESSAGE_LENGTH - len(_ORIG_PREFIX) - len(f)
            scattered[p] = f + _ORIG_PREFIX + o[: max(0, b - 3)] + "..."
        wire = pc.if_else(pa.array(mask), pa.array(scattered, pa.string()),
                          wire)

    return wire if isinstance(wire, pa.Array) else wire.combine_chunks()
