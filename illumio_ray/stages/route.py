"""Router stage: derive event_class, hour bucket, and the serialized wire.

≙ the reference's log_type routing (derived from the S3 key path,
app/s3_manager.py:311) + per-type transform dispatch
(app/log_processor.py:368-478), generalized from 2 streams to N event
classes. The routing rule is deliberately SQL-expressible so the DuckDB
oracle can reproduce it exactly:

    event_class = CASE
        WHEN page_event IN ('login','error','admin')
          OR host_category IN ('gov','malware') THEN 'auditable_events'
        WHEN page_event IS NULL                  THEN 'unknown'
        ELSE 'summaries' END
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.serialize import serialize_wire
from ..schema import (
    AUDIT_CATEGORIES,
    AUDIT_EVENTS,
    CLASS_AUDIT,
    CLASS_SUMMARY,
    CLASS_UNKNOWN,
    EVENT_CLASSES,
)


def derive_event_class(page_event, host_category) -> pa.Array:
    is_audit = pc.or_kleene(
        pc.is_in(page_event, value_set=pa.array(AUDIT_EVENTS)),
        pc.is_in(host_category, value_set=pa.array(AUDIT_CATEGORIES)),
    )
    is_audit = pc.fill_null(is_audit, False)
    return pc.if_else(
        is_audit,
        CLASS_AUDIT,
        pc.if_else(pc.is_null(page_event), CLASS_UNKNOWN, CLASS_SUMMARY),
    )


def route_batch(batch: pa.Table, with_wire: bool = True) -> pa.Table:
    """Enriched batch → + event_class, hour, wire. Stateless, vectorized."""
    event_class = derive_event_class(batch["page_event"], batch["host_category"])
    hour = pc.floor_temporal(batch["warc_ts"], unit="hour")
    batch = batch.append_column("event_class", event_class).append_column("hour", hour)

    if not with_wire:
        return batch

    # Per-class wire serialization (each class has its own field spec);
    # classes are few (N=3) → three vectorized passes, then concat.
    parts = []
    for cls in EVENT_CLASSES:
        sub = batch.filter(pc.equal(batch["event_class"], cls))
        if len(sub) == 0:
            continue
        parts.append(sub.append_column("wire", serialize_wire(sub, cls)))
    if not parts:
        return batch.append_column("wire", pa.array([], pa.string()))
    return pa.concat_tables(parts)
