"""Declarative data-quality gate: expectations over a Dataset.

The reference drops invalid rows with a single hard-coded policy
(malformed JSON lines are counted and skipped, app/log_processor.py's
parse loop); production pipelines need that policy to be declarative —
a rule list checked in one vectorized pass, with three consumers:

  - ``annotate``: adds ``is_valid`` + a ``reasons`` csv column (rule
    names in declaration order), row-local, no exchange;
  - ``split``: (valid, quarantine) Datasets — filters over annotate,
    so the quarantine keeps full rows + why they failed (the training-
    data equivalent of a dead-letter queue);
  - ``report``: one row per rule with its violation count — per-batch
    partial sums combined on the driver (bounded: O(#rules), the same
    shape as flagship's aggregate counters).

All rule kinds are row-local and vectorized (pyarrow.compute kernels —
no Python loop over rows); the one cross-row expectation, key
uniqueness, is a separate helper (``unique_violations``) because it
needs an exchange: a bucketed grouped count (#keys ≈ #rows ⇒ bucket
mode per the grouped_agg convention), violations = Σ (count-1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .relational import filter_batches, grouped_agg


@dataclass(frozen=True)
class Rule:
    """One expectation over one column. ``kind`` ∈ not_null | range |
    enum | regex; params is kind-specific (range: lo/hi inclusive,
    either may be None; enum: allowed values; regex: SEARCH-semantics
    pattern — it matches anywhere in the value, like DuckDB's
    regexp_matches; anchor with ^…$ for a full match). A row VIOLATES
    the rule when the check fails; nulls only violate not_null (SQL
    semantics: a null never fails a value check)."""
    name: str
    column: str
    kind: str
    params: dict = field(default_factory=dict)


def _violation_mask(t: pa.Table, rule: Rule) -> pa.Array:
    """Boolean array, True where the row violates the rule."""
    col = t[rule.column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if rule.kind == "not_null":
        return pc.is_null(col)
    if rule.kind == "range":
        lo, hi = rule.params.get("lo"), rule.params.get("hi")
        bad = pa.array(np.zeros(len(col), bool))
        if lo is not None:
            bad = pc.or_(bad, pc.less(col, pa.scalar(lo)))
        if hi is not None:
            bad = pc.or_(bad, pc.greater(col, pa.scalar(hi)))
        return pc.fill_null(bad, False)  # null passes value checks
    if rule.kind == "enum":
        # is_in maps null → False (not null), so invert alone would flag
        # nulls; SQL `x NOT IN (...)` is NULL for null x → no violation
        ok = pc.is_in(col, value_set=pa.array(rule.params["values"]))
        return pc.and_(pc.invert(ok), pc.is_valid(col))
    if rule.kind == "regex":
        ok = pc.match_substring_regex(col, rule.params["pattern"])
        return pc.fill_null(pc.invert(ok), False)
    raise ValueError(f"unknown rule kind: {rule.kind}")


def annotate(ds: rd.Dataset, rules: list[Rule]) -> rd.Dataset:
    """Append ``is_valid`` (bool) and ``reasons`` (csv of violated rule
    names in declaration order; '' when valid). Row-local."""
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")

    def fn(t: pa.Table) -> pa.Table:
        masks = [_violation_mask(t, r) for r in rules]
        # concat_ws semantics (join skipping non-violated slots). NOT
        # binary_join_element_wise(null_handling="skip"): pyarrow 16.1
        # silently DROPS rows whose inputs are all null (output shorter
        # than input). Join with empties instead, then collapse the
        # separator runs — rule names never contain ','.
        parts = [pc.if_else(m, pa.scalar(r.name), pa.scalar(""))
                 for m, r in zip(masks, rules)]
        raw = pc.binary_join_element_wise(*parts, ",")
        reasons = pc.utf8_trim(
            pc.replace_substring_regex(raw, ",{2,}", ","), ",")
        valid = pa.array(np.ones(t.num_rows, bool))
        for m in masks:
            valid = pc.and_(valid, pc.invert(m))
        return t.append_column("is_valid", valid) \
                .append_column("reasons", reasons)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def split(ds: rd.Dataset, rules: list[Rule]) -> tuple[rd.Dataset, rd.Dataset]:
    """(valid, quarantine): quarantine rows keep their ``reasons``.
    The annotated stream is materialized once so the two filter
    consumers don't re-run the checks."""
    ann = annotate(ds, rules).materialize()
    valid = filter_batches(ann, lambda t: t["is_valid"]) \
        .drop_columns(["is_valid", "reasons"])
    quar = filter_batches(ann, lambda t: pc.invert(t["is_valid"])) \
        .drop_columns(["is_valid"])
    return valid, quar


def report(ds: rd.Dataset, rules: list[Rule]) -> rd.Dataset:
    """→ (rule, violations, n_rows), one row per rule in declaration
    order plus a trailing '__valid_rows' row (rows violating nothing).
    Per-batch partial counts, driver combine — bounded by #rules."""
    def partial(t: pa.Table) -> pa.Table:
        masks = [_violation_mask(t, r) for r in rules]
        valid = np.ones(t.num_rows, bool)
        counts = []
        for m in masks:
            mv = m.to_numpy(zero_copy_only=False)
            counts.append(int(mv.sum()))
            valid &= ~mv
        counts.append(int(valid.sum()))
        return pa.table({
            "rule": pa.array([r.name for r in rules] + ["__valid_rows"]),
            "violations": pa.array(counts, pa.int64()),
            "n_rows": pa.array([t.num_rows] * (len(rules) + 1), pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return grouped_agg(parts, ["rule"],
                       [("violations", "sum", "violations"),
                        ("n_rows", "sum", "n_rows")], mode="driver")


def unique_violations(ds: rd.Dataset, key_cols: list[str]) -> int:
    """Rows in excess of the first occurrence of their key (0 ⇔ the key
    is unique). Bucketed grouped count (#keys ≈ #rows), then the excess
    sum — only (key, count) rows ever leave the exchange."""
    cnt = grouped_agg(ds.select_columns(key_cols), key_cols,
                      [(key_cols[0], "count", "__c")], mode="bucket")
    over = cnt.map_batches(
        lambda t: pa.table({"x": pc.subtract(
            t["__c"], pa.scalar(1, pa.int64()))}),
        batch_format="pyarrow", zero_copy_batch=True).sum("x")
    return int(over or 0)


def expect_schema(ds: rd.Dataset, expected: dict[str, pa.DataType],
                  allow_extra: bool = False) -> rd.Dataset:
    """Schema CONTRACT gate: assert the dataset carries exactly the
    expected (column → Arrow type) mapping before any work is scheduled —
    the fail-fast guard a long pipeline wants at its source boundary
    (upstream schema drift surfaces as one clear error, not a mid-job
    task crash 40 minutes in). Metadata-only: reads the Ray schema, never
    a row. Returns the dataset unchanged so it chains inline.

    ``allow_extra`` tolerates additional columns (widening drift) while
    still failing on missing columns or type changes."""
    sch = ds.schema()
    have: dict[str, pa.DataType] = {}
    for name, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            dt = np.dtype(t)
            t = pa.string() if dt == np.dtype("O") \
                else pa.from_numpy_dtype(dt)
        have[name] = t
    problems = []
    for name, want in expected.items():
        if name not in have:
            problems.append(f"missing column {name!r} ({want})")
        elif have[name] != want:
            problems.append(
                f"column {name!r}: expected {want}, found {have[name]}")
    if not allow_extra:
        for name in have:
            if name not in expected:
                problems.append(f"unexpected column {name!r} ({have[name]})")
    if problems:
        raise ValueError("schema contract violated:\n  "
                         + "\n  ".join(sorted(problems)))
    return ds
