"""Persisted inverted index: term → posting rows, bucket-partitioned.

The corpus-search tool of a training-data pipeline ("which documents
contain all of these words?" — audits, targeted decontamination, corpus
debugging) as a LAYOUT, not a scan: posting rows (term, doc_id) are
hash-bucketed by stable_hash64(term) once at build time, so a query for
k terms opens at most k bucket directories (bucketing.bucketed_lookup —
the index IS the directory structure, same protocol as the keyed join
layout) and never touches the corpus. Terms are stored as strings, not
hashes — probes compare exact terms, so hash collisions cannot produce
false matches.

Tokenization is pinned for oracle parity and recorded in the layout
meta: lowercase, split on ``[^a-z0-9]+``, empties dropped, one posting
per DISTINCT (term, doc) — exactly DuckDB's
``unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))``. Bump
_TOKEN_SCHEME whenever token VALUES would change; readers refuse a
layout whose scheme doesn't match (same convention as the shingle
indexes, functions/hashing.py artifact table).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .bucketing import bucketed_lookup, write_bucketed
from .relational import grouped_agg

_TOKEN_SCHEME = "lower-alnum-v1"


def _distinct_terms(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(term, doc_id) posting rows, one per distinct pair, vectorized:
    regex split over the whole column, list offsets → repeated doc ids,
    then an in-batch group_by for the distinct. Cross-batch duplicates
    are impossible (a doc never spans batches)."""
    text = t[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(text, "")), "[^a-z0-9]+")
    n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    pairs = pa.table({
        "term": flat,
        "doc_id": pa.array(np.repeat(ids, n_per), pa.int64()),
    }).filter(pc.not_equal(flat, ""))
    return pairs.group_by(["term", "doc_id"]).aggregate([])


def build_term_index(ds: rd.Dataset, id_col: str, text_col: str,
                     out_dir: str | Path, num_buckets: int = 64) -> str:
    """Tokenize → distinct posting rows → one bucket exchange on
    hash(term) → hive layout + meta. Paid once; every search after is
    O(probed buckets)."""
    postings = ds.map_batches(
        lambda t: _distinct_terms(t, id_col, text_col),
        batch_format="pyarrow", zero_copy_batch=True)
    write_bucketed(postings, "term", num_buckets, out_dir)
    (Path(out_dir) / "_meta.json").write_text(json.dumps(
        {"num_buckets": num_buckets, "scheme": _TOKEN_SCHEME,
         "id_col": id_col}))
    return str(out_dir)


def search_terms(layout_dir: str | Path, terms: list[str],
                 mode: str = "and") -> pa.Table:
    """→ (doc_id,) of documents matching the terms ("and": all of them,
    "or": any). Opens only the ≤ len(terms) buckets the probe terms hash
    into; the intersection is a count-distinct-terms-per-doc over the
    fetched posting rows (≪ corpus — bounded by the probed terms'
    document frequency)."""
    import re

    meta = json.loads((Path(layout_dir) / "_meta.json").read_text())
    if meta["scheme"] != _TOKEN_SCHEME:
        raise ValueError(
            f"layout scheme {meta['scheme']!r} != reader {_TOKEN_SCHEME!r}"
            " — rebuild the index")
    if mode not in ("and", "or"):
        raise ValueError(f"unknown search mode: {mode}")
    # probes go through the SAME pinned tokenization as the index —
    # a raw "GDPR" / "foo-bar" probe would hash to a term that cannot
    # exist in the layout and silently return nothing
    terms = sorted({t for raw in terms
                    for t in re.split(r"[^a-z0-9]+", str(raw).lower()) if t})
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    hits = bucketed_lookup(layout_dir, "term", terms, meta["num_buckets"],
                           columns=["term", "doc_id"])
    per_doc = grouped_agg(hits, ["doc_id"],
                          [("term", "count", "__c")], mode="bucket")
    out = []
    for b in per_doc.iter_batches(batch_format="pyarrow", batch_size=None):
        t = pa.table(b)
        if mode == "and":
            t = t.filter(pc.equal(t["__c"],
                                  pa.scalar(len(terms), pa.int64())))
        out.append(t.select(["doc_id"]))
    return pa.concat_tables(out) if out else pa.table(
        {"doc_id": pa.array([], pa.int64())})
