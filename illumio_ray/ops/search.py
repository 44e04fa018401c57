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

# v2: posting rows carry (tf, dl) for ranked (BM25) retrieval — bump
# forces stale cached layouts (which lack those columns) to rebuild
_TOKEN_SCHEME = "lower-alnum-v2"


def _posting_rows(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(term, doc_id, tf, dl) posting rows, one per distinct pair,
    vectorized: regex split over the whole column, list offsets →
    repeated doc ids, an in-batch group_by count for tf, and the per-doc
    token count denormalized onto every posting (classic search-index
    denormalization: BM25 needs dl for matched docs WITHOUT a second
    lookup). Cross-batch duplicates are impossible (a doc never spans
    batches)."""
    text = t[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(text, "")), "[^a-z0-9]+")
    n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    row_of_tok = np.repeat(np.arange(t.num_rows), n_per)
    dl = np.bincount(row_of_tok[nonempty], minlength=t.num_rows) \
        .astype(np.int64)
    pairs = pa.table({
        "term": flat,
        "doc_id": pa.array(np.repeat(ids, n_per), pa.int64()),
        "dl": pa.array(dl[row_of_tok], pa.int64()),
    }).filter(pa.array(nonempty))
    g = pairs.group_by(["term", "doc_id", "dl"]).aggregate(
        [("term", "count")])
    return pa.table({"term": g["term"], "doc_id": g["doc_id"],
                     "tf": pc.cast(g["term_count"], pa.int64()),
                     "dl": g["dl"]})


def build_term_index(ds: rd.Dataset, id_col: str, text_col: str,
                     out_dir: str | Path, num_buckets: int = 64) -> str:
    """Tokenize → distinct posting rows → one bucket exchange on
    hash(term) → hive layout + meta. Paid once; every search after is
    O(probed buckets)."""
    n_docs = ds.count()
    postings = ds.map_batches(
        lambda t: _posting_rows(t, id_col, text_col),
        batch_format="pyarrow", zero_copy_batch=True)
    write_bucketed(postings, "term", num_buckets, out_dir)
    # corpus stats for ranked retrieval: every non-empty token belongs to
    # exactly one (term, doc) posting, so Σ tf over the layout == Σ dl
    # over docs. Column-pruned re-read of one int64 column — explicit
    # file list because `__bucket=` dirs start with '_', which parquet
    # path discovery silently skips (see bucketing._bucket_schema).
    files = [str(p) for p in Path(out_dir).glob("__bucket=*/*.parquet")]
    dl_sum = (rd.read_parquet(files, columns=["tf"]).sum("tf") or 0) \
        if files else 0
    (Path(out_dir) / "_meta.json").write_text(json.dumps(
        {"num_buckets": num_buckets, "scheme": _TOKEN_SCHEME,
         "id_col": id_col, "n_docs": int(n_docs),
         "dl_sum": int(dl_sum)}))
    return str(out_dir)


_SEGMENTS = "_segments.json"


def append_term_index(layout_dir: str | Path, ds: rd.Dataset,
                      id_col: str = "doc_id", text_col: str = "text",
                      num_buckets: int = 64) -> str:
    """Incremental index maintenance, Lucene-style: NEW documents become
    a new immutable segment (its own buckets + meta) and the readers
    merge across segments — existing segments are never rewritten, so
    an append costs O(new docs), not O(corpus). ``_segments.json`` is
    the commit point (atomic replace); a crash mid-append leaves an
    inert segment dir and the previous listing intact.

    Caller contract: appended docs are NEW ids (re-crawls need a
    delete+merge compaction this layout doesn't implement — documented
    limitation, same single-writer assumption as upsert_bucketed)."""
    root = Path(layout_dir)
    root.mkdir(parents=True, exist_ok=True)
    segs = _segment_names(root)
    name = f"segment-{len(segs):03d}"
    build_term_index(ds, id_col, text_col, root / name, num_buckets)
    tmp = root / (_SEGMENTS + ".tmp")
    tmp.write_text(json.dumps({"segments": segs + [name]}))
    tmp.replace(root / _SEGMENTS)
    return str(root / name)


def _segment_names(root: Path) -> list[str]:
    f = root / _SEGMENTS
    if f.exists():
        return json.loads(f.read_text())["segments"]
    return []


def _segment_dirs(layout_dir: str | Path) -> list[Path]:
    """Segment dirs of a layout: the committed listing for a segmented
    index, or the layout itself (single-segment build_term_index)."""
    root = Path(layout_dir)
    names = _segment_names(root)
    if names:
        return [root / n for n in names]
    if (root / "_meta.json").exists():
        return [root]
    raise FileNotFoundError(f"no term index at {layout_dir}")


def _merged_meta_and_hits(layout_dir: str | Path, terms: list[str],
                          columns: list[str]) -> tuple[dict, rd.Dataset]:
    """(summed meta, union of per-segment posting fetches) — each
    segment is probed with its own bucket count; corpus stats add."""
    metas, parts = [], []
    for d in _segment_dirs(layout_dir):
        meta = json.loads((d / "_meta.json").read_text())
        if meta["scheme"] != _TOKEN_SCHEME:
            raise ValueError(
                f"layout scheme {meta['scheme']!r} != reader "
                f"{_TOKEN_SCHEME!r} — rebuild the index")
        metas.append(meta)
        parts.append(bucketed_lookup(d, "term", terms,
                                     meta["num_buckets"], columns=columns))
    hits = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    merged = {"n_docs": sum(m.get("n_docs", 0) for m in metas),
              "dl_sum": sum(m.get("dl_sum", 0) for m in metas)}
    return merged, hits


def search_terms(layout_dir: str | Path, terms: list[str],
                 mode: str = "and") -> pa.Table:
    """→ (doc_id,) of documents matching the terms ("and": all of them,
    "or": any). Opens only the ≤ len(terms) buckets the probe terms hash
    into; the intersection is a count-distinct-terms-per-doc over the
    fetched posting rows (≪ corpus — bounded by the probed terms'
    document frequency)."""
    import re

    if mode not in ("and", "or"):
        raise ValueError(f"unknown search mode: {mode}")
    # probes go through the SAME pinned tokenization as the index —
    # a raw "GDPR" / "foo-bar" probe would hash to a term that cannot
    # exist in the layout and silently return nothing
    terms = sorted({t for raw in terms
                    for t in re.split(r"[^a-z0-9]+", str(raw).lower()) if t})
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    _, hits = _merged_meta_and_hits(layout_dir, terms,
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


def bm25_search(layout_dir: str | Path, terms: list[str],
                k1: float = 1.2, b: float = 0.75) -> rd.Dataset:
    """Ranked retrieval FROM the index: BM25 (same Robertson/Lucene form
    as textops.bm25_scores) of every document matching ≥1 probe term,
    computed from posting rows alone — the corpus is never read. Fetch
    is bounded by the probed terms' document frequency; df per term is
    a count over those postings (tiny driver combine); N and avgdl come
    from the layout meta.

    Bit-parity discipline (same as the scan-based oracle): per-term
    score components are exact single values per (doc, term) — the
    grouped sum never adds two floats for the same term — and the final
    score adds the m components in fixed term order, so the doubles
    match a SQL oracle that pivots CASE-per-term and adds in the same
    order."""
    import re

    from ..functions.rounding import round_np

    canon: list[str] = []
    for raw in terms:
        for t in re.split(r"[^a-z0-9]+", str(raw).lower()):
            if t and t not in canon:
                canon.append(t)  # order-preserving: fixed summation order
    if not canon:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "bm25": pa.array([], pa.float64())}))
    m = len(canon)
    meta, hits = _merged_meta_and_hits(layout_dir, canon,
                                       columns=["term", "doc_id",
                                                "tf", "dl"])
    n_docs, dl_sum = meta["n_docs"], meta["dl_sum"]
    avgdl = dl_sum / n_docs
    hits = hits.materialize()  # read buckets once: df pass + score pass

    # df per term: per-batch partial counts, driver combine (≤ m keys)
    dft = grouped_agg(hits.select_columns(["term"]), ["term"],
                      [("term", "count", "__df")], mode="driver")
    df = {r["term"]: r["__df"] for r in dft.take_all()}
    idf = np.array([np.log((n_docs - df.get(t, 0) + 0.5)
                           / (df.get(t, 0) + 0.5) + 1.0)
                    for t in canon])
    term_j = {t: j for j, t in enumerate(canon)}

    def components(t: pa.Table) -> pa.Table:
        """(doc_id, c_0..c_{m-1}): the term's score in its own column —
        zero elsewhere — so the grouped sum stays exact."""
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = np.array([term_j[x] for x in t["term"].to_pylist()],
                     np.int64) if t.num_rows else np.empty(0, np.int64)
        s = idf[j] * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
        cols: dict = {"doc_id": t["doc_id"]}
        for jj in range(m):
            cols[f"c_{jj}"] = pa.array(np.where(j == jj, s, 0.0))
        return pa.table(cols)

    comp = hits.map_batches(components, batch_format="pyarrow",
                            zero_copy_batch=True)
    summed = grouped_agg(comp, ["doc_id"],
                         [(f"c_{jj}", "sum", f"c_{jj}") for jj in range(m)],
                         mode="bucket")

    def finish(t: pa.Table) -> pa.Table:
        s = np.zeros(t.num_rows, np.float64)
        for jj in range(m):  # fixed term order, same as the SQL oracle
            s = s + pc.fill_null(t[f"c_{jj}"], 0.0) \
                .to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t["doc_id"],
                         "bm25": pa.array(round_np(s, 6), pa.float64())})

    return summed.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)
