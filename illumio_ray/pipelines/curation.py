"""Training-data curation pipeline: the operator families a 100 TB
pretraining-data build chains together, composed end-to-end.

    documents
      → quality features (vectorized RE2: tokens, stopword ratio)
      → quality + language filter
      → exact dedup   (content-hash groupby, keep min doc_id)
      → near-dup removal (MinHash+LSH candidates → Jaccard verify →
                          connected components over the pair table →
                          keep the min-doc_id representative per group)
      → kept docs + per-stage funnel report (token budget accounting)

Everything deterministic; the SQL-expressible prefix (filters + exact
dedup) is oracle-checked by the driver (`curation_filtered`), the full
pipeline including near-dup removal is exposed rows-only
(`curation_kept_docs`).

Scale notes: the quality/filter stages are fused map_batches; exact dedup
shuffles 64-bit content hashes (never text); near-dup candidate bucketing
is the thresholded driver/distributed hybrid in ops/dedup.py; the verified
pair table goes through ``dedup.dup_components`` (distributed min-label
propagation, driver union-find fast path under 2M edges) so transitive
groups keep exactly ONE representative — the pair table and the drop-set
never materialize on the driver above the broadcast gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..ops import dedup, relational as rel, textops

DEFAULT_MIN_TOKENS = 5
DEFAULT_MAX_STOP_RATIO = 0.6

# Above this many non-representative doc ids the keep step switches from a
# broadcast anti-join (zero shuffle of the kept text) to a hash-partitioned
# left-outer join (shuffles survivors once, drop-set never leaves workers).
# 2M int64 ids ≈ 16 MB broadcast — same order as the other driver gates.
DROP_BROADCAST_MAX_IDS = 2_000_000

# Below this many input docs the post-filter stream coalesces to a few
# right-sized blocks before the dedup exchanges (tiny-block sort shuffles
# are pure per-block overhead); above it the reader's own block sizing
# stands.
COALESCE_MAX_DOCS = 2_000_000


def _drop_non_representatives(survivors: rd.Dataset, pairs: rd.Dataset,
                              id_col: str = "doc_id") -> tuple[rd.Dataset, int]:
    """Near-dup ACTION with transitive closure: pair evidence → connected
    components (``dedup.dup_components``) → keep exactly the min-id
    representative of each component. Returns (kept, n_dropped).

    Pairwise drop-the-higher-id over-keeps on chains (A~C, B~C, A≁C kept
    both A and B); the closure matches the reference's keep-exactly-once
    rule (reference app/s3_manager.py:356-359) and the
    ``near_dup_keep_docs`` registry oracle. The drop-set is only collected
    to the driver under ``DROP_BROADCAST_MAX_IDS``; above it the keep is a
    reduce-side left-outer join and nothing pair-shaped touches the
    driver."""
    comps = dedup.dup_components(pairs, "id_a", "id_b")
    drops = rel.filter_batches(
        comps, lambda t: pc.not_equal(t["id"], t["component"]))
    drops = drops.map_batches(
        lambda t: pa.table({id_col: t["id"]}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_dropped = drops.count()
    if n_dropped == 0:  # no near-dups at all: nothing to remove
        return survivors, 0
    if n_dropped <= DROP_BROADCAST_MAX_IDS:
        ids = pa.concat_tables(
            pa.table(b) for b in drops.iter_batches(batch_format="pyarrow"))
        kept = rel.semi_anti_join(survivors, ids[id_col], id_col, anti=True)
        return kept, n_dropped
    marker = drops.map_batches(
        lambda t: t.append_column(
            "__dup", pa.array(np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow")
    joined = rel.hash_join(survivors, rel.drop_empty_blocks(marker),
                           on=[id_col], join_type="left_outer")
    kept = rel.filter_batches(joined, lambda t: pc.is_null(t["__dup"]))
    return kept.drop_columns(["__dup"]), n_dropped


def quality_filter(docs: rd.Dataset, min_tokens: int = DEFAULT_MIN_TOKENS,
                   max_stop_ratio: float = DEFAULT_MAX_STOP_RATIO,
                   langs: list[str] | None = None) -> rd.Dataset:
    """Quality + language gate (fused, vectorized)."""
    ds = textops.add_quality(docs)

    def keep(t: pa.Table):
        # ratio test in the form n_stop <= r * max(n_tokens, 1): one float
        # multiply, bit-identical between Arrow and the SQL oracle (the
        # rounded stop_ratio column would introduce rounding-mode edges)
        denom = pc.max_element_wise(t["n_tokens"], pa.scalar(1, pa.int64()))
        m = pc.and_(
            pc.greater_equal(t["n_tokens"], pa.scalar(min_tokens, pa.int64())),
            pc.less_equal(
                pc.cast(t["n_stopwords"], pa.float64()),
                pc.multiply(pa.scalar(float(max_stop_ratio)),
                            pc.cast(denom, pa.float64()))),
        )
        if langs is not None:
            m = pc.and_(m, pc.is_in(t["lang"], value_set=pa.array(langs)))
        return m

    return rel.filter_batches(ds, keep)


def curate(docs: rd.Dataset, min_tokens: int = DEFAULT_MIN_TOKENS,
           max_stop_ratio: float = DEFAULT_MAX_STOP_RATIO,
           langs: list[str] | None = None,
           near_dup_threshold: float = 0.8,
           spill_dir: str | None = None,
           max_lm_nll: float | None = None,
           segment_dedup: bool = False,
           seg_words: int = 10,
           dup_span_removal: bool = False,
           span_ngram: int = 3,
           n_input: int | None = None) -> tuple[rd.Dataset, dict]:
    """Full curation; returns (kept dataset, funnel report).

    The near-dup stage needs the survivor corpus twice (signatures +
    verify), so the filtered/deduped slice is STREAMED to a spill dir and
    re-read — the driver never holds document text or the pair table
    (funnel counters and, under the broadcast gate, the component drop-ids
    are the only driver-side state). Verify runs as a reduce-side join (no
    corpus broadcast); removal is transitive-closure keep-one-per-group
    via ``_drop_non_representatives``.

    Opt-in modern stages (both off by default, preserving the oracle-
    checked default funnel):
      - ``max_lm_nll``: CCNet-style perplexity gate — drop docs scoring
        above the cutoff under a bigram LM trained on the near-dup
        survivors (scored as an appended column, no join);
      - ``segment_dedup``: CCNet/RefinedWeb cross-document paragraph
        dedup over the kept docs (``seg_words``-word windows here; pass
        newline-separated text in production). Output columns become
        (doc_id, clean_text, n_kept, n_removed)."""
    import tempfile

    from pathlib import Path

    import ray

    # ``n_input`` feeds only the funnel report and the tiny-corpus
    # coalesce gate; callers reading straight from parquet should pass the
    # footer row count (exact, no scan) — docs.count() here is a FULL
    # extra pass over the input, a whole read of the corpus at 100 TB.
    if n_input is None:
        n_input = docs.count()
    filtered = quality_filter(docs, min_tokens, max_stop_ratio, langs)
    if n_input <= COALESCE_MAX_DOCS:
        # a small corpus read as many tiny blocks pays the sort-exchange
        # fixed cost per BLOCK PAIR in every downstream groupby: coalesce
        # once (measured 2.7 s → 0.4 s for the exact-dedup exchange at
        # 5 k docs × 64 blocks). Gated on docs, like the other driver
        # gates — a 100 TB corpus already has right-sized blocks and
        # must not funnel through max(8, cpus/2) partitions.
        nb = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
        filtered = filtered.repartition(nb)
    exact = dedup.exact_dedup(filtered, "text", "doc_id")

    spill = Path(spill_dir or tempfile.mkdtemp(prefix="illumio_curate_"))
    surv_dir = spill / "survivors"
    if surv_dir.exists():
        # a survivors dir left by a killed/previous run MUST NOT merge
        # with this run's write: write_parquet appends files, so stale
        # generations would silently multiply every doc (and push the
        # survivor count across the distributed-path gates)
        import shutil

        shutil.rmtree(surv_dir)
    exact.map_batches(
        lambda t: t.select(["doc_id", "lang", "n_tokens", "text"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).write_parquet(str(surv_dir))
    survivors = rd.read_parquet(str(surv_dir))
    n_filtered_exact = survivors.count()  # parquet metadata, no scan

    surv_pruned = rd.read_parquet(str(surv_dir), columns=["doc_id", "text"])
    if n_filtered_exact <= COALESCE_MAX_DOCS:
        # the reader re-splits the spill into tiny blocks; the signature
        # pass + banding exchanges pay per-block overhead (same gate as
        # above, measured −0.5 s at 5 k docs)
        surv_pruned = surv_pruned.repartition(
            max(8, int(ray.cluster_resources().get("CPU", 8)) // 2))
    if n_filtered_exact <= dedup.BROADCAST_VERIFY_MAX_DOCS:
        # small survivor set: broadcast verify (fewer shuffles); above the
        # threshold, the reduce-side join keeps text off the driver
        import pyarrow.dataset as pads

        docs_tbl = pads.dataset(str(surv_dir)).to_table(
            columns=["doc_id", "text"])
        pairs = dedup.near_dup_pairs(
            surv_pruned, docs_tbl, "doc_id", "text",
            threshold=near_dup_threshold, n_docs=n_filtered_exact)
    else:
        # disk-exchange verify: above the broadcast gate the corpus text
        # no longer fits workers, and the object-store union→sort verify
        # (verify_jaccard_pairs_join) starves Ray 2.49's resource manager
        # once the sort working set nears the store budget (measured:
        # 250 k docs spin at a 1 GB store). The bucket-layout join runs
        # one corpus/num_buckets-sized task per bucket — any store size,
        # the 100 TB shape.
        pairs = dedup.verify_jaccard_pairs_disk(
            dedup.minhash_lsh_candidates(surv_pruned, "doc_id", "text",
                                         n_docs=n_filtered_exact),
            rd.read_parquet(str(surv_dir), columns=["doc_id", "text"]),
            "doc_id", "text", work_dir=spill / "verify",
            threshold=near_dup_threshold)
    # pin the verified pairs: the funnel count and dup_components both
    # consume them — unmaterialized each would re-run LSH + verify
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    kept, n_dropped = _drop_non_representatives(survivors, pairs, "doc_id")
    kept_tokens = kept.sum("n_tokens") or 0

    report = {
        "docs_input": n_input,
        "docs_after_quality_and_exact_dedup": n_filtered_exact,
        "near_dup_pairs": n_pairs,
        "docs_dropped_near_dup": n_dropped,
        "docs_kept": n_filtered_exact - n_dropped,
        "tokens_kept": int(kept_tokens),
    }

    if max_lm_nll is not None:
        # pin the survivors once: LM training makes two passes and scoring
        # a third — unmaterialized, each would re-run the anti-join lineage
        kept = kept.materialize()
        scored = textops.add_bigram_lm_nll(kept)
        gated = rel.filter_batches(scored, lambda t: pc.or_kleene(
            pc.is_null(t["nll"]),  # < 2 words: no score, passed min_tokens
            pc.less_equal(t["nll"], pa.scalar(float(max_lm_nll)))))
        kept = gated.drop_columns(["nll"]).materialize()
        n_lm = kept.count()
        report["docs_dropped_lm"] = report["docs_kept"] - n_lm
        report["docs_kept"] = n_lm

    if segment_dedup:
        from ..ops.dedup import segment_dedup as seg_dedup
        kept = seg_dedup(kept.select_columns(["doc_id", "text"]),
                         "doc_id", "text", seg_words=seg_words,
                         n_rows=report["docs_kept"] * 64).materialize()
        report["segments_removed"] = int(kept.sum("n_removed") or 0)
        report["segments_kept"] = int(kept.sum("n_kept") or 0)

    if dup_span_removal:
        # ExactSubstr-style stride-1 span removal over the kept docs —
        # catches recycled spans at any offset, the dup class the
        # segment-aligned pass structurally misses. Text column name
        # differs when segment_dedup already rebuilt the docs.
        tcol = "clean_text" if segment_dedup else "text"
        spans = dedup.remove_dup_spans(
            kept.map_batches(
                lambda t, c=tcol: pa.table({"doc_id": t["doc_id"],
                                            "text": t[c]}),
                batch_format="pyarrow", zero_copy_batch=True),
            "doc_id", "text", n=span_ngram,
            n_rows=report["docs_kept"] * 64).materialize()
        report["span_tokens_removed"] = int(spans.sum("n_removed") or 0)
        report["span_tokens_kept"] = int(
            (spans.sum("n_tokens") or 0) - report["span_tokens_removed"])
        kept = spans

    return kept, report
