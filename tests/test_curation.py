"""Training-data curation pipeline: funnel invariants + known dup removal."""

import pandas as pd
import ray.data as rd

from illumio_ray.pipelines.curation import curate, quality_filter


def _docs():
    rows = []
    # 20 quality docs
    for i in range(20):
        rows.append({"doc_id": i, "lang": "en",
                     "text": f"unique document {i} " + " ".join(
                         f"w{i}x{j}" for j in range(20))})
    rows.append({"doc_id": 100, "lang": "en", "text": rows[0]["text"]})   # exact dup
    near = rows[1]["text"].rsplit(" ", 1)[0] + " CHANGED"                 # near dup of 1
    rows.append({"doc_id": 101, "lang": "en", "text": near})
    rows.append({"doc_id": 102, "lang": "en", "text": "tiny"})            # too short
    rows.append({"doc_id": 103, "lang": "en",
                 "text": "the a of to and in is for the a of to"})        # stopword soup
    return pd.DataFrame(rows)


def test_quality_filter_drops_short_and_stopword_soup():
    out = quality_filter(rd.from_pandas(_docs())).to_pandas()
    ids = set(out.doc_id)
    assert 102 not in ids and 103 not in ids
    assert 0 in ids and 100 in ids


def test_curate_funnel():
    kept, report = curate(rd.from_pandas(_docs()), near_dup_threshold=0.7)
    kept_df = kept.to_pandas()
    ids = set(kept_df.doc_id)
    assert report["docs_input"] == 24
    assert 100 not in ids            # exact dup dropped (keeps 0)
    assert 0 in ids
    assert 101 not in ids            # near dup of 1 dropped (keeps lower id)
    assert 1 in ids
    assert 102 not in ids and 103 not in ids
    assert report["docs_kept"] == len(kept_df) == 20
    assert report["tokens_kept"] == int(kept_df.n_tokens.sum())


def test_curate_transitive_group_keeps_one_representative():
    """A~C and B~C but A!~B (A<B<C): pairwise drop-the-higher-id would
    keep A and B; the components closure must keep exactly A."""
    words = [f"ca{i}" for i in range(36)]
    rows = [
        # shifted 30-word windows: 3-shingle Jaccard(0,3)=25/31≈0.81,
        # (3,6)≈0.81, (0,6)=22/34≈0.65 — so with threshold 0.7 the pair
        # graph is a chain through the BRIDGE text, which gets the top id
        {"doc_id": 200, "lang": "en", "text": " ".join(words[0:30])},
        {"doc_id": 201, "lang": "en", "text": " ".join(words[6:36])},
        {"doc_id": 202, "lang": "en", "text": " ".join(words[3:33])},
    ]
    # padding docs so the funnel isn't degenerate
    for i in range(5):
        rows.append({"doc_id": i, "lang": "en",
                     "text": f"pad doc {i} " + " ".join(
                         f"p{i}q{j}" for j in range(20))})
    kept, report = curate(rd.from_pandas(pd.DataFrame(rows)),
                          near_dup_threshold=0.7)
    ids = set(kept.to_pandas().doc_id)
    assert 200 in ids
    assert 201 not in ids and 202 not in ids
    assert report["docs_dropped_near_dup"] == 2
    assert report["docs_kept"] == len(ids) == 6


def test_curate_modern_stages_funnel():
    kept, report = curate(rd.from_pandas(_docs()), near_dup_threshold=0.7,
                          max_lm_nll=50.0, segment_dedup=True)
    kept_df = kept.to_pandas()
    # a permissive LM cutoff drops nothing; the report still records it
    assert report["docs_dropped_lm"] == 0
    assert report["docs_kept"] == 20
    # segment dedup reshapes the output and accounts every segment
    assert set(kept_df.columns) == {"doc_id", "clean_text", "n_kept",
                                    "n_removed"}
    assert len(kept_df) == 20
    assert report["segments_kept"] == int(kept_df.n_kept.sum())
    assert report["segments_removed"] == int(kept_df.n_removed.sum())

    # a brutal cutoff drops every scored doc
    kept2, report2 = curate(rd.from_pandas(_docs()), near_dup_threshold=0.7,
                            max_lm_nll=-1.0)
    assert report2["docs_dropped_lm"] == 20   # every doc scores > -1
    assert report2["docs_kept"] == 0


def test_curate_dup_span_removal_stage():
    kept, report = curate(rd.from_pandas(_docs()), near_dup_threshold=0.7,
                          dup_span_removal=True)
    kept_df = kept.to_pandas()
    assert set(kept_df.columns) == {"doc_id", "clean_text", "n_tokens",
                                    "n_removed"}
    assert len(kept_df) == report["docs_kept"]
    assert report["span_tokens_removed"] == int(kept_df.n_removed.sum())
    assert report["span_tokens_kept"] == \
        int(kept_df.n_tokens.sum() - kept_df.n_removed.sum())
    # composes after segment dedup too (text column renamed upstream)
    kept3, report3 = curate(rd.from_pandas(_docs()), near_dup_threshold=0.7,
                            segment_dedup=True, dup_span_removal=True)
    df3 = kept3.to_pandas()
    assert len(df3) == report3["docs_kept"]
    assert "span_tokens_removed" in report3


def test_curate_reused_spill_dir_does_not_merge_generations(tmp_path):
    """Regression: a survivors dir left by a previous/killed run must be
    cleared before this run's write — write_parquet appends files, so a
    stale generation would silently multiply every doc (and can push the
    survivor count across the distributed-path gates)."""
    spill = tmp_path / "curate_spill"
    kept1, rep1 = curate(rd.from_pandas(_docs()), near_dup_threshold=0.7,
                         spill_dir=str(spill))
    n1 = len(kept1.to_pandas())
    # second run over the SAME spill dir (simulates rerun after a crash
    # or an operator pointing two runs at one scratch path)
    kept2, rep2 = curate(rd.from_pandas(_docs()), near_dup_threshold=0.7,
                         spill_dir=str(spill))
    df2 = kept2.to_pandas()
    assert len(df2) == n1 == rep2["docs_kept"] == rep1["docs_kept"]
    assert df2.doc_id.is_unique
    assert rep2["docs_after_quality_and_exact_dedup"] == \
        rep1["docs_after_quality_and_exact_dedup"]
