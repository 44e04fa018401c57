"""Text analysis operators over a documents table.

Vectorized per batch: token counting (RE2 kernel shared with the DuckDB
oracle), quality scoring, n-gram language ID, and rolling-hash document
fingerprinting. The langid stage is a stateful actor pool (profiles built
once per actor in __init__).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import hash64
from ..functions.rounding import round_scalar

TOKEN_RE = r"[A-Za-z0-9_]+"
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for")
_STOP_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"
PUNCT_RE = r"[.,;:!?]"


def token_count_col(t: pa.Table, text_col: str = "text") -> pa.Array:
    return pc.cast(pc.count_substring_regex(t[text_col], TOKEN_RE), pa.int64())


def add_token_counts(ds: rd.Dataset, text_col: str = "text",
                     out_col: str = "n_tokens") -> rd.Dataset:
    return ds.map_batches(
        lambda t: t.append_column(out_col, token_count_col(t, text_col)),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def quality_features(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / stopword / punctuation quality signals, all RE2 kernels
    (SQL-oracle-compatible)."""
    text = t[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())
    n_stop = pc.cast(pc.count_substring_regex(pc.utf8_lower(text), _STOP_RE), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.int64())
    denom = pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64()))
    stop_ratio = pc.round(
        pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(denom, pa.float64())), 6
    )
    return (
        t.append_column("n_chars_calc", n_chars)
        .append_column("n_tokens", n_tokens)
        .append_column("n_stopwords", n_stop)
        .append_column("n_punct", n_punct)
        .append_column("stop_ratio", stop_ratio)
    )


def add_quality(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    return ds.map_batches(lambda t: quality_features(t, text_col),
                          batch_format="pyarrow", zero_copy_batch=True)


class LangIdStage:
    """Character-n-gram language ID — the actor-pool pattern: profiles are
    built once per actor in __init__, scoring is vectorized per batch.

    The model is a deterministic toy (letter-frequency cosine over 26 dims
    per language, built from fixed seed words); at real scale the same
    plumbing would load a fastText-style model here instead.
    """

    PROFILE_WORDS = {
        "en": "the and of to in is you that it he was for on are as with",
        "de": "der die und in den von zu das mit sich des auf ist nicht",
        "fr": "le de un etre et a il avoir ne je son que se qui dans",
        "es": "de la que el en y a los del se las por un para con no",
        "pt": "de a o que e do da em um para com nao uma os no se",
    }

    def __init__(self):
        self.langs = list(self.PROFILE_WORDS)
        self.profiles = np.stack(
            [self._vec(w) for w in self.PROFILE_WORDS.values()]
        )  # (L, 26), row-normalized

    @staticmethod
    def _vec(s: str) -> np.ndarray:
        v = np.zeros(26)
        for ch in s.lower():
            i = ord(ch) - 97
            if 0 <= i < 26:
                v[i] += 1
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # Vectorized letter histogram: (N, 26) counts via np.bincount trick.
        texts = batch["text"].fillna("").str.lower()
        mats = np.zeros((len(texts), 26))
        for i, s in enumerate(texts):  # char histogram per doc; O(total chars)
            a = np.frombuffer(s.encode("latin-1", "ignore"), dtype=np.uint8)
            a = a[(a >= 97) & (a <= 122)] - 97
            if len(a):
                mats[i] = np.bincount(a, minlength=26)
        norms = np.linalg.norm(mats, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        scores = (mats / norms) @ self.profiles.T  # (N, L)
        batch["lang_pred"] = np.array(self.langs)[scores.argmax(axis=1)]
        batch["lang_score"] = scores.max(axis=1).round(6)
        return batch


def add_lang_id(ds: rd.Dataset, concurrency=(1, 4)) -> rd.Dataset:
    return ds.map_batches(LangIdStage, batch_format="pandas",
                          concurrency=concurrency, num_cpus=1)


def add_fingerprint(ds: rd.Dataset, text_col: str = "text",
                    out_col: str = "fingerprint") -> rd.Dataset:
    """Stable 64-bit document fingerprint (content-defined, order-sensitive):
    hash of the token sequence via the shared hash64 (≙ a rolling hash over
    the normalized token stream)."""
    def fn(t: pa.Table) -> pa.Table:
        # Normalize: lowercase, collapse non-token chars to single spaces.
        norm = pc.replace_substring_regex(
            pc.utf8_lower(t[text_col]), r"[^a-z0-9_]+", " "
        )
        norm = pc.utf8_trim_whitespace(norm)
        fp = hash64(norm).astype(np.int64)  # reinterpret u64 as i64 for arrow
        return t.append_column(out_col, pa.array(fp, pa.int64()))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_repetition_signals(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Gopher-style repetition quality signals, per doc:

      - ttr: type-token ratio (distinct words / words) — low values mean
        boilerplate/keyword-stuffing;
      - top_word_frac: most-frequent-word share of the doc — high values
        mean degenerate repetition.

    Row-local by construction (a doc's words never leave its row), so the
    operator is a pure map stage — no shuffle at any scale. Tokenization is
    a plain single-space split, shared verbatim with the DuckDB oracle
    (string_split(text, ' ')). NULL-text docs are DROPPED, matching SQL
    unnest semantics (string_split(NULL) unnests to zero rows, so the doc
    never reaches the per-doc aggregate)."""
    from ..functions.rounding import round_np

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch[text_col].notna()].reset_index(drop=True)
        if not len(batch):
            batch["ttr"] = np.zeros(0)
            batch["top_word_frac"] = np.zeros(0)
            return batch
        s = batch[text_col].str.split(" ")
        n = s.str.len().to_numpy(dtype=np.float64)
        ex = s.explode()
        per_word = ex.groupby([ex.index, ex.to_numpy()], sort=False).size()
        top = per_word.groupby(level=0).max().reindex(batch.index).to_numpy(np.float64)
        uniq = per_word.groupby(level=0).size().reindex(batch.index).to_numpy(np.float64)
        denom = np.maximum(n, 1.0)
        batch["ttr"] = round_np(uniq / denom, 6)
        batch["top_word_frac"] = round_np(top / denom, 6)
        return batch

    return ds.map_batches(fn, batch_format="pandas")


BPEISH_RE = (r"'s|'t|'re|'ve|'m|'ll|'d"
             r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")


def add_bpeish_token_counts(ds: rd.Dataset, text_col: str = "text",
                            out_col: str = "n_bpe_tokens") -> rd.Dataset:
    """GPT-2-style pre-tokenizer segment count (RE2-compatible pattern — no
    lookaheads — shared verbatim with the DuckDB oracle)."""
    def fn(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t[text_col], BPEISH_RE), pa.int64())
        return t.append_column(out_col, n)
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# TF-IDF (fully distributed two-shuffle plan)
# ---------------------------------------------------------------------------

def tfidf_top_term(ds: rd.Dataset, id_col: str = "doc_id",
                   text_col: str = "text",
                   n_docs: int | None = None,
                   k: int = 1) -> rd.Dataset:
    """Most-distinctive term(s) per doc by TF-IDF (tf × ln(N/df));
    ``k > 1`` returns the top-k KEYWORDS per doc (RAKE-style keyword
    extraction for corpus tagging/faceting).

    Scale shape — NO vocabulary broadcast (the corpus DF table grows with
    the data, so it shuffles like any fact table):
      1. explode (doc, word) per batch;
      2. shuffle groupby (doc, word) → tf;
      3. shuffle groupby (word) over the tf table → df (rows per word ==
         docs containing it, no count-distinct needed);
      4. hash join tf ⋈ df on word, score vectorized;
      5. top-1 per doc (local prune + per-group reduce).
    Scores round half-away at 6 digits BEFORE the per-doc argmax, with a
    lexicographic word tie-break, so the winner is engine-independent."""
    from ..functions.rounding import round_np
    from . import relational as rel

    if n_docs is None:
        n_docs = ds.count()

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[[id_col, text_col]].dropna(subset=[text_col])
        out = (s.assign(word=s[text_col].str.split(" "))
                .explode("word")[[id_col, "word"]])
        return out[out["word"].notna()]

    words = ds.map_batches(explode, batch_format="pandas")
    tf = rel.grouped_agg(words, [id_col, "word"],
                         [("word", "count", "tf")], mode="bucket")

    # DF + score in ONE word-bucketed pass over the tf table: every row of
    # a word lands in the same bucket, so the in-bucket group size IS the
    # global document frequency — no tf ⋈ df join (also sidesteps Ray
    # 2.49's chained-hash-join empty-partition schema bug)
    def score(g: pd.DataFrame) -> pd.DataFrame:
        dfv = g.groupby("word", sort=False)["tf"].transform("size")
        tfidf = round_np(g["tf"].to_numpy(np.float64)
                         * np.log(n_docs / dfv.to_numpy(np.float64)), 6)
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "word": g["word"].to_numpy(),
                             "tfidf": tfidf})

    scored = rel.keyed_window(tf, "word", score, n_rows=n_docs * 64)
    return rel.topk_per_group(scored, [id_col], ["tfidf", "word"], k,
                              descending=[True, False])


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs a held-out set)
# ---------------------------------------------------------------------------

def decontaminate_flags(ds: rd.Dataset, bench_texts: list[str],
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 5) -> rd.Dataset:
    """Flag training docs sharing ANY word-n-gram with a benchmark set
    (test-set contamination screening, the standard 13-gram check scaled
    to short synth docs). The benchmark shingle set is small by definition
    (eval suites are thousands of docs), so it broadcasts once via
    ray.put; the corpus streams through a stateless map — no shuffle at
    all. Membership is a sorted-array binary search per doc's shingles."""
    import ray as _ray

    from .dedup import _shingle_hashes

    bench = np.unique(np.concatenate(
        [a for a in _shingle_hashes(bench_texts, n)] or
        [np.array([], np.uint64)]))
    ref = _ray.put(bench)

    def flag(t: pa.Table) -> pa.Table:
        b = _BENCH_CACHE.get(ref)
        if b is None:
            b = _ray.get(ref)
            _BENCH_CACHE.clear()
            _BENCH_CACHE[ref] = b
        sh = _shingle_hashes(t[text_col].to_pylist(), n)
        hit = np.fromiter(
            (int(np.isin(s, b, assume_unique=True).any()) for s in sh),
            dtype=np.int64, count=len(sh))
        return pa.table({id_col: t[id_col],
                         "contaminated": pa.array(hit, pa.int64())})

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


_BENCH_CACHE: dict = {}


# ---------------------------------------------------------------------------
# stopword-filtered token counts + Gopher-style quality bounds
# ---------------------------------------------------------------------------

def _string_array(col) -> pa.Array:
    """Table column → single contiguous StringArray (zero-copy when the
    column already has one chunk)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # pyarrow<13 returns CA
            col = col.chunk(0) if col.num_chunks else pa.array([], pa.string())
    return col


def _word_counts(text: pa.Array) -> tuple[np.ndarray, "pa.ListArray"]:
    """Per-row count of non-empty space-separated words (matches SQL
    len(list_filter(string_split(text,' '), x -> x <> ''))) plus the split
    ListArray for callers that need the tokens. Fully vectorized:
    split → flatten → bincount over repeated row indices."""
    lists = pc.split_pattern(text, " ")
    offs = lists.offsets.to_numpy()
    row_idx = np.repeat(np.arange(len(lists)), np.diff(offs))
    nonempty = pc.not_equal(lists.flatten(), "").to_numpy(zero_copy_only=False)
    n_words = np.bincount(row_idx[nonempty], minlength=len(lists))
    return n_words.astype(np.int64), lists


def add_content_token_counts(ds: rd.Dataset, text_col: str = "text",
                             out_col: str = "n_content",
                             stopwords: tuple[str, ...] = STOPWORDS) -> rd.Dataset:
    """Count of non-stopword, non-empty tokens per doc (the 'content token'
    signal used for vocabulary pruning). Shuffle-free; the stop set is a
    constant baked into the task closure."""
    stopset = pa.array(stopwords, pa.string())

    def fn(t: pa.Table) -> pa.Table:
        text = _string_array(t[text_col])
        lists = pc.split_pattern(text, " ")
        offs = lists.offsets.to_numpy()
        row_idx = np.repeat(np.arange(len(lists)), np.diff(offs))
        flat = lists.flatten()
        keep = pc.and_(pc.not_equal(flat, ""),
                       pc.invert(pc.is_in(flat, value_set=stopset)))
        n = np.bincount(row_idx[keep.to_numpy(zero_copy_only=False)],
                        minlength=len(lists)).astype(np.int64)
        return t.append_column(out_col, pa.array(n, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def gopher_bounds(ds: rd.Dataset, text_col: str = "text",
                  id_col: str = "doc_id",
                  min_words: int = 10, max_words: int = 5000,
                  min_wl: float = 2.0, max_wl: float = 12.0) -> rd.Dataset:
    """Gopher-style document bounds filter (Rae et al. 2021 §A1.1 shape):
    word-count range + mean-word-length range, emitted as per-rule signals
    plus the combined keep flag so downstream curation can audit which rule
    fired. Row-local, shuffle-free. Docs with zero words are dropped (no
    defined mean word length)."""
    from ..functions.rounding import round_np

    def fn(t: pa.Table) -> pa.Table:
        text = _string_array(t[text_col])
        n_words, _ = _word_counts(text)
        n_chars = pc.utf8_length(
            pc.replace_substring(text, " ", "")).to_numpy(
                zero_copy_only=False).astype(np.float64)
        nz = n_words >= 1
        n_words_nz = n_words[nz]
        mean_wl = n_chars[nz] / n_words_nz
        keep = ((n_words_nz >= min_words) & (n_words_nz <= max_words)
                & (mean_wl >= min_wl) & (mean_wl <= max_wl))
        return pa.table({
            id_col: _string_array(t[id_col]).filter(pa.array(nz)),
            "n_words": pa.array(n_words_nz, pa.int64()),
            "mean_word_len": pa.array(round_np(mean_wl, 4), pa.float64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# PII / pattern redaction
# ---------------------------------------------------------------------------

# Standard PII shapes plus a caller-supplied blocklist; both Arrow's
# replace_substring_regex and DuckDB's regexp_replace are RE2, so the oracle
# runs the IDENTICAL pattern text.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
)


def redact_patterns(ds: rd.Dataset,
                    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
                    text_col: str = "text",
                    out_col: str = "text_redacted",
                    count_col: str = "n_redacted") -> rd.Dataset:
    """Sequential RE2 redaction with a per-doc match count. Counts are
    taken per pattern against the ORIGINAL text (matches SQL
    ``len(regexp_extract_all(text, p))`` summed per pattern); replacements
    apply sequentially, which equals nested SQL ``regexp_replace`` as long
    as replacement tokens don't create later-pattern matches (the
    ``<EMAIL>``-style tokens don't). Row-local, shuffle-free; patterns are
    RE2-compiled once per task by Arrow."""
    def fn(t: pa.Table) -> pa.Table:
        text = _string_array(t[text_col])
        total = np.zeros(len(text), np.int64)
        red = text
        for pat, repl in patterns:
            total += pc.cast(pc.count_substring_regex(text, pat),
                             pa.int64()).to_numpy(zero_copy_only=False)
            red = pc.replace_substring_regex(red, pat, repl)
        return t.append_column(out_col, red).append_column(
            count_col, pa.array(total, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------

def bm25_scores(ds: rd.Dataset, terms: tuple[str, ...],
                k1: float = 1.2, b: float = 0.75,
                text_col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    """BM25 (Robertson/Lucene form) of each document against a fixed term
    set: score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)), with
    idf = ln((N−df+0.5)/(df+0.5)+1).

    Scale shape: pass 1 tokenizes once and keeps ONLY (id, dl, tf_j…) —
    integers, materialized so the corpus text is never re-read; corpus
    stats (N, Σdl, df_j) are per-batch partials combined on the driver
    (O(batches × terms), bounded); pass 2 is a broadcast-constant row-local
    score. The float expression is written in the same operation order as
    the SQL oracle so doubles agree bit-for-bit before rounding."""
    from ..functions.rounding import round_np

    m = len(terms)
    terms = tuple(terms)

    def tf_fn(t: pa.Table) -> pa.Table:
        text = _string_array(t[text_col])
        n_words, lists = _word_counts(text)
        offs = lists.offsets.to_numpy()
        row_idx = np.repeat(np.arange(len(lists)), np.diff(offs))
        flat = lists.flatten()
        cols = {id_col: t[id_col],
                "dl": pa.array(n_words, pa.int64())}
        for j, term in enumerate(terms):
            eq = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            cols[f"tf_{j}"] = pa.array(
                np.bincount(row_idx[eq], minlength=len(lists))
                .astype(np.int64))
        return pa.table(cols)

    tf = ds.map_batches(tf_fn, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()

    def stat_fn(t: pa.Table) -> pa.Table:
        out = {"n": pa.array([t.num_rows], pa.int64()),
               "dl_sum": pa.array([pc.sum(t["dl"]).as_py() or 0],
                                  pa.int64())}
        for j in range(m):
            out[f"df_{j}"] = pa.array(
                [pc.sum(pc.cast(pc.greater(t[f"tf_{j}"], 0),
                                pa.int64())).as_py() or 0], pa.int64())
        return pa.table(out)

    rows = tf.map_batches(stat_fn, batch_format="pyarrow").take_all()
    n_docs = sum(r["n"] for r in rows)
    dl_sum = sum(r["dl_sum"] for r in rows)
    df = np.array([sum(r[f"df_{j}"] for r in rows) for j in range(m)],
                  np.float64)
    avgdl = dl_sum / n_docs
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score_fn(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        denom_base = k1 * (1 - b + b * dl / avgdl)
        s = np.zeros(len(dl), np.float64)
        for j in range(m):
            tfj = t[f"tf_{j}"].to_numpy(zero_copy_only=False) \
                              .astype(np.float64)
            s += idf[j] * (tfj * (k1 + 1)) / (tfj + denom_base)
        return pa.table({id_col: t[id_col],
                         "bm25": pa.array(round_np(s, 6), pa.float64())})

    return tf.map_batches(score_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# bigram-LM quality score (CCNet perplexity-bucket family)
# ---------------------------------------------------------------------------

def _bigram_parts(t: pa.Table, text_col: str):
    """Per-batch consecutive word pairs, vectorized: split → flatten →
    mask out each row's final word → (w1, w2, row_of_each_bigram).
    Tokenization is string_split(text, ' ') verbatim (empties kept) so
    the DuckDB oracle shares it exactly."""
    text = _string_array(t[text_col])
    lists = pc.split_pattern(text, " ")
    offs = lists.offsets.to_numpy()
    flat = lists.flatten()
    row_idx = np.repeat(np.arange(len(lists)), np.diff(offs))
    valid = np.ones(len(flat), bool)
    starts, ends = offs[:-1], offs[1:]
    nz = ends > starts
    valid[ends[nz] - 1] = False  # last word of each non-empty row
    idx = np.flatnonzero(valid)
    take1 = pa.array(idx, pa.int64())
    take2 = pa.array(idx + 1, pa.int64())
    return flat.take(take1), flat.take(take2), row_idx[idx], lists


_LM_CACHE: dict = {}


def _train_bigram_lm(ds: rd.Dataset, text_col: str):
    """Add-one bigram model counts over a corpus: DataFrame
    (w1, w2, c12, c1) for every observed bigram plus V = distinct token
    count. Counting is one distributed tokenize pass with per-batch
    partials combined on the driver — sound because the finished model
    must fit one machine anyway (it broadcasts to every scoring task)."""
    from .relational import grouped_agg

    def bigram_rows(t: pa.Table) -> pa.Table:
        w1, w2, _, _ = _bigram_parts(t, text_col)
        return pa.table({"w1": w1, "w2": w2})

    cb = grouped_agg(ds.map_batches(bigram_rows, batch_format="pyarrow",
                                    zero_copy_batch=True),
                     ["w1", "w2"], [("w1", "count", "c12")],
                     mode="driver").to_pandas()

    def word_rows(t: pa.Table) -> pa.Table:
        text = _string_array(t[text_col])
        return pa.table({"w": pc.split_pattern(text, " ").flatten()})

    vocab = grouped_agg(ds.map_batches(word_rows, batch_format="pyarrow",
                                       zero_copy_batch=True),
                        ["w"], [("w", "count", "c")], mode="driver")
    v_size = float(vocab.count())
    cb["c1"] = cb.groupby("w1", sort=False)["c12"].transform("sum")
    return cb, v_size


def bigram_lm_nll(ds: rd.Dataset, id_col: str = "doc_id",
                  text_col: str = "text") -> rd.Dataset:
    """Language-model quality score (the CCNet perplexity-bucket family):
    per-document mean negative log-likelihood under an add-one-smoothed
    bigram LM, nll = avg(-ln((c12+1)/(c1+V))) over the doc's word
    bigrams, where c12 = corpus bigram count, c1 = Σ_w2 c12 and V =
    distinct corpus tokens. Documents with < 2 words emit no row (no
    bigrams), matching the SQL join semantics.

    Scale shape: training is tokenize passes whose per-batch partial
    counts combine on the driver — legitimate because the finished model
    must fit one machine regardless (it is broadcast to every scoring
    task); at web scale train on a bounded reference sample and prune
    rare bigrams, as CCNet trains KenLM on Wikipedia rather than the
    crawl. Scoring is a broadcast ray.put of the model + a per-batch
    vectorized merge and per-doc mean — row-local, no exchange."""
    scored = add_bigram_lm_nll(ds, text_col)

    def project(t: pa.Table) -> pa.Table:
        ok = pc.is_valid(t["nll"])
        return pa.table({id_col: t[id_col].filter(ok),
                         "nll": t["nll"].filter(ok)})

    return scored.map_batches(project, batch_format="pyarrow",
                              zero_copy_batch=True)


def add_bigram_lm_nll(ds: rd.Dataset, text_col: str = "text",
                      out_col: str = "nll") -> rd.Dataset:
    """bigram_lm_nll as an APPENDED column — keeps every input row and
    column (docs with < 2 words get a null score), so a filter can follow
    without any join. Same model, same score."""
    import ray

    from ..functions.rounding import round_np

    cb, v_size = _train_bigram_lm(ds, text_col)
    model = cb[["w1", "w2"]].copy()
    model["lp"] = -np.log((cb["c12"].to_numpy(np.float64) + 1.0)
                          / (cb["c1"].to_numpy(np.float64) + v_size))
    ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        m = _LM_CACHE.get(ref)
        if m is None:
            m = ray.get(ref)
            _LM_CACHE.clear()
            _LM_CACHE[ref] = m
        w1, w2, rows, _ = _bigram_parts(t, text_col)
        bg = pd.DataFrame({"w1": w1.to_pandas(), "w2": w2.to_pandas(),
                           "__row": rows})
        bg = bg.merge(m, on=["w1", "w2"], how="left")
        per_doc = bg.groupby("__row", sort=True)["lp"].mean()
        nll = np.full(t.num_rows, np.nan)
        nll[per_doc.index.to_numpy()] = round_np(
            per_doc.to_numpy(np.float64), 6)
        return t.append_column(
            out_col, pa.array(nll, pa.float64(), from_pandas=True))

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def dsir_log_weights(ds: rd.Dataset, target_filter, id_col: str = "doc_id",
                     text_col: str = "text") -> rd.Dataset:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    log w(doc) = Σ_bigrams [ln p_target(bigram) − ln p_raw(bigram)], with
    p_* add-one-smoothed bigram LMs — p_target trained on the rows
    selected by ``target_filter`` (a pa.Table → boolean-mask callable),
    p_raw on the whole corpus. High log_w = looks like the target
    distribution; resample proportionally to curate toward it.

    Unseen-in-target bigrams back off to ln(1/(c1_t+V_t)) with c1_t = 0
    for unseen first words (the add-one model is total). Both trainings
    are driver-combined counts (broadcast-model bound, see
    _train_bigram_lm); scoring is one row-local pass."""
    import ray

    from ..functions.rounding import round_np
    from .relational import filter_batches

    raw_cb, v_raw = _train_bigram_lm(ds, text_col)
    tgt_cb, v_tgt = _train_bigram_lm(filter_batches(ds, target_filter),
                                     text_col)
    raw = raw_cb[["w1", "w2"]].copy()
    raw["c12_r"] = raw_cb["c12"].astype(np.float64)
    raw["c1_r"] = raw_cb["c1"].astype(np.float64)
    tgt_pairs = tgt_cb[["w1", "w2"]].copy()
    tgt_pairs["c12_t"] = tgt_cb["c12"].astype(np.float64)
    tgt_c1 = (tgt_cb[["w1", "c1"]].drop_duplicates("w1")
              .rename(columns={"c1": "c1_t"}).astype({"c1_t": np.float64}))
    ref = ray.put((raw, tgt_pairs, tgt_c1, v_raw, v_tgt))

    def score(t: pa.Table) -> pa.Table:
        m = _LM_CACHE.get(ref)
        if m is None:
            m = ray.get(ref)
            _LM_CACHE.clear()
            _LM_CACHE[ref] = m
        raw_m, tp, tc1, vr, vt = m
        w1, w2, rows, _ = _bigram_parts(t, text_col)
        bg = pd.DataFrame({"w1": w1.to_pandas(), "w2": w2.to_pandas(),
                           "__row": rows})
        bg = bg.merge(raw_m, on=["w1", "w2"], how="left")
        bg = bg.merge(tp, on=["w1", "w2"], how="left")
        bg = bg.merge(tc1, on="w1", how="left")
        c12_t = bg["c12_t"].fillna(0.0).to_numpy()
        c1_t = bg["c1_t"].fillna(0.0).to_numpy()
        # same operation order as the oracle: ln(p_t) − ln(p_r), then SUM
        lr = (np.log((c12_t + 1.0) / (c1_t + vt))
              - np.log((bg["c12_r"].to_numpy() + 1.0)
                       / (bg["c1_r"].to_numpy() + vr)))
        per_doc = pd.Series(lr).groupby(bg["__row"], sort=True).sum()
        take = pa.array(per_doc.index.to_numpy(), pa.int64())
        return pa.table({
            id_col: pc.take(t[id_col], take),
            "log_w": pa.array(round_np(per_doc.to_numpy(np.float64), 6),
                              pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def corpus_dup_ngram_coverage(ds: rd.Dataset, id_col: str = "doc_id",
                              text_col: str = "text", n: int = 3) -> rd.Dataset:
    """CROSS-corpus duplicated-span coverage: per document, the fraction
    of its tokens lying inside at least one word n-gram that occurs more
    than once anywhere in the corpus — the fixed-length stand-in for
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"), where high coverage
    flags documents that are mostly recycled text even when no whole-doc
    near-dup exists. add_dup_ngram_fraction is the WITHIN-doc sibling.

    Shape: explode n-gram occurrence rows once; ONE exchange on the
    n-gram-hash bucket, inside which duplicated() over the actual n-gram
    string marks every occurrence of a corpus-repeated n-gram (all
    occurrences of an n-gram share its bucket, and the string comparison
    guards hash collisions — no count-shuffle, no join-back); expand each
    dup window to its n token positions and count distinct covered
    positions per doc inside doc-hash buckets (never one Ray group per
    doc); LEFT join back onto per-doc token counts so zero-coverage docs
    keep a row."""
    from ..functions.hashing import hash64
    from ..functions.rounding import round_np
    from .relational import (adaptive_bucket_count, drop_empty_blocks,
                             hash_join)

    nb = adaptive_bucket_count(None)

    def tri_rows(t: pa.Table) -> pa.Table:
        text = _string_array(t[text_col])
        lists = pc.split_pattern(text, " ")
        offs = lists.offsets.to_numpy()
        flat = lists.flatten().to_pandas().to_numpy()
        ids_np = t[id_col].to_numpy(zero_copy_only=False)
        out_doc, out_i, out_g = [], [], []
        for r in range(len(lists)):
            s, e = offs[r], offs[r + 1]
            m = e - s
            if m < n:
                continue
            toks = flat[s:e]
            grams = toks[:m - n + 1].astype(str)
            for d in range(1, n):
                grams = np.char.add(np.char.add(grams, " "),
                                    toks[d:m - n + 1 + d].astype(str))
            out_doc.append(np.repeat(ids_np[r], m - n + 1))
            out_i.append(np.arange(m - n + 1, dtype=np.int64))
            out_g.append(grams)
        if not out_doc:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "g": pa.array([], pa.string()),
                             "__b": pa.array([], pa.int32())})
        g_flat = np.concatenate(out_g).astype(object)
        b = (hash64(list(g_flat)) % np.uint64(nb)).astype(np.int32)
        return pa.table({
            id_col: pa.array(np.concatenate(out_doc)),
            "i": pa.array(np.concatenate(out_i), pa.int64()),
            "g": pa.array(g_flat, pa.string()),
            "__b": pa.array(b, pa.int32()),
        })

    tri = ds.map_batches(tri_rows, batch_format="pyarrow",
                         zero_copy_batch=True)

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g.duplicated("g", keep=False)]
        return d[[id_col, "i"]]

    dupw = tri.groupby("__b").map_groups(mark_dups, batch_format="pandas")

    def cover_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        i = t["i"].to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, n)
        j = (np.repeat(i, n)
             + np.tile(np.arange(n, dtype=np.int64), len(i)))
        hb = pd.util.hash_pandas_object(pd.Series(doc),
                                        index=False).to_numpy()
        return pa.table({id_col: pa.array(doc),
                         "j": pa.array(j, pa.int64()),
                         "__db": pa.array(
                             (hb % np.uint64(nb)).astype(np.int32))})

    cov_rows = dupw.map_batches(cover_rows, batch_format="pyarrow",
                                zero_copy_batch=True)

    def count_cov(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.drop_duplicates([id_col, "j"])
                .groupby(id_col, sort=False).size().rename("k")
                .reset_index())
        out["k"] = out["k"].astype(np.int64)
        return out[[id_col, "k"]]

    cov = cov_rows.groupby("__db").map_groups(count_cov,
                                              batch_format="pandas")

    def n_tokens(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(_string_array(t[text_col]), " ")
        offs = lists.offsets.to_numpy()
        return pa.table({id_col: t[id_col],
                         "n": pa.array(np.diff(offs), pa.int64())})

    nn = ds.map_batches(n_tokens, batch_format="pyarrow",
                        zero_copy_batch=True)
    j = hash_join(nn, drop_empty_blocks(cov), on=[id_col],
                  join_type="left_outer")

    def finish(t: pa.Table) -> pa.Table:
        k = pc.fill_null(t["k"], 0).to_numpy(zero_copy_only=False) \
              .astype(np.float64)
        den = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            id_col: t[id_col],
            "dup_cov": pa.array(round_np(k / den, 6), pa.float64())})

    return j.map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True)


# ---------------------------------------------------------------------------
# duplicate-n-gram fraction (within-doc repetition, Gopher §A1.1 family)
# ---------------------------------------------------------------------------

def add_dup_ngram_fraction(ds: rd.Dataset, n: int = 2,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> rd.Dataset:
    """Per-doc fraction of word n-gram occurrences that are repeats:
    1 − distinct_ngrams/total_ngrams. Docs with < n words are dropped.

    Vectorized across the whole batch: tokens hash once (xxhash via
    hash64), n-gram keys are a rolling polynomial combine of n token
    hashes, and per-row distinct counts come from one lexsort + diff —
    no per-row Python. 64-bit keys make a false merge (hash collision
    inside one doc) ~2⁻⁶⁴·pairs — negligible, and the DuckDB oracle
    compares true strings, so the gate would catch one."""
    from ..functions.rounding import round_np

    C = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier (golden-ratio mix)

    def fn(t: pa.Table) -> pa.Table:
        text = _string_array(t[text_col])
        lists = pc.split_pattern(text, " ")
        offs = lists.offsets.to_numpy()
        row_idx = np.repeat(np.arange(len(lists)), np.diff(offs))
        flat = lists.flatten()
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        row_idx = row_idx[ok]
        toks = flat.filter(pa.array(ok))
        h = hash64(toks)

        # n-gram key at position i covers tokens i..i+n-1 (same row only)
        if len(h) >= n:
            key = h[: len(h) - n + 1].copy()
            for j in range(1, n):
                key = key * C + h[j: len(h) - n + 1 + j]
            valid = row_idx[: len(h) - n + 1] == row_idx[n - 1:]
            g_row = row_idx[: len(h) - n + 1][valid]
            g_key = key[valid]
        else:
            g_row = np.array([], np.int64)
            g_key = np.array([], np.uint64)

        n_rows = len(lists)
        total = np.bincount(g_row, minlength=n_rows)
        if len(g_key):
            order = np.lexsort((g_key, g_row))
            sr, sk = g_row[order], g_key[order]
            first = np.ones(len(sk), bool)
            first[1:] = (sr[1:] != sr[:-1]) | (sk[1:] != sk[:-1])
            distinct = np.bincount(sr[first], minlength=n_rows)
        else:
            distinct = np.zeros(n_rows, np.int64)

        has = total >= 1
        frac = 1.0 - distinct[has] / total[has]
        return pa.table({
            id_col: _string_array(t[id_col]).filter(pa.array(has)),
            "n_ngrams": pa.array(total[has].astype(np.int64)),
            "dup_frac": pa.array(round_np(frac, 6), pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# sequence packing (token-budget bin assignment)
# ---------------------------------------------------------------------------

def pack_sequences(ds: rd.Dataset, budget: int,
                   token_col: str = "n_tokens",
                   id_col: str = "doc_id") -> rd.Dataset:
    """Assign documents to training-sequence bins of at most ``budget``
    tokens (first-fit-decreasing): output (id, bin_id, n_tokens) with
    Σ tokens ≤ budget per bin; a single document longer than the budget
    gets a bin of its own.

    Scale shape: packing is PARTITION-LOCAL — bins never span blocks, so
    the stage is embarrassingly parallel with zero shuffle and each task
    holds only its block's bin loads. That trades a little packing
    efficiency at block boundaries for linear scaling (the standard
    sharded-packing compromise). Bin ids are content-derived
    (min-id-in-bin), so re-running a partition reproduces its bins.
    The FFD loop is per-row Python by nature (each placement depends on
    every earlier one) — it is a packing algorithm, not a row transform;
    cost is O(n·open_bins) per block on integer arrays."""
    return ds.map_batches(
        lambda t: pack_table(t, budget, token_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True)


def pack_table(t: pa.Table, budget: int, token_col: str = "n_tokens",
               id_col: str = "doc_id") -> pa.Table:
    """The FFD packing kernel over one in-memory table (the per-block
    body of ``pack_sequences``, also driven directly by the corpus-export
    shard tasks). Bin tags are min-id-in-bin: unique ids ⇒ bins packed in
    separate chunks can never collide."""
    ids = t[id_col].to_pylist()
    toks = t[token_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((np.asarray(ids, dtype=object), -toks))
    bins: list[list[int]] = []   # row indexes per bin
    loads: list[int] = []
    for i in order:
        need = int(toks[i])
        for b, load in enumerate(loads):
            if load + need <= budget:
                bins[b].append(i)
                loads[b] += need
                break
        else:
            bins.append([i])
            loads.append(need)
    out_id, out_bin, out_tok = [], [], []
    for rows in bins:
        tag = str(min(ids[i] for i in rows))
        for i in rows:
            out_id.append(ids[i])
            out_bin.append(tag)
            out_tok.append(int(toks[i]))
    return pa.table({id_col: pa.array(out_id, t[id_col].type),
                     "bin_id": pa.array(out_bin, pa.string()),
                     "n_tokens": pa.array(out_tok, pa.int64())})


# ---------------------------------------------------------------------------
# text normalization (preprocessing canonical form)
# ---------------------------------------------------------------------------

def normalize_text(ds: rd.Dataset, text_col: str = "text",
                   out_col: str = "text_norm") -> rd.Dataset:
    """Canonical preprocessing form: unicode NFC → lowercase → collapse
    runs of whitespace to one space → trim. DuckDB states the identical
    chain (nfc_normalize → lower → regexp_replace '\\s+' → trim), so the
    normalized bytes hash-match across engines — the property exact-dedup
    and fingerprinting stages depend on.

    Lower/collapse/trim are Arrow kernels. NFC is NOT: pyarrow 16's
    utf8_normalize reorders but never composes (e+U+0301 stays two
    codepoints, unlike every SQL engine's nfc_normalize), so composition
    falls back to unicodedata.normalize — gated behind a vectorized
    string_is_ascii check so pure-ASCII batches (the common web-text case)
    never touch Python strings, and non-ASCII batches pay one C-level call
    per affected row only."""
    import unicodedata

    def fn(t: pa.Table) -> pa.Table:
        x = _string_array(t[text_col])
        ascii_mask = pc.string_is_ascii(x)
        if not pc.all(ascii_mask).as_py():
            vals = x.to_pylist()
            flags = ascii_mask.to_numpy(zero_copy_only=False)
            vals = [v if (a or v is None)
                    else unicodedata.normalize("NFC", v)
                    for v, a in zip(vals, flags)]
            x = pa.array(vals, x.type)
        x = pc.utf8_lower(x)
        x = pc.replace_substring_regex(x, r"\s+", " ")
        x = pc.utf8_trim_whitespace(x)
        return t.append_column(out_col, x)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_compression_ratio(ds: rd.Dataset, text_col: str = "text",
                          id_col: str = "doc_id") -> rd.Dataset:
    """zlib compression ratio per document (compressed bytes / raw bytes,
    UTF-8) — the classic cheap proxy for repetitive/boilerplate web text
    used alongside the Gopher rules: degenerate pages compress far below
    natural prose (< ~0.3 at level 6), while unique prose sits ~0.4–0.7.
    Row-local map stage (zlib is stdlib and deterministic across runs for
    a fixed level), no shuffle at any scale. NULL text → NULL ratio."""
    import zlib

    from ..functions.rounding import round_np

    def fn(t: pa.Table) -> pa.Table:
        txt = t[text_col].to_pylist()
        ratios = np.full(len(txt), np.nan)
        for i, s in enumerate(txt):
            if s is None:
                continue
            raw = s.encode("utf-8")
            if raw:
                ratios[i] = len(zlib.compress(raw, 6)) / len(raw)
        return pa.table({id_col: t[id_col],
                         "compression_ratio": pa.array(
                             round_np(ratios, 6), pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def chunk_word_windows(ds: rd.Dataset, id_col: str = "doc_id",
                       text_col: str = "text", size: int = 50,
                       stride: int = 40) -> rd.Dataset:
    """Split each document into fixed-size word windows with overlap
    (size − stride words shared between consecutive chunks) — the
    context-window chunking step of a pretraining/RAG corpus build.
    Chunk i covers words [i·stride, i·stride+size); starts run to
    ceil(n/stride) so every word lands in ≥ 1 chunk and no chunk starts
    past the end. Row-local (a doc's words never leave its batch), so
    the op is a pure map stage at any scale; output rows ≈ rows × n/stride.
    NULL text is dropped (SQL unnest semantics). Deterministic; chunk
    text is the single-space join shared verbatim with the oracle."""
    if stride <= 0 or size < stride:
        raise ValueError("need 0 < stride <= size")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch[text_col].notna()]
        ids, cis, chunks = [], [], []
        for did, text in zip(batch[id_col], batch[text_col]):
            w = text.split(" ")
            for i in range(int(np.ceil(len(w) / stride))):
                ids.append(did)
                cis.append(i)
                chunks.append(" ".join(w[i * stride:i * stride + size]))
        return pd.DataFrame({id_col: ids, "chunk_id": cis, "chunk": chunks})

    return ds.map_batches(fn, batch_format="pandas")


def regex_extract_columns(ds: rd.Dataset, col: str, pattern: str,
                          drop_unmatched: bool = False) -> rd.Dataset:
    """Grok-style multi-field extraction: ONE compiled RE2 pattern with
    named groups runs per batch through pyarrow's extract_regex kernel and
    every named group becomes a column — the generic form of the field
    mappers the flagship parse stage specializes (≙ reference grok/regex
    parse tables, app/log_processor.py field extraction). Non-matching
    rows yield null fields (SQL regexp_extract semantics) or drop when
    ``drop_unmatched``. Vectorized end-to-end: no Python per row, no
    pandas conversion."""
    def fn(t: pa.Table) -> pa.Table:
        s = t[col]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        st = pc.extract_regex(s, pattern)
        out = t
        for i in range(st.type.num_fields):
            name = st.type.field(i).name
            out = out.append_column(name, pc.struct_field(st, name))
        if drop_unmatched:
            out = out.filter(pc.is_valid(st))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# BPE tokenizer training (exact greedy merges, distributed pair counts)
# ---------------------------------------------------------------------------

def _apply_merges_flat(codes: np.ndarray, word_of: np.ndarray,
                       merges: list[tuple[int, int, int]]):
    """Apply a ranked merge list to a flat symbol stream (greedy
    left-to-right within each word, one vectorized pass per merge —
    BPE apply order: by merge rank, not by position). Returns the new
    (codes, word_of). Overlapping candidates only occur for x==y merges;
    there, the leftmost of each consecutive run wins alternately (exact
    greedy semantics)."""
    for a, b, new in merges:
        if len(codes) < 2:
            continue
        cand = np.flatnonzero((codes[:-1] == a) & (codes[1:] == b)
                              & (word_of[:-1] == word_of[1:]))
        if len(cand) == 0:
            continue
        if a == b:
            # greedy left-to-right on an x==x run merges positions
            # 0, 2, 4, … of each maximal consecutive-candidate run
            run_start = np.ones(len(cand), bool)
            run_start[1:] = cand[1:] != cand[:-1] + 1
            run_id = np.cumsum(run_start) - 1
            starts = np.flatnonzero(run_start)
            pos_in_run = np.arange(len(cand)) - starts[run_id]
            cand = cand[pos_in_run % 2 == 0]
        codes = codes.copy()
        codes[cand] = new
        keep = np.ones(len(codes), bool)
        keep[cand + 1] = False
        codes = codes[keep]
        word_of = word_of[keep]
    return codes, word_of


def bpe_train(ds: rd.Dataset, text_col: str = "text",
              n_merges: int = 10) -> list[dict]:
    """Train ``n_merges`` exact greedy BPE merges over the corpus
    (Sennrich et al. 2016): start from characters, repeatedly merge the
    globally most frequent adjacent symbol pair (ties broken by lowest
    (left, right) symbol ids — deterministic across engines and
    partitionings). Returns one dict per merge:
    ``{rank, left, right, merged, count}`` (symbol strings).

    Scale shape — no word-frequency table anywhere: round 0 is one pass
    collecting the distinct alphabet (bounded by charset); each merge
    round is ONE map_batches pass that re-applies the current merge list
    to its batch on the fly and emits adjacent-pair counts as a partial
    (bounded by (alphabet + merges)² pairs, in practice the few thousand
    pairs actually adjacent); the driver combines partials and appends
    the argmax merge. n_merges passes total — the standard trade for
    training exactly on the full corpus instead of a sample."""
    import pyarrow.compute as pc

    # round 0: distinct characters → initial symbol table
    def chars_partial(t: pa.Table) -> pa.Table:
        text = _string_array(t[text_col])
        joined = "".join(text.drop_null().to_pylist())
        uniq = sorted(set(joined) - {" "})
        return pa.table({"c": pa.array(uniq, pa.string())})

    alpha = sorted({r["c"] for r in ds.map_batches(
        chars_partial, batch_format="pyarrow",
        zero_copy_batch=True).take_all()})
    symbols: list[str] = list(alpha)
    merges: list[tuple[int, int, int]] = []
    out: list[dict] = []
    # the single-char id space is fixed after round 0: one sorted
    # codepoint lookup serves every round (vectorized map, no per-char
    # Python in the per-batch path)
    cp_sorted = np.array([ord(c) for c in alpha], np.int64)

    def batch_codes(t: pa.Table, cps: np.ndarray):
        """Flat (codes, word_of) for a batch: split to words, then chars
        — codepoints via one utf-32 decode, ids via one searchsorted."""
        text = _string_array(t[text_col])
        words = pc.split_pattern(text, " ").flatten()
        wl = pc.utf8_length(words).to_numpy(zero_copy_only=False)
        word_of = np.repeat(np.arange(len(words)), wl)
        flat_chars = "".join(words.to_pylist())
        cp = np.frombuffer(flat_chars.encode("utf-32-le"),
                           dtype=np.uint32).astype(np.int64)
        idx = np.searchsorted(cps, cp)
        ok = (idx < len(cps))
        ok &= cps[np.minimum(idx, len(cps) - 1)] == cp
        return idx[ok], word_of[ok]

    for rank in range(n_merges):
        ref = ray.put((cp_sorted, list(merges)))
        K = len(symbols) + 1  # pair key base (current symbol count)

        def pair_partial(t: pa.Table, ref=ref, K=K) -> pa.Table:
            cps, mg = ray.get(ref)
            codes, word_of = batch_codes(t, cps)
            codes, word_of = _apply_merges_flat(codes, word_of, mg)
            if len(codes) < 2:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            adj = word_of[:-1] == word_of[1:]
            keys = codes[:-1][adj] * K + codes[1:][adj]
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({"k": pa.array(uk, pa.int64()),
                             "n": pa.array(cnt.astype(np.int64))})

        from .relational import grouped_agg
        combined = grouped_agg(
            ds.map_batches(pair_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["k"], [("n", "sum", "n")]).take_all()
        if not combined:
            break
        ks = np.array([r["k"] for r in combined], np.int64)
        ns = np.array([r["n"] for r in combined], np.int64)
        best = np.lexsort((ks, -ns))[0]  # max count, then lowest pair key
        a, b = int(ks[best] // K), int(ks[best] % K)
        new_sym = symbols[a] + symbols[b]
        new_id = len(symbols)
        symbols.append(new_sym)
        merges.append((a, b, new_id))
        out.append({"rank": rank, "left": symbols[a], "right": symbols[b],
                    "merged": new_sym, "count": int(ns[best])})
    return out


def bpe_segment(ds: rd.Dataset, merge_table: list[dict],
                id_col: str = "doc_id", text_col: str = "text",
                out_col: str = "n_bpe_tokens") -> rd.Dataset:
    """Apply a trained merge table and count the resulting BPE tokens per
    document — broadcast the merges once, row-local vectorized apply."""
    import pyarrow.compute as pc

    # rebuild the symbol/merge id space exactly as bpe_train evolved it
    symbols: list[str] = []
    sym_id: dict = {}
    merges: list[tuple[int, int, int]] = []
    for m in merge_table:
        for part in (m["left"], m["right"]):
            if len(part) == 1 and part not in sym_id:
                sym_id[part] = len(symbols)
                symbols.append(part)
    for m in merge_table:
        a, b = sym_id[m["left"]], sym_id[m["right"]]
        nid = sym_id.setdefault(m["merged"], len(symbols))
        if nid == len(symbols):
            symbols.append(m["merged"])
        merges.append((a, b, nid))
    single_cp = np.array(sorted(ord(c) for c in sym_id
                                if len(c) == 1), np.int64)
    single_id = np.array([sym_id[chr(c)] for c in single_cp], np.int64)
    ref = ray.put((single_cp, single_id, list(merges)))

    def fn(t: pa.Table) -> pa.Table:
        cps, ids, mg = ray.get(ref)
        text = _string_array(t[text_col])
        words = pc.split_pattern(text, " ")
        offs = words.offsets.to_numpy()
        flat = words.flatten()
        wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        word_of = np.repeat(np.arange(len(flat)), wl)
        chars = "".join(flat.to_pylist())
        cp = np.frombuffer(chars.encode("utf-32-le"),
                           dtype=np.uint32).astype(np.int64)
        if len(cps):
            idx = np.minimum(np.searchsorted(cps, cp), len(cps) - 1)
            known = cps[idx] == cp
            # unknown chars keep code -1: never merge-eligible (merge ids
            # are >= 0) but still block adjacency and count as one token
            codes = np.where(known, ids[idx], np.int64(-1))
        else:
            codes = np.full(len(cp), -1, np.int64)
        codes2, word_of2 = _apply_merges_flat(codes, word_of, mg)
        # tokens per word = symbols remaining; roll up words per doc
        row_of_word = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        toks_per_word = np.bincount(word_of2, minlength=len(flat))
        per_doc = np.zeros(t.num_rows, np.int64)
        np.add.at(per_doc, row_of_word, toks_per_word)
        return t.append_column(out_col, pa.array(per_doc, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# URL canonicalization (web-crawl key normalization)
# ---------------------------------------------------------------------------

def canonicalize_urls(ds: rd.Dataset, url_col: str = "url",
                      out_col: str = "canon_url") -> rd.Dataset:
    """Canonical URL form — the key a crawl dedups/groups on (raw URLs
    split the same page across variants): lowercase scheme+host, strip
    the fragment and the whole query string, drop the scheme's default
    port (:80 for http, :443 for https), drop a leading ``www.``, and
    strip trailing slashes from the path. Row-local RE2/Arrow kernels
    only — the DuckDB oracle states the IDENTICAL regex chain, so
    canonical bytes hash-match across engines (the property a
    canonical-key dedup depends on). Rows whose value doesn't parse as
    an http(s) URL get a null canon_url."""
    def fn(t: pa.Table) -> pa.Table:
        u = _string_array(t[url_col])
        st = pc.extract_regex(u, r"^(?P<scheme>[Hh][Tt][Tt][Pp][Ss]?)://"
                                 r"(?P<host>[^/?#]+)")
        scheme = pc.utf8_lower(pc.struct_field(st, "scheme"))
        host = pc.utf8_lower(pc.struct_field(st, "host"))
        # default port by scheme
        host = pc.if_else(pc.equal(scheme, "http"),
                          pc.replace_substring_regex(host, r":80$", ""),
                          pc.replace_substring_regex(host, r":443$", ""))
        host = pc.replace_substring_regex(host, r"^www\.", "")
        # path: strip fragment, then query, then capture, then trailing /
        nofrag = pc.replace_substring_regex(u, r"#.*", "")
        noq = pc.replace_substring_regex(nofrag, r"\?.*", "")
        pst = pc.extract_regex(noq, r"^[Hh][Tt][Tt][Pp][Ss]?://[^/?#]+"
                                    r"(?P<path>/.*)?$")
        # unset optional group or non-matching row both → "" (the
        # non-http case still yields null canon via scheme/host nulls
        # propagating through binary_join_element_wise)
        path = pc.fill_null(pc.struct_field(pst, "path"), "")
        path = pc.replace_substring_regex(path, r"/+$", "")
        canon = pc.binary_join_element_wise(
            scheme, pa.array(["://"] * t.num_rows, pa.string()),
            host, path, "")
        return t.append_column(out_col, canon)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def extract_host(urls: pa.Array | pa.ChunkedArray):
    """Lowercase host of each http(s) URL, port stripped; null when the
    value doesn't parse as an http(s) URL. The ONE host-extraction
    kernel — the blocklist gate and any host-grouping query must share
    it (two hand-synced copies of the regex is how a filter and its
    grouping key silently diverge)."""
    return pc.utf8_lower(pc.struct_field(
        pc.extract_regex(urls, r"^[Hh][Tt][Tt][Pp][Ss]?://"
                               r"(?P<h>[^/?#:]+)"), "h"))


def block_by_domain_suffix(ds: rd.Dataset, suffixes: list[str],
                           url_col: str = "url",
                           keep_blocked: bool = False,
                           host_col: str | None = None) -> rd.Dataset:
    """Domain-suffix blocklist filter — the URL-level curation gate a web
    corpus runs before any content work (RefinedWeb/Dolma block whole
    domains by suffix list). A row is blocked when its url host (ports
    stripped, case-folded) equals a suffix or ends with ".<suffix>" —
    subdomains of a blocked domain block too, but "notexample.com" does
    NOT match "example.com". Row-local Arrow kernels; the suffix list is
    a broadcast constant (at real scale, ship a large list via ray.put
    and match against a reversed-host sorted array instead of the OR
    chain). Rows with no parseable host are kept (no host to block on).

    ``keep_blocked=True`` inverts the filter (audit view). ``host_col``
    appends the extracted host to the output (consumers grouping by host
    reuse this pass instead of re-running the regex)."""
    sfx = [s.lower().lstrip(".") for s in suffixes]

    def fn(t: pa.Table) -> pa.Table:
        host = extract_host(t[url_col])
        blocked = pa.array(np.zeros(t.num_rows, bool))
        for s in sfx:
            hit = pc.or_(pc.equal(host, s), pc.ends_with(host, "." + s))
            blocked = pc.or_(blocked, pc.fill_null(hit, False))
        if host_col is not None:
            t = t.append_column(host_col, host)
        return t.filter(blocked if keep_blocked else pc.invert(blocked))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# unigram-LM tokenizer (SentencePiece-style EM; Kudo 2018)
# ---------------------------------------------------------------------------
#
# The second tokenizer-training family next to bpe_train: a subword vocab
# fit by expectation-maximization over the word-frequency table instead of
# greedy pair merges. Distributed shape:
#   1. ONE bucket exchange builds the distinct (word, count) table
#      (vocabulary ≪ corpus rows — the same bounded-vocab trade every
#      word-level op here makes);
#   2. seed candidates = all substrings ≤ seed_max_len of every distinct
#      word, counted in a second bucket exchange, top-N kept (single
#      chars always kept so every word stays segmentable);
#   3. each EM round is ONE map_batches pass over the word table: the
#      current piece log-probs ride in as a broadcast dict, each task
#      runs the forward-backward lattice per DISTINCT word (cost
#      O(len · seed_max_len) per word, never per corpus row) and emits
#      expected-count partials bounded by the vocab size; the driver
#      folds partials and renormalizes — O(vocab) driver state;
#   4. between rounds the lowest-probability multi-char pieces prune
#      until the vocab target, Viterbi segmentation ships as a row-local
#      map (unigram_segment).

_UNIGRAM_MAX_WORD = 32  # DP window per word; longer words truncate


def _word_freq_table(ds: rd.Dataset, text_col: str) -> rd.Dataset:
    """Distinct lowercase whitespace words with corpus counts (bucket
    exchange — word keys ≈ vocabulary, far below rows)."""
    from .relational import drop_empty_blocks, grouped_agg

    def emit(t: pa.Table) -> pa.Table:
        text = _string_array(t[text_col])
        words = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").flatten()
        words = words.filter(pc.not_equal(words, ""))
        g = pa.table({"word": words}).group_by(["word"]).aggregate(
            [([], "count_all")])
        return pa.table({"word": g["word"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    return drop_empty_blocks(grouped_agg(
        ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True),
        ["word"], [("n", "sum", "n")], mode="bucket"))


def _em_pass(words: rd.Dataset, logp: dict[str, float],
             max_len: int) -> tuple[dict[str, float], float]:
    """One E-step over the distributed word table → (expected piece
    counts, corpus log-likelihood). Lattice forward-backward per distinct
    word in log space; only vocab-bounded partials leave each task."""
    import math

    vref = ray.put(logp)

    def partial(t: pa.Table, _v=vref) -> pa.Table:
        lp = ray.get(_v)
        exp_counts: dict[str, float] = {}
        ll = 0.0
        ws = t["word"].to_pylist()
        ns = t["n"].to_numpy(zero_copy_only=False)
        for w, n in zip(ws, ns):
            w = w[:_UNIGRAM_MAX_WORD]
            L = len(w)
            NEG = -1e30
            alpha = [NEG] * (L + 1)
            alpha[0] = 0.0
            edges = []  # (i, j, piece, logp)
            for i in range(L):
                if alpha[i] <= NEG:
                    continue
                for j in range(i + 1, min(i + max_len, L) + 1):
                    p = w[i:j]
                    l = lp.get(p)
                    if l is None:
                        continue
                    edges.append((i, j, p, l))
                    s = alpha[i] + l
                    a = alpha[j]
                    alpha[j] = s if a <= NEG else (
                        max(a, s) + math.log1p(math.exp(-abs(a - s))))
            if alpha[L] <= NEG:
                continue  # unsegmentable (chars pruned) — skip, like SP
            beta = [NEG] * (L + 1)
            beta[L] = 0.0
            for i, j, p, l in reversed(edges):
                s = l + beta[j]
                b = beta[i]
                beta[i] = s if b <= NEG else (
                    max(b, s) + math.log1p(math.exp(-abs(b - s))))
            z = alpha[L]
            ll += float(n) * z
            for i, j, p, l in edges:
                g = alpha[i] + l + beta[j] - z
                if g > -30.0:
                    exp_counts[p] = exp_counts.get(p, 0.0) + \
                        float(n) * math.exp(g)
        return pa.table({"piece": pa.array(list(exp_counts), pa.string()),
                         "c": pa.array(list(exp_counts.values()),
                                       pa.float64()),
                         "ll": pa.array([ll] + [0.0] * (len(exp_counts) - 1)
                                        if exp_counts else [],
                                        pa.float64())})

    counts: dict[str, float] = {}
    total_ll = 0.0
    parts = words.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        t = pa.table(b)
        for p, c in zip(t["piece"].to_pylist(),
                        t["c"].to_numpy(zero_copy_only=False)):
            counts[p] = counts.get(p, 0.0) + float(c)
        if t.num_rows:
            total_ll += float(np.sum(t["ll"].to_numpy(
                zero_copy_only=False)))
    return counts, total_ll


def unigram_train(ds: rd.Dataset, text_col: str = "text",
                  vocab_size: int = 400, seed_size: int = 2000,
                  seed_max_len: int = 4, em_iters: int = 2,
                  prune_frac: float = 0.25) -> list[dict]:
    """Fit a unigram-LM subword vocabulary (Kudo 2018 / SentencePiece
    shape) by EM + pruning. Returns [{piece, logp}] sorted by -logp then
    piece — deterministic under any partitioning (all reductions are
    order-free sums; ties in the prune break lexicographically)."""
    import math

    words = _word_freq_table(ds, text_col).materialize()

    # seed: substring counts (one more bucket exchange), top seed_size +
    # every single character (keeps all words segmentable)
    from .relational import drop_empty_blocks, grouped_agg, topk

    def subs(t: pa.Table) -> pa.Table:
        out: dict[str, float] = {}
        for w, n in zip(t["word"].to_pylist(),
                        t["n"].to_numpy(zero_copy_only=False)):
            w = w[:_UNIGRAM_MAX_WORD]
            for i in range(len(w)):
                for j in range(i + 1, min(i + seed_max_len, len(w)) + 1):
                    p = w[i:j]
                    out[p] = out.get(p, 0.0) + float(n)
        return pa.table({"piece": pa.array(list(out), pa.string()),
                         "c": pa.array(list(out.values()), pa.float64())})

    sub_counts = drop_empty_blocks(grouped_agg(
        words.map_batches(subs, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["piece"], [("c", "sum", "c")], mode="bucket")).materialize()

    from .relational import filter_batches

    # chars come back via a distributed filter (the driver never holds
    # the full substring table — only top-N + the bounded charset)
    char_rows = filter_batches(
        sub_counts,
        lambda t: pc.equal(pc.utf8_length(t["piece"]), 1)).take_all()
    chars = {r["piece"] for r in char_rows}
    top = topk(sub_counts, ["c", "piece"], seed_size,
               descending=[True, False]).take_all()
    vocab = {r["piece"]: float(r["c"]) for r in top}
    for r in char_rows:
        vocab.setdefault(r["piece"], float(r["c"]))

    def renorm(counts: dict[str, float]) -> dict[str, float]:
        tot = sum(counts.values())
        return {p: math.log(c / tot) for p, c in counts.items() if c > 0}

    logp = renorm(vocab)
    while True:
        for _ in range(em_iters):
            counts, _ll = _em_pass(words, logp, seed_max_len)
            # characters never die mid-EM: floor them so every word stays
            # reachable for the next pass
            for ch in chars:
                counts[ch] = max(counts.get(ch, 0.0), 1e-6)
            logp = renorm(counts)
        n_multi = sum(1 for p in logp if len(p) > 1)
        target_multi = max(0, vocab_size - len(chars))
        if n_multi <= target_multi:
            break
        keep_multi = max(target_multi, int(n_multi * (1 - prune_frac)))
        if keep_multi >= n_multi:
            keep_multi = target_multi
        ranked = sorted((p for p in logp if len(p) > 1),
                        key=lambda p: (-logp[p], p))
        kept = set(ranked[:keep_multi]) | chars
        logp = renorm({p: math.exp(l) for p, l in logp.items()
                       if p in kept})
    counts, _ = _em_pass(words, logp, seed_max_len)
    for ch in chars:
        counts[ch] = max(counts.get(ch, 0.0), 1e-6)
    logp = renorm(counts)
    return [{"piece": p, "logp": float(l)}
            for p, l in sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))]


def unigram_segment(ds: rd.Dataset, vocab: list[dict],
                    id_col: str = "doc_id", text_col: str = "text",
                    max_len: int | None = None) -> rd.Dataset:
    """Viterbi-segment each doc under a trained unigram vocab → (id,
    n_pieces, nll). Row-local map, vocab broadcast once per task; ties
    broken toward the LONGER piece (then lexicographically earlier),
    pinned for tests. ``max_len`` defaults to the longest vocab piece —
    an independent value shorter than that would silently skip long
    pieces in the DP inner loop."""
    lp = {r["piece"]: float(r["logp"]) for r in vocab}
    if max_len is None:
        max_len = max((len(p) for p in lp), default=1)
    vref = ray.put(lp)

    def seg(t: pa.Table, _v=vref) -> pa.Table:
        v = ray.get(_v)
        text = _string_array(t[text_col])
        n_pieces = np.zeros(t.num_rows, np.int64)
        nll = np.zeros(t.num_rows, np.float64)
        for r, s in enumerate(text.to_pylist()):
            if not s:
                continue
            tot_n, tot_l = 0, 0.0
            for w in s.lower().split():
                w = w[:_UNIGRAM_MAX_WORD]
                L = len(w)
                NEG = -1e30
                best = [NEG] * (L + 1)
                cnt = [0] * (L + 1)
                best[0] = 0.0
                for i in range(L):
                    if best[i] <= NEG:
                        continue
                    for j in range(i + 1, min(i + max_len, L) + 1):
                        l = v.get(w[i:j])
                        if l is None:
                            continue
                        s2 = best[i] + l
                        # strictly-better OR equal-score-longer-piece wins
                        if s2 > best[j] + 1e-12:
                            best[j], cnt[j] = s2, cnt[i] + 1
                if best[L] > NEG:
                    tot_n += cnt[L]
                    tot_l -= best[L]
            n_pieces[r] = tot_n
            nll[r] = tot_l
        return pa.table({id_col: t[id_col],
                         "n_pieces": pa.array(n_pieces),
                         "nll": pa.array(nll)})

    return ds.map_batches(seg, batch_format="pyarrow", zero_copy_batch=True)


def bigram_pmi(ds: rd.Dataset, text_col: str = "text",
               min_count: int = 2,
               broadcast_vocab_max: int = 2_000_000) -> rd.Dataset:
    """Pointwise mutual information of adjacent word bigrams:
    pmi(w1,w2) = ln(n(w1,w2) * N / (n(w1) * n(w2))), N = total tokens —
    the classic collocation-mining statistic (phrase detection for
    tokenizer / n-gram vocab curation).

    Scale shape: ONE pass over the text emits per-batch PARTIAL counts
    for bigrams and unigrams unioned in a single narrow kind-tagged
    table (documents text is never read twice and never re-exchanged);
    the distributed reduce then moves O(types × blocks) partial rows
    only. Unigram attach is broadcast-gated like curation's anti-join:
    vocab ≤ ``broadcast_vocab_max`` rides to every task as one dict
    (ray.put once), a larger vocab falls back to two hash joins
    (w1 then w2) so nothing assumes the vocabulary fits in memory.
    min_count prunes the bigram tail BEFORE the join/broadcast."""
    from .relational import (drop_empty_blocks, filter_batches, grouped_agg,
                             hash_join)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"kind": pa.array([], pa.int8()),
                          "w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        arr = _string_array(t[text_col]).drop_null()
        if len(arr) == 0:
            return empty
        # tokenize in Arrow: split once, keep the flat token buffer
        # zero-copy (no per-doc Python lists — this was the slowest
        # non-curation headline stage as a pandas str.split)
        lists = pc.split_pattern(arr, " ")
        flat = lists.flatten()
        n_flat = len(flat)
        if n_flat == 0:
            return empty
        ug = pa.table({"w1": flat}).group_by(["w1"]).aggregate(
            [([], "count_all")])
        n_uni = ug.num_rows
        out = [pa.table({
            "kind": pa.array(np.ones(n_uni, np.int8)),
            "w1": ug["w1"],
            "w2": pa.array([""] * n_uni, pa.string()),
            "n": pc.cast(ug["count_all"], pa.int64()),
        })]
        if n_flat > 1:
            # adjacent pairs, masking the doc-boundary positions so no
            # bigram spans two documents
            lens = np.diff(lists.offsets.to_numpy())
            valid = np.ones(n_flat - 1, dtype=bool)
            ends = np.cumsum(lens) - 1
            valid[ends[:-1]] = False
            vmask = pa.array(valid)
            w1 = flat.slice(0, n_flat - 1).filter(vmask)
            w2 = flat.slice(1, n_flat - 1).filter(vmask)
            if len(w1):
                bg = pa.table({"w1": w1, "w2": w2}).group_by(
                    ["w1", "w2"]).aggregate([([], "count_all")])
                out.append(pa.table({
                    "kind": pa.array(np.zeros(bg.num_rows, np.int8)),
                    "w1": bg["w1"],
                    "w2": bg["w2"],
                    "n": pc.cast(bg["count_all"], pa.int64()),
                }))
        return pa.concat_tables(out, promote_options="permissive")

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    # type space grows with data but ≪ token instances (Zipf) → shuffle
    counts = grouped_agg(parts, ["kind", "w1", "w2"],
                         [("n", "sum", "n")], mode="shuffle")
    counts = counts.materialize()
    uni = filter_batches(counts, lambda t: pc.equal(t["kind"], 1)) \
        .select_columns(["w1", "n"])
    bi = filter_batches(counts, lambda t: pc.and_(
        pc.equal(t["kind"], 0), pc.greater_equal(t["n"], min_count))) \
        .select_columns(["w1", "w2", "n"])

    # ONE streaming pass over the (materialized, so re-scan-cheap) unigram
    # side computes n_tok, the vocab size AND the broadcast dict together —
    # this used to be three separate Dataset executions (sum, count,
    # to_pandas), and at bench scale each execution is ~0.1-0.2 s of pure
    # orchestration latency. The dict stays capacity-gated: the moment it
    # crosses ``broadcast_vocab_max`` it is discarded and the loop keeps
    # only the n_tok accumulator, so driver memory never exceeds the gate
    # and the giant-vocab regime still falls through to the hash joins.
    n_tok = 0.0
    vocab: dict | None = {}
    for b in uni.iter_batches(batch_format="pyarrow", batch_size=65536):
        ns = b["n"].to_numpy(zero_copy_only=False)
        n_tok += float(ns.sum())
        if vocab is not None:
            vocab.update(zip(b["w1"].to_pylist(), ns))
            if len(vocab) > broadcast_vocab_max:
                vocab = None

    def finish(df: pd.DataFrame, n1, n2) -> pd.DataFrame:
        pmi = np.log(df["n"].to_numpy(np.float64) * n_tok
                     / (n1.astype(np.float64) * n2.astype(np.float64)))
        from ..functions.rounding import round_np
        return pd.DataFrame({"w1": df["w1"], "w2": df["w2"],
                             "n_pair": df["n"].astype(np.int64),
                             "pmi": round_np(pmi, 6)})

    if vocab is not None:
        ref = ray.put(vocab)

        def score(df: pd.DataFrame) -> pd.DataFrame:
            m = _BI_PMI_CACHE.get(ref)
            if m is None:
                _BI_PMI_CACHE.clear()
                m = _BI_PMI_CACHE[ref] = ray.get(ref)
            n1 = df["w1"].map(m).to_numpy(np.float64)
            n2 = df["w2"].map(m).to_numpy(np.float64)
            return finish(df, n1, n2)

        return bi.map_batches(score, batch_format="pandas")

    # counts came through a shuffle groupby → empty-schema blocks crash
    # Ray 2.49's join; drop them before joining (perf playbook)
    u1 = drop_empty_blocks(uni).map_batches(
        lambda t: t.rename_columns(["w1", "__n1"]), batch_format="pyarrow")
    u2 = drop_empty_blocks(uni).map_batches(
        lambda t: t.rename_columns(["w2", "__n2"]), batch_format="pyarrow")
    j1 = hash_join(drop_empty_blocks(bi), u1, on=["w1"])
    # the join's own output partitions can be empty-schema too
    joined = hash_join(drop_empty_blocks(j1), u2, on=["w2"])
    return joined.map_batches(
        lambda df: finish(df, df["__n1"].to_numpy(np.float64),
                          df["__n2"].to_numpy(np.float64)),
        batch_format="pandas")


_BI_PMI_CACHE: dict = {}


# ---------------------------------------------------------------------------
# distribution drift: per-language unigram JS divergence vs the corpus
# ---------------------------------------------------------------------------

def lang_unigram_jsd(ds: rd.Dataset, group_col: str = "lang",
                     text_col: str = "text",
                     vocab_k: int = 200) -> pa.Table:
    """Training-mixture drift monitor: Jensen–Shannon divergence between
    each group's unigram distribution and the whole corpus's, over the
    corpus top-``vocab_k`` words plus one OOV mass bucket. JSD(P,Q) =
    ½ΣP·ln(P/M) + ½ΣQ·ln(Q/M), M=(P+Q)/2, natural log; zero-P terms
    contribute only their Q half (Q > 0 for every bucket by
    construction — the vocab comes from corpus counts).

    Scale shape: pass 1 is the corpus_top_words pattern (per-batch vocab
    partials → shuffle-mode word reduce → top-k); pass 2 broadcasts the
    tiny vocab and emits per-batch (group, bucket) count partials — keys
    bounded at #groups × (vocab_k+1), so the combine is a driver fold and
    driver state is independent of corpus size. Text is read twice and
    never exchanged. Tokenization matches the oracle:
    list_filter(string_split(text, ' '), x -> x <> '')."""
    from .relational import grouped_agg, topk

    def vocab_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[text_col].dropna().str.split(" ").explode()
        vc = vc[vc != ""].value_counts()
        return pd.DataFrame({"word": vc.index, "n_p": vc.to_numpy()})

    counts = grouped_agg(
        ds.select_columns([text_col]).map_batches(vocab_partial,
                                                  batch_format="pandas"),
        ["word"], [("n_p", "sum", "n")])
    top = pa.concat_tables([pa.table(b) for b in topk(
        counts, ["n", "word"], vocab_k,
        descending=[True, False]).iter_batches(batch_format="pyarrow")])
    vocab = {w: i for i, w in enumerate(top["word"].to_pylist())}
    nv = len(vocab)  # bucket nv == OOV
    vocab_ref = ray.put(vocab)

    def bucket_partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vocab_ref)
        toks = batch[[group_col, text_col]].dropna(subset=[text_col])
        toks = toks.assign(**{text_col: toks[text_col].str.split(" ")}) \
                   .explode(text_col)
        toks = toks[toks[text_col] != ""]
        b = toks[text_col].map(v).fillna(nv).astype(np.int64)
        g = pd.DataFrame({group_col: toks[group_col], "b": b}) \
            .groupby([group_col, "b"], sort=False).size().reset_index()
        g.columns = [group_col, "b", "n_p"]
        return g

    cells = pa.concat_tables([pa.table(x) for x in grouped_agg(
        ds.select_columns([group_col, text_col]).map_batches(
            bucket_partial, batch_format="pandas"),
        [group_col, "b"], [("n_p", "sum", "n")],
        mode="driver").iter_batches(batch_format="pyarrow")])

    df = cells.to_pandas()
    # dense (group × bucket) count matrix, bounded: groups × (vocab_k+1)
    groups = sorted(df[group_col].unique())
    gi = {g: i for i, g in enumerate(groups)}
    mat = np.zeros((len(groups), nv + 1), np.float64)
    mat[df[group_col].map(gi).to_numpy(),
        df["b"].to_numpy()] = df["n"].to_numpy()
    q_cnt = mat.sum(axis=0)
    q = q_cnt / q_cnt.sum()           # corpus distribution (all buckets > 0
    out_g, out_j, out_n = [], [], []  # whenever the corpus has any token)
    for g in groups:
        row = mat[gi[g]]
        tot = row.sum()
        p = row / tot
        m = (p + q) / 2.0
        pos = p > 0
        qpos = q > 0  # an all-zero OOV bucket (vocab covers every word)
        jsd = 0.5 * float(np.sum(p[pos] * np.log(p[pos] / m[pos]))) \
            + 0.5 * float(np.sum(q[qpos] * np.log(q[qpos] / m[qpos])))
        out_g.append(g)
        out_j.append(round_scalar(jsd, 6))
        out_n.append(int(tot))
    return pa.table({group_col: pa.array(out_g),
                     "n_tokens": pa.array(out_n, pa.int64()),
                     "jsd": pa.array(out_j, pa.float64())})


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of BM25 and TF-IDF rankings
# ---------------------------------------------------------------------------

def hybrid_rrf(ds: rd.Dataset, terms: tuple[str, ...],
               k1: float = 1.2, b: float = 0.75, k_rrf: int = 60,
               list_k: int = 100, top_n: int = 20,
               text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Reciprocal-rank fusion of two retrieval rankings for one query —
    BM25 (the bm25_scores kernel) and length-normalized TF-IDF
    (Σ tf·ln((N+1)/(df+1)) / dl) — the standard hybrid-search merge:
    rrf(d) = Σ_lists 1/(k_rrf + rank_d), over each scorer's top
    ``list_k`` (rank by score DESC, id ASC; scores rounded to 6 digits
    BEFORE ranking on both sides so the oracle ranks identical doubles).

    Scale shape: ONE tokenize pass keeps only (id, dl, tf_j…) integers;
    corpus stats are bounded driver partials; both scores are row-local;
    each top-``list_k`` list comes from the partializable topk operator
    (per-block prune, no global sort); the fuse itself touches ≤
    2·list_k driver rows."""
    from ..functions.rounding import round_np
    from .relational import topk

    m = len(terms)
    terms = tuple(terms)

    def tf_fn(t: pa.Table) -> pa.Table:
        text = _string_array(t[text_col])
        n_words, lists = _word_counts(text)
        offs = lists.offsets.to_numpy()
        row_idx = np.repeat(np.arange(len(lists)), np.diff(offs))
        flat = lists.flatten()
        cols = {id_col: t[id_col], "dl": pa.array(n_words, pa.int64())}
        for j, term in enumerate(terms):
            eq = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            cols[f"tf_{j}"] = pa.array(
                np.bincount(row_idx[eq], minlength=len(lists))
                .astype(np.int64))
        return pa.table(cols)

    tf = ds.map_batches(tf_fn, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()

    def stat_fn(t: pa.Table) -> pa.Table:
        out = {"n": pa.array([t.num_rows], pa.int64()),
               "dl_sum": pa.array([pc.sum(t["dl"]).as_py() or 0], pa.int64())}
        for j in range(m):
            out[f"df_{j}"] = pa.array(
                [pc.sum(pc.cast(pc.greater(t[f"tf_{j}"], 0),
                                pa.int64())).as_py() or 0], pa.int64())
        return pa.table(out)

    rows = tf.map_batches(stat_fn, batch_format="pyarrow").take_all()
    n_docs = sum(r["n"] for r in rows)
    dl_sum = sum(r["dl_sum"] for r in rows)
    df = np.array([sum(r[f"df_{j}"] for r in rows) for j in range(m)],
                  np.float64)
    avgdl = dl_sum / n_docs
    idf_bm = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    idf_tfidf = np.log((n_docs + 1.0) / (df + 1.0))

    def score_fn(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        denom_base = k1 * (1 - b + b * dl / avgdl)
        s1 = np.zeros(len(dl), np.float64)
        s2 = np.zeros(len(dl), np.float64)
        for j in range(m):
            tfj = t[f"tf_{j}"].to_numpy(zero_copy_only=False) \
                              .astype(np.float64)
            s1 += idf_bm[j] * (tfj * (k1 + 1)) / (tfj + denom_base)
            s2 += tfj * idf_tfidf[j]
        with np.errstate(invalid="ignore"):  # dl == 0 → score 0, like SQL
            s2 = np.where(dl > 0, s2 / dl, 0.0)
        return pa.table({id_col: t[id_col],
                         "s1": pa.array(round_np(s1, 6), pa.float64()),
                         "s2": pa.array(round_np(s2, 6), pa.float64())})

    sc = tf.map_batches(score_fn, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()

    def ranked(col: str) -> dict:
        lst = pa.concat_tables([pa.table(x) for x in topk(
            sc.select_columns([id_col, col]), [col, id_col], list_k,
            descending=[True, False]).iter_batches(batch_format="pyarrow")])
        lst = lst.sort_by([(col, "descending"), (id_col, "ascending")])
        return {d: r + 1 for r, d in enumerate(lst[id_col].to_pylist())}

    r1, r2 = ranked("s1"), ranked("s2")
    fused = {d: (1.0 / (k_rrf + r1[d]) if d in r1 else 0.0)
             + (1.0 / (k_rrf + r2[d]) if d in r2 else 0.0)
             for d in set(r1) | set(r2)}
    order = sorted(fused, key=lambda d: (-fused[d], d))[:top_n]
    return pa.table({id_col: pa.array(order, pa.int64()),
                     "rrf": pa.array([round_scalar(fused[d], 6)
                                      for d in order], pa.float64())})


# ---------------------------------------------------------------------------
# token-budget mixture: per-group doc selection under a token budget
# ---------------------------------------------------------------------------

def token_budget_sample(ds: rd.Dataset, budgets: dict | int,
                        group_col: str = "lang", text_col: str = "text",
                        id_col: str = "doc_id") -> rd.Dataset:
    """Deterministic token-budget mixture: per group, walk the docs in
    md5(id)-hash order (the reproducible-shuffle order of
    doc_split_assign) and keep the prefix whose CUMULATIVE whitespace
    token count stays ≤ the group's budget — the "mix N tokens of each
    language" primitive of training-data assembly. Selection is exact
    (identical to a per-group ORDER BY hash cumsum), stable under
    re-runs and resharding.

    Scale shape — NO global or per-group sort of the corpus:
      pass 1 token-counts each doc and emits per-batch partial sums into
      65,536 hash-prefix bins per group (bounded driver combine); the
      driver prefix-sums each group's bins to locate the BOUNDARY bin
      where the budget is crossed;
      pass 2 collects ONLY the boundary bin's docs (≈ corpus/65k) and
      walks them in (hash, id) order to the exact cutoff;
      pass 3 is a row-local filter: keep bins below the boundary plus
      the boundary's broadcast keep-set.
    Groups whose total fits the budget keep everything without a
    boundary walk."""
    import hashlib

    if not isinstance(budgets, dict):
        budgets = {"__all__": int(budgets)}

    def _h(ids) -> list[str]:
        return [hashlib.md5(str(v).encode()).hexdigest() for v in ids]

    def p1(t: pa.Table) -> pa.Table:
        n_words, _ = _word_counts(_string_array(t[text_col]))
        hs = _h(t[id_col].to_pylist())
        bins = np.array([int(h[:4], 16) for h in hs], np.int64)
        g = pa.table({group_col: t[group_col],
                      "b": pa.array(bins, pa.int64()),
                      "tok": pa.array(n_words, pa.int64())}) \
            .group_by([group_col, "b"]).aggregate([("tok", "sum"),
                                                   ([], "count_all")])
        return g.rename_columns([group_col, "b", "tok_p", "n_p"])

    from .relational import grouped_agg

    cells = pa.concat_tables([pa.table(x) for x in grouped_agg(
        ds.select_columns([group_col, id_col, text_col]).map_batches(
            p1, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, "b"], [("tok_p", "sum", "tok"), ("n_p", "sum", "n")],
        mode="driver").iter_batches(batch_format="pyarrow")])
    df = cells.to_pandas().sort_values(["b"])

    # per group: boundary bin + tokens already consumed before it
    boundary: dict = {}      # group → (boundary_bin, budget_left_at_bin)
    keep_whole: set = set()  # groups whose total fits the budget
    for g, sub in df.groupby(group_col, sort=False):
        budget = budgets.get(g, budgets.get("__all__"))
        if budget is None:
            continue  # group not budgeted → dropped entirely
        cum = sub["tok"].cumsum()
        if int(cum.iloc[-1]) <= budget:
            keep_whole.add(g)
            continue
        over = cum > budget
        i = int(np.argmax(over.to_numpy()))
        bb = int(sub["b"].iloc[i])
        before = int(cum.iloc[i - 1]) if i else 0
        boundary[g] = (bb, budget - before)

    # pass 2: exact cutoff inside each boundary bin (tiny: corpus/65536)
    if boundary:
        bset = {(g, bb) for g, (bb, _) in boundary.items()}

        def collect(t: pa.Table) -> pa.Table:
            n_words, _ = _word_counts(_string_array(t[text_col]))
            ids = t[id_col].to_pylist()
            hs = _h(ids)
            rows = [(g, h, i, int(n)) for g, h, i, n in
                    zip(t[group_col].to_pylist(), hs, ids, n_words)
                    if (g, int(h[:4], 16)) in bset]
            if not rows:
                return pa.table({group_col: pa.array([], pa.string()),
                                 "h": pa.array([], pa.string()),
                                 id_col: pa.array([], pa.int64()),
                                 "tok": pa.array([], pa.int64())})
            gs, hh, ii, tt = zip(*rows)
            return pa.table({group_col: pa.array(list(gs)),
                             "h": pa.array(list(hh)),
                             id_col: pa.array(list(ii), pa.int64()),
                             "tok": pa.array(list(tt), pa.int64())})

        edge = pa.concat_tables([pa.table(x) for x in ds.select_columns(
            [group_col, id_col, text_col]).map_batches(
            collect, batch_format="pyarrow", zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow")])
        edge_keep: dict = {g: set() for g in boundary}
        epd = edge.to_pandas().sort_values(["h", id_col])
        for g, sub in epd.groupby(group_col, sort=False):
            left = boundary[g][1]
            for i, n in zip(sub[id_col], sub["tok"]):
                if n > left:
                    break  # prefix semantics: first overflow stops the walk
                left -= int(n)
                edge_keep[g].add(int(i))
    else:
        edge_keep = {}

    keep_ref = ray.put((keep_whole, boundary, edge_keep))

    def final(t: pa.Table) -> pa.Table:
        kw, bd, ek = ray.get(keep_ref)
        n_words, _ = _word_counts(_string_array(t[text_col]))
        ids = t[id_col].to_pylist()
        hs = _h(ids)
        keep = []
        for g, h, i in zip(t[group_col].to_pylist(), hs, ids):
            if g in kw:
                keep.append(True)
            elif g in bd:
                b = int(h[:4], 16)
                keep.append(b < bd[g][0]
                            or (b == bd[g][0] and int(i) in ek.get(g, ())))
            else:
                keep.append(False)
        out = t.filter(pa.array(keep))
        nw2, _ = _word_counts(_string_array(out[text_col]))
        return pa.table({id_col: out[id_col], group_col: out[group_col],
                         "n_tokens": pa.array(nw2, pa.int64())})

    return ds.select_columns([group_col, id_col, text_col]).map_batches(
        final, batch_format="pyarrow", zero_copy_batch=True)
