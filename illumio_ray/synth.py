"""Deterministic synthetic generator for the flagship input tables.

Generates the Common-Crawl-style ``pages`` table (BASELINE.json input_hint:
url, warc_ts, html, text, lang) plus the two enrichment lookup tables, with
no external data. Fully seeded → byte-stable across runs, so the DuckDB
oracle can read the same parquet the Ray pipeline reads.

Properties mirrored from the reference workload (see SURVEY.md §1/§2):
  - skewed host popularity (Zipf-ish) — exercises salting / skew handling;
  - a fixed 48-hour warc_ts window — exercises hour bucketing and the
    look-back-window predicate (reference app/s3_manager.py:212);
  - ~2% structurally truncated html — the parse-error-drop path
    (reference app/log_processor.py:353-354);
  - ~3% pages missing the event marker — the "unknown" routing class;
  - many parquet fragments even at small scale — exercises fragment-level
    lineage, resume, and read parallelism.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import LOOKUP_HOST_SCHEMA, LOOKUP_LANG_SCHEMA, PAGES_SCHEMA

SEED = 42
BASE_TS_US = np.datetime64("2024-10-01T00:00:00", "us").astype("int64")
WINDOW_US = 48 * 3600 * 1_000_000  # 48 hours

LANGS = ["en", "de", "fr", "es", "zh", "ja", "ru", "pt"]
LANG_WEIGHTS = np.array([0.45, 0.10, 0.09, 0.09, 0.08, 0.07, 0.06, 0.06])
LANG_NAMES = {
    "en": "English", "de": "German", "fr": "French", "es": "Spanish",
    "zh": "Chinese", "ja": "Japanese", "ru": "Russian", "pt": "Portuguese",
}
LANG_FAMILIES = {
    "en": "germanic", "de": "germanic", "fr": "romance", "es": "romance",
    "zh": "sinitic", "ja": "japonic", "ru": "slavic", "pt": "romance",
}

HOST_CATEGORIES = ["news", "social", "commerce", "tech", "blog", "gov", "malware", "edu"]
PAGE_EVENTS = ["page_view", "click", "purchase", "login", "error", "admin"]
EVENT_WEIGHTS = np.array([0.50, 0.20, 0.12, 0.08, 0.06, 0.04])

VOCAB = (
    "data stream batch shard block table column row index key value hash "
    "merge sort scan filter join group count window river stone cloud "
    "signal vector packet node actor task queue spill cache page crawl "
    "token parse route sink lineage commit resume metric quick brown fox "
    "jumps over lazy dog alpha beta gamma delta epsilon zeta eta theta "
    "red|blue"  # one word containing '|' to exercise wire escaping
).split()

N_HOSTS = 150
FRAC_TRUNCATED = 0.02
FRAC_NO_EVENT = 0.03


def host_pool() -> list[str]:
    return [f"host{i:03d}.example-{HOST_CATEGORIES[i % len(HOST_CATEGORIES)]}.com"
            for i in range(N_HOSTS)]


def _zipf_host_probs(n: int, a: float = 1.3) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** a
    return w / w.sum()


def _gen_fragment(frag_idx: int, n_rows: int, row_offset: int, seed: int) -> pa.Table:
    """Fully vectorized (Arrow/numpy kernels; no per-row Python) so large
    scale factors for the scaling benchmark generate in seconds."""
    import pyarrow.compute as pc

    rng = np.random.default_rng([seed, frag_idx])
    hosts = np.array(host_pool())
    host_idx = rng.choice(N_HOSTS, size=n_rows, p=_zipf_host_probs(N_HOSTS))
    lang = rng.choice(np.array(LANGS), size=n_rows, p=LANG_WEIGHTS)
    event = rng.choice(np.array(PAGE_EVENTS), size=n_rows, p=EVENT_WEIGHTS)
    ts_us = BASE_TS_US + rng.integers(0, WINDOW_US, size=n_rows)
    n_words = rng.integers(5, 80, size=n_rows)
    truncated = rng.random(n_rows) < FRAC_TRUNCATED
    no_event = (~truncated) & (rng.random(n_rows) < FRAC_NO_EVENT)

    vocab = np.array(VOCAB)
    # One flat draw for all words of all rows; per-row join via Arrow's
    # list binary_join (C++), not a Python loop.
    total_words = int(n_words.sum())
    flat_words = vocab[rng.integers(0, len(vocab), size=total_words)]
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_words, out=offsets[1:])
    flat_arr = pa.array(flat_words, pa.string())
    if isinstance(flat_arr, pa.ChunkedArray):
        flat_arr = flat_arr.combine_chunks()
    word_lists = pa.ListArray.from_arrays(pa.array(offsets), flat_arr)
    text = pc.binary_join(word_lists, " ")

    page_ids = row_offset + np.arange(n_rows)
    w1 = vocab[rng.integers(0, len(vocab), size=n_rows)]
    w2 = vocab[rng.integers(0, len(vocab), size=n_rows)]

    def _s(x) -> pa.Array:
        return pa.array(x, pa.string())

    def _cat(*parts) -> pa.Array:
        # last positional arg of binary_join_element_wise is the separator
        return pc.binary_join_element_wise(*parts, "", null_handling="skip")

    pid10 = _s(np.char.zfill(page_ids.astype("U10"), 10))
    url = _cat("https://", _s(hosts[host_idx]), "/p/", pid10, "-",
               _s(np.char.replace(w1, "|", "-")), ".html")
    title = _cat(_s(np.char.replace(w1, "|", " ")), " ",
                 _s(np.char.replace(w2, "|", " ")), " ",
                 _s(page_ids.astype("U10")))
    meta = pc.if_else(
        pa.array(no_event),
        pa.scalar("", pa.string()),
        _cat('<meta name="event" content="', _s(event), '"/>'))

    head = _cat("<html><head><title>", title, "</title>", meta,
                "</head><body>")
    full = _cat(head, text, "</body></html>")
    # Truncated bodies (~2%): per-row slice stop is not vectorizable in
    # Arrow; build replacements for just those rows, then replace_with_mask.
    if truncated.any():
        idx = pa.array(np.flatnonzero(truncated))
        head_sub = head.take(idx).to_pylist()
        text_sub = text.take(idx).to_pylist()
        repl = pa.array(
            [h + t[: max(1, len(t) // 2)] for h, t in zip(head_sub, text_sub)],
            pa.string())
        html = pc.replace_with_mask(full, pa.array(truncated), repl)
    else:
        html = full

    return pa.table(
        {
            "url": url,
            "warc_ts": pa.array(ts_us, pa.timestamp("us")),
            "html": pc.cast(html, pa.binary()),
            "text": text,
            "lang": pa.array(lang, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def _write_fragment(job: tuple) -> str:
    frag_idx, n, offset, seed, pages_dir = job
    tbl = _gen_fragment(frag_idx, n, offset, seed)
    # Small row groups keep fragments splittable into multiple read
    # blocks (a single-row-group file caps read parallelism at 1 task).
    path = Path(pages_dir) / f"part-{frag_idx:05d}.parquet"
    pq.write_table(tbl, path, compression="zstd", row_group_size=8192)
    return str(path)


def lookup_tables() -> tuple[pa.Table, pa.Table]:
    lang_tbl = pa.table(
        {
            "lang": LANGS,
            "lang_name": [LANG_NAMES[l] for l in LANGS],
            "lang_family": [LANG_FAMILIES[l] for l in LANGS],
        },
        schema=LOOKUP_LANG_SCHEMA,
    )
    hosts = host_pool()
    # A few lookup misses are modeled by *extra* lookup rows, not missing
    # ones: every generated host resolves; the misses path is covered by
    # rows whose url fails host extraction (none in synth) and by unit tests.
    host_tbl = pa.table(
        {
            "url_host": hosts,
            "host_category": [h.split("example-")[1].split(".")[0] for h in hosts],
            "host_rank": list(range(1, len(hosts) + 1)),
        },
        schema=LOOKUP_HOST_SCHEMA,
    )
    return lang_tbl, host_tbl


def rows_for_sf(sf: float) -> int:
    return max(1000, int(sf * 5_000_000))


def synth_pages(out_dir: str | Path, rows: int, num_files: int | None = None,
                seed: int = SEED, force: bool = False) -> dict:
    """Write the pages dataset + lookups under out_dir. Idempotent via a
    marker file recording the generation parameters (≙ the reference's
    processed-state manifest idea, app/s3_manager.py:253-267)."""
    out = Path(out_dir)
    marker = out / "_SYNTH_OK.json"
    params = {"rows": rows, "num_files": num_files, "seed": seed, "v": 5}
    if marker.exists() and not force:
        try:
            if json.loads(marker.read_text())["params"] == params:
                return json.loads(marker.read_text())
        except Exception:
            pass
    if num_files is None:
        num_files = max(8, rows // 31250)
    pages_dir = out / "pages"
    pages_dir.mkdir(parents=True, exist_ok=True)
    for old in pages_dir.glob("*.parquet"):
        old.unlink()
    per = [rows // num_files + (1 if i < rows % num_files else 0) for i in range(num_files)]
    offsets = np.zeros(num_files, dtype=np.int64)
    np.cumsum(per[:-1], out=offsets[1:])
    jobs = [(i, per[i], int(offsets[i]), seed, str(pages_dir)) for i in range(num_files)]
    # Fragments are independent (seeded by [seed, frag_idx]) → generate in
    # parallel worker processes; output bytes are identical to a serial run.
    if rows >= 200_000 and num_files > 1:
        from concurrent.futures import ProcessPoolExecutor

        workers = min(num_files, os.cpu_count() or 4, 16)
        with ProcessPoolExecutor(workers) as ex:
            list(ex.map(_write_fragment, jobs, chunksize=1))
    else:
        for job in jobs:
            _write_fragment(job)
    lang_tbl, host_tbl = lookup_tables()
    pq.write_table(lang_tbl, out / "lookup_lang.parquet")
    pq.write_table(host_tbl, out / "lookup_host.parquet")
    info = {
        "params": params,
        "pages_dir": str(pages_dir),
        "lookup_lang": str(out / "lookup_lang.parquet"),
        "lookup_host": str(out / "lookup_host.parquet"),
        "rows": rows,
        "num_files": num_files,
    }
    tmp = out / "_SYNTH_OK.json.tmp"
    tmp.write_text(json.dumps(info, indent=1))
    os.replace(tmp, marker)
    return info


def ensure_pages_for_sf(sf: float, base: str = "/tmp/illumio_ray_testdata",
                        seed: int = SEED) -> dict:
    """Synthesize (once) the pages dataset scaled like the driver's sf dirs.

    sf0.001 → 5k rows, sf0.01 → 50k, sf0.1 → 500k. The output path encodes
    the sf so the DuckDB oracle can address it statically."""
    out_dir = Path(base) / f"sf{sf:g}"
    return synth_pages(out_dir, rows_for_sf(sf), seed=seed)


def sf_from_dir(sf_dir: str) -> float:
    """Parse the scale factor out of a driver sf dir path like
    '/root/testdata/sf0.01'."""
    name = Path(sf_dir).name
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return 0.01
