"""Constrained-memory probe: run an expensive pipeline under a
deliberately tiny object store and report spill + driver RSS.

The property that matters at 100 TB is timing-independent: the streaming
executor's working set must not grow with input size. The round-4 probe
established this for the flagship (sf4 under 512 MB, zero spill); this
script makes the probe reproducible and extends it to the DEDUP/CURATION
family (VERDICT r4 item 5), whose exchanges (minhash banding, reduce-side
verify join, component propagation) are the other memory-heavy paths.

    python scripts/memory_probe.py --what curation --docs 250000
    python scripts/memory_probe.py --what flagship --sf 4

Documents are synthesized deterministically (seeded per fragment, Ray
tasks writing parquet shards — same pattern as illumio_ray.synth): a
zipf-ish 50k vocab, 30–80 tokens/doc, ~4% exact duplicates and ~6%
near-duplicates (1–2 token substitutions of an earlier doc in the same
fragment), so the exact-dedup, LSH candidate and verify stages all do
real work. 250k docs exceeds BROADCAST_VERIFY_MAX_DOCS and the minhash
driver gate, so the probe exercises the DISTRIBUTED paths.

Prints one JSON line: elapsed, rows in/kept, spilled_mib (from Ray's
memory summary), driver peak RSS.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

STORE_MB_DEFAULT = 512


def synth_documents(out_dir: Path, n_docs: int, num_files: int = 32,
                    seed: int = 42) -> Path:
    """Deterministic documents corpus with exact + near duplicates.
    Marker-keyed: regenerated only when (n_docs, num_files, seed, v)
    change."""
    import ray

    marker = out_dir / "_MARKER.json"
    params = {"n_docs": n_docs, "num_files": num_files, "seed": seed, "v": 1}
    if marker.exists() and json.loads(marker.read_text()) == params:
        return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    out_dir.mkdir(parents=True)

    @ray.remote
    def gen(frag: int, rows: int, row0: int) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(seed * 1_000_003 + frag)
        # zipf-ish vocab: token ids drawn from a truncated zipf
        vocab_n = 50_000
        ranks = rng.zipf(1.3, size=rows * 80)
        ranks = ranks[ranks <= vocab_n][: rows * 80]
        while len(ranks) < rows * 80:  # top-up for the tail we cut
            more = rng.zipf(1.3, size=rows * 20)
            ranks = np.concatenate([ranks, more[more <= vocab_n]])
        lens = rng.integers(30, 81, size=rows)
        offs = np.concatenate([[0], np.cumsum(lens)])
        texts: list[str] = []
        for r in range(rows):
            toks = ranks[offs[r]: offs[r + 1]]
            texts.append(" ".join(f"w{t}" for t in toks))
        # duplicates of earlier docs in this fragment
        kind = rng.random(rows)
        for r in range(1, rows):
            if kind[r] < 0.04:  # exact dup
                texts[r] = texts[int(rng.integers(0, r))]
            elif kind[r] < 0.10:  # near dup: substitute 1-2 tokens
                base = texts[int(rng.integers(0, r))].split(" ")
                for _ in range(int(rng.integers(1, 3))):
                    base[int(rng.integers(0, len(base)))] = \
                        f"w{int(rng.integers(1, vocab_n))}"
                texts[r] = " ".join(base)
        langs = rng.choice(np.array(["en", "de", "fr", "es", "ja"]),
                           size=rows, p=[0.6, 0.12, 0.12, 0.1, 0.06])
        t = pa.table({
            "doc_id": pa.array(np.arange(row0, row0 + rows, dtype=np.int64)),
            "lang": pa.array(langs.astype(object), pa.string()),
            "text": pa.array(texts, pa.string()),
        })
        p = out_dir / f"frag-{frag:05d}.parquet"
        pq.write_table(t, p)
        return str(p)

    per = n_docs // num_files
    jobs = []
    row0 = 0
    for f in range(num_files):
        rows = per + (n_docs % num_files if f == num_files - 1 else 0)
        jobs.append(gen.remote(f, rows, row0))
        row0 += rows
    ray.get(jobs)
    marker.write_text(json.dumps(params))
    return out_dir


def _spilled_mib() -> float:
    """Bytes of spilled objects on disk for the CURRENT Ray session —
    the plasma store writes spill files under
    <session_dir>/ray_spilled_objects*; no dir ⇔ zero spill. (The
    memory_summary API needs grpc, absent in this container.)"""
    import ray

    try:
        sd = Path(ray._private.worker.global_worker.node
                  .get_session_dir_path())
        total = sum(f.stat().st_size
                    for d in sd.glob("ray_spilled_objects*")
                    for f in d.rglob("*") if f.is_file())
        return round(total / (1024 * 1024), 2)
    except Exception:
        return -1.0  # unavailable; do not claim zero


def probe_curation(n_docs: int, num_cpus: int, store_mb: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus,
             object_store_memory=store_mb * 1024 * 1024,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from illumio_ray.pipelines.curation import curate

    docs_dir = synth_documents(
        Path(f"/tmp/illumio_probe_docs_{n_docs}"), n_docs)
    t0 = time.time()
    docs = rd.read_parquet(str(docs_dir))
    kept, report = curate(docs, near_dup_threshold=0.8,
                          spill_dir=f"/tmp/illumio_probe_spill_{n_docs}")
    n_kept = kept.count()
    elapsed = time.time() - t0
    out = {
        "what": "curation", "n_docs": n_docs, "num_cpus": num_cpus,
        "object_store_mb": store_mb, "elapsed_sec": round(elapsed, 2),
        "docs_per_sec": round(n_docs / elapsed),
        "n_kept": n_kept, "report": report,
        "spilled_mib": _spilled_mib(),
        "driver_peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024),
    }
    ray.shutdown()
    return out


def probe_pmi(n_docs: int, num_cpus: int, store_mb: int) -> dict:
    """Bigram PMI over the synthetic corpus — exercises grouped_agg's
    SHUFFLE mode (Ray sort-based groupby over a grows-with-data key
    space) under the constrained store, the other all-to-all family the
    curation probe doesn't cover."""
    import ray

    ray.init(address="local", num_cpus=num_cpus,
             object_store_memory=store_mb * 1024 * 1024,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from illumio_ray.ops.textops import bigram_pmi

    docs_dir = synth_documents(
        Path(f"/tmp/illumio_probe_docs_{n_docs}"), n_docs)
    t0 = time.time()
    docs = rd.read_parquet(str(docs_dir), columns=["text"])
    out = bigram_pmi(docs, "text", min_count=2)
    n_pairs = out.count()
    elapsed = time.time() - t0
    res = {
        "what": "pmi", "n_docs": n_docs, "num_cpus": num_cpus,
        "object_store_mb": store_mb, "elapsed_sec": round(elapsed, 2),
        "docs_per_sec": round(n_docs / elapsed), "n_pairs": n_pairs,
        "spilled_mib": _spilled_mib(),
        "driver_peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024),
    }
    ray.shutdown()
    return res


def probe_flagship(sf: float, num_cpus: int, store_mb: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus,
             object_store_memory=store_mb * 1024 * 1024,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from illumio_ray.pipelines.flagship import run_flagship
    from illumio_ray.synth import ensure_pages_for_sf, rows_for_sf

    info = ensure_pages_for_sf(sf, base="/tmp/illumio_ray_testdata")
    out_dir = f"/tmp/illumio_probe_flagship_{sf}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    m = run_flagship(info["pages_dir"], out_dir, info["lookup_lang"],
                     info["lookup_host"], num_shards=16)
    elapsed = time.time() - t0
    out = {
        "what": "flagship", "sf": sf, "rows": rows_for_sf(sf),
        "num_cpus": num_cpus, "object_store_mb": store_mb,
        "elapsed_sec": round(elapsed, 2),
        "docs_per_sec": round(m["rows_routed"] / elapsed),
        "rows_routed": m["rows_routed"],
        "spilled_mib": _spilled_mib(),
        "driver_peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024),
    }
    ray.shutdown()
    return out


def main() -> None:
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> → stack dump
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["curation", "flagship", "pmi"],
                    default="curation")
    ap.add_argument("--docs", type=int, default=250_000)
    ap.add_argument("--sf", type=float, default=4.0)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--store-mb", type=int, default=STORE_MB_DEFAULT)
    a = ap.parse_args()
    if a.what == "curation":
        out = probe_curation(a.docs, a.cpus, a.store_mb)
    elif a.what == "pmi":
        out = probe_pmi(a.docs, a.cpus, a.store_mb)
    else:
        out = probe_flagship(a.sf, a.cpus, a.store_mb)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
