"""illumio_ray — a Ray-Data-native parse→enrich→route→aggregate engine.

A from-scratch rebuild of the semantics of the reference log pipeline
(paraserv/illumio: discover → download → parse → transform → route →
rate-limited sink → aggregate-count, with exactly-once file-level
checkpointing), re-expressed as idiomatic Ray Data over Common-Crawl-style
web-page Parquet tables (url, warc_ts, html, text, lang).

Layout:
    schema.py     — Arrow schemas for the pages input / routed output
    synth.py      — deterministic synthetic data generator (no external data)
    functions/    — vectorized scalar-function library (regex, text, hash, json)
    sources/      — readers (column-pruned parquet, fragment listing)
    stages/       — map_batches stages: parse/extract, enrich (actor pool), route
    pipelines/    — end-to-end flagship pipeline with lineage + resume
    state/        — per-partition lineage manifests (≙ reference state.json)
    ops/          — general operator library (relational, dedup, similarity, text)
"""

import os as _os

# Cap polars' per-process Rust thread pool BEFORE anything imports polars:
# hash64 is polars-backed, and 32 Ray workers each defaulting to one thread
# per CPU oversubscribes the box. Set at package import (earliest our code
# runs in drivers AND in Ray workers deserializing our UDFs); session
# owners (bench, CLI, conftest) also set it before ray.init so local-mode
# workers inherit it even when Ray's own sort path imports polars first.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

__version__ = "0.1.0"

# Ray Data's path resolution probes `from fsspec.implementations.http import
# HTTPFileSystem` on EVERY read/write. With aiohttp absent that import fails,
# is never cached (failed imports are retried), and two driver threads
# importing it concurrently race into a partially-initialized module and an
# uncaught ImportError. Register a stub module once so the probe always
# resolves (isinstance against the stub class is simply False).
def _stub_fsspec_http() -> None:
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # never instantiated; only isinstance-checked
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_stub_fsspec_http()
del _stub_fsspec_http
