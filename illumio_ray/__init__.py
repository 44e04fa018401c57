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

__version__ = "0.1.0"
