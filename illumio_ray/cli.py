"""CLI entry point — the `ray job submit` surface.

≙ the reference's three entry points (SURVEY.md §3): `run` is app/main.py's
flagship flow as a batch job over a snapshot; `synth` replaces S3 fixtures;
`stats` is the s3_analyzer/db_stats-style report over a finished run's
manifests and aggregates.

Usage (local or via `ray job submit -- python -m illumio_ray run …`):

    python -m illumio_ray synth --out /tmp/pages --rows 100000
    python -m illumio_ray run --pages-dir /tmp/pages/pages \
        --lang /tmp/pages/lookup_lang.parquet \
        --host /tmp/pages/lookup_host.parquet \
        --out /tmp/run1 --num-shards 16
    python -m illumio_ray stats --out /tmp/run1

Owns its Ray session (guarded init — the driver-contract modules never call
ray.init; scripts do).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _ray_init() -> None:
    import os

    import ray

    # before init: local-mode workers inherit the driver env (polars
    # thread-pool cap must hold even when Ray imports polars first)
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)


def cmd_synth(args) -> int:
    from .synth import synth_pages

    info = synth_pages(args.out, rows=args.rows, num_files=args.num_files,
                       seed=args.seed)
    print(json.dumps(info, indent=1))
    return 0


def cmd_ingest(args) -> int:
    """Crawl archive (WARC, or JSONL via --format jsonl) → canonical
    pages parquet staging.

    The real upstream of the flagship's `url, warc_ts, html` input is a
    crawl archive; this converts `.warc.gz` (or plain `.warc`) response
    records into the canonical pages schema in ONE distributed streaming
    pass: utf8-validate the payload, extract the body text (same BODY_RE
    the flagship routes on), language-ID it (heuristic n-gram stage, or
    a constant with --no-lang-id), and write hive-free parquet parts the
    `run` shard planner can footer-count. Drop-invalid policy matches
    the jsonl source: a bad record drops the record, never the file."""
    _ray_init()
    import pyarrow as pa
    import pyarrow.compute as pc

    from .ops.textops import add_lang_id
    from .schema import BODY_RE, PAGES_SCHEMA
    from .sources.warc import read_warc

    if args.format == "jsonl":
        # jsonl already carries the full canonical schema (incl. text and
        # lang) — stage it as-is, same drop-invalid-line policy
        from .sources.jsonl import read_pages_jsonl

        ds = read_pages_jsonl(args.warc_dir,
                              html_encoding=args.html_encoding)
        return _stage_pages(ds, args.out)

    def to_pages(t: pa.Table) -> pa.Table:
        try:
            html_s = pc.cast(t["html"], pa.string())
        except pa.ArrowInvalid:
            # rare path: batch has non-utf8 payloads — keep only rows
            # that decode (vectorized bulk stays Arrow)
            ok = [i for i, v in enumerate(t["html"].to_pylist())
                  if v is not None and _utf8_ok(v)]
            t = t.take(pa.array(ok, pa.int64()))
            html_s = pc.cast(t["html"], pa.string())
        body = pc.struct_field(
            pc.extract_regex(html_s, BODY_RE), "extracted_text")
        keep = pc.is_valid(body)
        t = pa.table({
            "url": t["url"], "warc_ts": t["warc_ts"], "html": t["html"],
            "text": body,
        }).filter(keep)
        return t

    ds = read_warc(args.warc_dir).map_batches(
        to_pages, batch_format="pyarrow", zero_copy_batch=True)
    if args.no_lang_id:
        ds = ds.map_batches(
            lambda t: t.append_column(
                "lang", pa.array([args.default_lang] * t.num_rows)),
            batch_format="pyarrow", zero_copy_batch=True)
    else:
        ds = add_lang_id(ds).map_batches(
            lambda t: pa.table(
                {**{n: t[n] for n in ("url", "warc_ts", "html", "text")},
                 "lang": t["lang_pred"]}),
            batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(lambda t: t.select(PAGES_SCHEMA.names)
                        .cast(PAGES_SCHEMA),
                        batch_format="pyarrow", zero_copy_batch=True)
    return _stage_pages(ds, args.out)


def _stage_pages(ds, out_dir: str) -> int:
    """Write the staged pages parquet and report. REFUSES a non-empty
    target: write_parquet appends uniquely-named files, so re-running
    into stale parts would silently double-stage every page for the
    downstream `run`."""
    out = Path(out_dir) / "pages"
    stale = sorted(out.glob("*.parquet")) if out.exists() else []
    if stale:
        print(f"error: {out} already holds {len(stale)} parquet part(s); "
              "remove them or choose a fresh --out (re-ingesting next to "
              "stale parts would duplicate pages downstream)",
              file=sys.stderr)
        return 1
    ds.write_parquet(str(out))
    import pyarrow.parquet as pq
    n = sum(pq.ParquetFile(str(f)).metadata.num_rows
            for f in out.glob("*.parquet"))
    print(json.dumps({"pages_dir": str(out), "rows_written": n}))
    return 0


def _utf8_ok(b: bytes) -> bool:
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


def cmd_run(args) -> int:
    # config file + env fill any flag the user left unset (precedence:
    # flag > ILLUMIO_RAY_* env > ini > default — ≙ reference app/config.py)
    from .config import load_settings

    cfg = load_settings(args.config)
    num_shards = args.num_shards if args.num_shards is not None else cfg.num_shards
    max_conc = (args.max_concurrent_shards
                if args.max_concurrent_shards is not None
                else cfg.max_concurrent_shards)
    frags = (args.fragments_per_shard if args.fragments_per_shard is not None
             else cfg.fragments_per_shard)
    enrich_mode = args.enrich_mode or cfg.enrich_mode
    max_mps = args.max_mps if args.max_mps is not None else (
        cfg.max_messages_per_second or None)
    siem = args.siem or (f"{cfg.sma_host}:{cfg.sma_port}" if cfg.sma_host else None)

    # rotating JSON run log (≙ reference app/logger_config.py): opt-in via
    # --log-dir flag or [Logging] log_folder / ILLUMIO_RAY_LOGGING_* env
    log_dir = args.log_dir or cfg.log_folder
    if log_dir:
        from .state.runlog import setup_run_logging
        setup_run_logging(log_dir, level=cfg.log_level,
                          max_bytes=cfg.max_log_size,
                          backup_count=cfg.backup_count)

    if args.watch and not args.incremental:
        raise SystemExit("--watch requires --incremental (the poll loop "
                         "re-plans new fragments; a full run has no "
                         "polling semantics)")

    # validate delivery endpoint BEFORE running the pipeline — a malformed
    # --siem must not discard a completed run's metrics
    siem_addr = None
    if siem:
        host, sep, port = siem.rpartition(":")
        if not sep or not port.isdigit() or not host:
            raise SystemExit(
                f"--siem expects HOST:PORT, got {siem!r}")
        siem_addr = (host, int(port))

    import ray

    owns_session = not ray.is_initialized()
    _ray_init()
    from .pipelines.flagship import run_flagship, run_incremental

    window = tuple(args.window.split("/")) if args.window else None
    if args.incremental:
        # --watch: the reference's poll-loop daemon (app/main.py:339-384 —
        # list → anti-join vs processed keys → process new → sleep).
        # Each iteration is itself an exactly-once incremental run, so a
        # kill between (or during) polls loses nothing.
        polls = max(1, args.max_polls) if args.watch else 1
        interval = (args.poll_interval if args.poll_interval is not None
                    else float(cfg.poll_interval))
        metrics = None
        for i in range(polls):
            m = run_incremental(
                args.pages_dir, args.out, args.lang, args.host,
                fragments_per_shard=frags,
                max_concurrent_shards=max_conc,
                enrich_mode=enrich_mode, time_window=window)
            m["poll"] = i
            metrics = m
            if args.watch and i < polls - 1:
                import time as _time

                _time.sleep(interval)
    else:
        metrics = run_flagship(
            args.pages_dir, args.out, args.lang, args.host,
            num_shards=num_shards, resume=not args.no_resume,
            max_concurrent_shards=max_conc,
            enrich_mode=enrich_mode)
    if siem_addr:
        # Optional delivery leg (≙ reference send_to_siem): stream committed
        # wire messages to a TCP endpoint after the parquet sink commits.
        import ray.data as rd

        from .stages.sink import send_to_syslog

        routed = rd.read_parquet(str(Path(args.out) / "routed"),
                                 columns=["wire"])
        metrics["siem_messages_sent"] = send_to_syslog(
            routed, siem_addr[0], siem_addr[1], max_per_second=max_mps,
            proto=cfg.siem_proto)

    print(json.dumps(metrics, indent=1))
    if owns_session:  # never tear down a session the caller owns
        ray.shutdown()
    return 0


def cmd_query(args) -> int:
    """Run any registry query over an sf dir — the registry as a tool,
    not just a driver contract."""
    import ray

    owns_session = not ray.is_initialized()
    _ray_init()
    from .pipelines.queries import REGISTRY

    if args.list or not args.name:
        for n, spec in REGISTRY.items():
            kind = "oracle" if spec.sql else "rows-only"
            print(f"{n}\t{kind}")
        if owns_session:
            ray.shutdown()
        return 0
    if args.name not in REGISTRY:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    res = REGISTRY[args.name].fn(args.sf_dir)
    if hasattr(res, "to_pandas"):  # Dataset / pyarrow Table
        if args.out and hasattr(res, "write_parquet"):
            res.write_parquet(args.out)
            n = res.count()
        else:
            df = res.to_pandas()
            n = len(df)
            print(df.head(args.head).to_string())
            if args.out:
                df.to_parquet(Path(args.out) / f"{args.name}.parquet"
                              if Path(args.out).is_dir() else args.out)
    else:  # pandas DataFrame
        n = len(res)
        print(res.head(args.head).to_string())
        if args.out:
            res.to_parquet(args.out)
    print(json.dumps({"query": args.name, "rows": int(n)}))
    if owns_session:
        ray.shutdown()
    return 0


def cmd_stats(args) -> int:
    """Per-sink / per-shard report over a finished run (≙ db_stats +
    health_reporter report surfaces)."""
    from pathlib import Path

    import pyarrow.dataset as pads

    from .state import lineage

    out = Path(args.out)
    manifests = lineage.load_manifests(out)
    total = sum(m["row_count"] for m in manifests.values())
    report = {
        "shards_committed": len(manifests),
        "rows_routed": total,
        "rows_dropped": sum(m.get("rows_dropped") or 0 for m in manifests.values()),
        "per_shard": {sid: m["row_count"] for sid, m in sorted(manifests.items())},
    }
    # live-run signal: the in-run heartbeat (state/heartbeat.py) — lets
    # `stats` answer "is it still moving?" against a RUNNING out dir
    hb_path = out / "_heartbeat.json"
    if hb_path.exists():
        report["heartbeat"] = json.loads(hb_path.read_text())
    agg_dir = out / "aggregates"
    if agg_dir.exists():
        agg = pads.dataset(str(agg_dir)).to_table()
        per_sink: dict[str, int] = {}
        for sink, n in zip(agg["sink"].to_pylist(), agg["n_docs"].to_pylist()):
            per_sink[sink] = per_sink.get(sink, 0) + int(n)
        report["per_sink_docs"] = per_sink
        report["aggregate_groups"] = agg.num_rows
    # run-event tail from the rotating JSON log, when one was configured
    # (≙ the reference operator tailing logs/app.json)
    if args.log_dir and args.log_tail > 0:
        log_file = Path(args.log_dir) / "app.json"
        if log_file.exists():
            lines = log_file.read_text().splitlines()[-args.log_tail:]
            report["run_log_tail"] = [json.loads(l) for l in lines]
    print(json.dumps(report, indent=1))
    return 0


def cmd_invalidate(args) -> int:
    """Invalidate committed shards for reprocessing (≙ editing the
    reference's state.json to re-ingest files). Removal order is the
    commit order reversed (manifest → sidecar → data), so a crash
    mid-invalidate can leave orphan data (swept on next run) but never a
    manifest claiming missing data. The next `run` reprocesses exactly the
    invalidated shards; the next `run --incremental` re-covers their
    fragments under fresh shard ids."""
    from .state import lineage

    out = Path(args.out)
    before = lineage.load_manifests(out)
    removed = []
    for sid in args.shard:
        if sid in before:
            lineage.remove_shard(out, sid)
            removed.append(sid)
    print(json.dumps({
        "removed_shards": removed,
        "not_found": [s for s in args.shard if s not in before],
        "shards_remaining": len(before) - len(removed),
    }, indent=1))
    return 0


def cmd_curate(args) -> int:
    import ray

    owns_session = not ray.is_initialized()
    _ray_init()
    import ray.data as rd

    from .pipelines.curation import curate

    docs = rd.read_parquet(args.docs)
    langs = args.langs.split(",") if args.langs else None
    out = Path(args.out)
    # exact input rows from parquet footers only (no scan) — curate()
    # would otherwise pay a full extra pass just for the funnel report
    import pyarrow.dataset as pads
    n_input = pads.dataset(args.docs).count_rows()
    kept, report = curate(docs, min_tokens=args.min_tokens,
                          max_stop_ratio=args.max_stop_ratio, langs=langs,
                          near_dup_threshold=args.near_dup_threshold,
                          spill_dir=str(out / "_spill"),
                          max_lm_nll=args.max_lm_nll,
                          segment_dedup=args.segment_dedup,
                          dup_span_removal=args.dup_span_removal,
                          n_input=n_input)
    kept.write_parquet(str(out / "kept"))
    (out / "report.json").write_text(json.dumps(report, indent=1))
    import shutil

    shutil.rmtree(out / "_spill", ignore_errors=True)
    print(json.dumps(report, indent=1))
    if owns_session:  # never tear down a session the caller owns
        ray.shutdown()
    return 0


def cmd_export(args) -> int:
    import ray

    owns_session = not ray.is_initialized()
    _ray_init()
    import ray.data as rd

    from .pipelines.export import export_training_shards

    docs = rd.read_parquet(args.docs)
    stats = export_training_shards(docs, args.out,
                                   num_shards=args.num_shards,
                                   pack_budget=args.pack_budget)
    print(json.dumps({"out": str(args.out), "shards": stats}, indent=1))
    if owns_session:
        ray.shutdown()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="illumio_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth", help="generate deterministic pages input")
    sp.add_argument("--out", required=True)
    sp.add_argument("--rows", type=int, default=100_000)
    sp.add_argument("--num-files", type=int, default=None)
    sp.add_argument("--seed", type=int, default=42)
    sp.set_defaults(fn=cmd_synth)

    rp = sub.add_parser("run", help="run the flagship pipeline (resumable)")
    rp.add_argument("--pages-dir", required=True)
    rp.add_argument("--lang", required=True)
    rp.add_argument("--host", required=True)
    rp.add_argument("--out", required=True)
    rp.add_argument("--config", default=None, metavar="SETTINGS_INI",
                    help="settings.ini supplying defaults for the flags "
                         "below (see settings.example.ini; env overrides "
                         "via ILLUMIO_RAY_<SECTION>_<KEY>)")
    rp.add_argument("--num-shards", type=int, default=None)
    rp.add_argument("--max-concurrent-shards", type=int, default=None)
    rp.add_argument("--enrich-mode", choices=["task", "actor"], default=None)
    rp.add_argument("--no-resume", action="store_true")
    rp.add_argument("--incremental", action="store_true",
                    help="process only fragments not yet covered by a "
                         "committed manifest (poll-loop semantics)")
    rp.add_argument("--fragments-per-shard", type=int, default=None)
    rp.add_argument("--window", default=None,
                    help="warc_ts look-back window 'ISO_LO/ISO_HI' "
                         "(incremental mode)")
    rp.add_argument("--watch", action="store_true",
                    help="incremental poll loop (reference daemon mode): "
                         "re-plan and process new fragments every "
                         "--poll-interval seconds")
    rp.add_argument("--poll-interval", type=float, default=None,
                    help="seconds between polls (default: config "
                         "[Ingest] poll_interval)")
    rp.add_argument("--max-polls", type=int, default=1_000_000,
                    help="stop --watch after N polls (for bounded runs "
                         "and tests)")
    rp.add_argument("--siem", default=None, metavar="HOST:PORT",
                    help="after committing, stream wire messages to this "
                         "TCP endpoint (reference send_to_siem)")
    rp.add_argument("--log-dir", default=None, metavar="DIR",
                    help="rotating JSON run log folder (default: "
                         "[Logging] log_folder from --config / env; "
                         "empty disables)")
    rp.add_argument("--max-mps", type=float, default=None,
                    help="per-connection message rate ceiling for --siem")
    rp.set_defaults(fn=cmd_run)

    gp = sub.add_parser("ingest",
                        help="WARC crawl archive → canonical pages parquet")
    gp.add_argument("--warc-dir", required=True,
                    help="dir (or file) of crawl records (.warc.gz / .warc, "
                         "or .jsonl[.gz] with --format jsonl)")
    gp.add_argument("--out", required=True,
                    help="staging dir; pages parquet lands in OUT/pages/")
    gp.add_argument("--format", choices=["warc", "jsonl"], default="warc")
    gp.add_argument("--html-encoding", choices=["base64", "utf8"],
                    default="base64",
                    help="jsonl only: how the html field is encoded")
    gp.add_argument("--no-lang-id", action="store_true",
                    help="warc only: skip the heuristic language-ID stage "
                         "and stamp --default-lang instead")
    gp.add_argument("--default-lang", default="und")
    gp.set_defaults(fn=cmd_ingest)

    tp = sub.add_parser("stats", help="report over a finished run")
    tp.add_argument("--out", required=True)
    tp.add_argument("--log-dir", default=None, metavar="DIR",
                    help="include the last --log-tail events from DIR/"
                         "app.json (the rotating JSON run log)")
    tp.add_argument("--log-tail", type=int, default=10)
    tp.set_defaults(fn=cmd_stats)

    ip = sub.add_parser("invalidate", help="invalidate committed shards "
                        "for reprocessing (reverse-order removal)")
    ip.add_argument("--out", required=True)
    ip.add_argument("--shard", type=int, nargs="+", required=True)
    ip.set_defaults(fn=cmd_invalidate)

    qp = sub.add_parser("query", help="run a named registry query over an "
                        "sf dir (--list to enumerate)")
    qp.add_argument("name", nargs="?", default=None)
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--out", default=None, help="write result parquet here")
    qp.add_argument("--head", type=int, default=10)
    qp.add_argument("--list", action="store_true")
    qp.set_defaults(fn=cmd_query)

    cp = sub.add_parser("curate", help="training-data curation: quality "
                        "filter -> exact dedup -> near-dup removal")
    cp.add_argument("--docs", required=True, help="documents parquet path")
    cp.add_argument("--out", required=True)
    cp.add_argument("--min-tokens", type=int, default=5)
    cp.add_argument("--max-stop-ratio", type=float, default=0.6)
    cp.add_argument("--langs", default=None, help="comma-separated keep list")
    cp.add_argument("--near-dup-threshold", type=float, default=0.8)
    cp.add_argument("--max-lm-nll", type=float, default=None,
                    help="CCNet-style perplexity gate: drop docs whose "
                    "bigram-LM mean NLL exceeds this")
    cp.add_argument("--segment-dedup", action="store_true",
                    help="cross-document paragraph/segment dedup on the "
                    "kept docs (output becomes doc_id/clean_text)")
    cp.add_argument("--dup-span-removal", action="store_true",
                    help="ExactSubstr-style stride-1 duplicated-span "
                    "removal on the kept docs (keep-first, merged spans)")
    cp.set_defaults(fn=cmd_curate)

    xp = sub.add_parser("export", help="corpus export: shuffled, packed "
                        "training shards + manifest (resumable)")
    xp.add_argument("--docs", required=True,
                    help="kept-docs parquet (needs doc_id + n_tokens, "
                    "e.g. a curate run's kept/ dir)")
    xp.add_argument("--out", required=True)
    xp.add_argument("--num-shards", type=int, default=16)
    xp.add_argument("--pack-budget", type=int, default=2048,
                    help="max tokens per packed training sequence")
    xp.set_defaults(fn=cmd_export)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
