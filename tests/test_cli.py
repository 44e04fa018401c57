"""CLI surface: invalidate→reprocess cycle and the --watch poll loop
(≙ the reference's state.json re-ingest edits and its poll-loop daemon,
app/main.py:339-384)."""

import json

import pyarrow.dataset as pads

from illumio_ray.cli import main
from illumio_ray.state import lineage
from illumio_ray.synth import synth_pages


def _routed_urls(out):
    t = pads.dataset(str(out / "routed"), partitioning="hive").to_table(
        columns=["url"])
    return t["url"].to_pylist()


def test_invalidate_then_run_reprocesses_exactly_once(tmp_path, capsys):
    info = synth_pages(tmp_path / "in", rows=600, num_files=4)
    out = tmp_path / "out"
    args = ["run", "--pages-dir", str(info["pages_dir"]),
            "--lang", info["lookup_lang"], "--host", info["lookup_host"],
            "--out", str(out), "--num-shards", "4"]
    assert main(args) == 0
    capsys.readouterr()  # drain the first run's metrics JSON
    baseline = sorted(_routed_urls(out))

    assert main(["invalidate", "--out", str(out), "--shard", "1", "3"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["removed_shards"] == [1, 3]
    assert len(lineage.load_manifests(out)) == 2

    assert main(args) == 0
    m = json.loads(capsys.readouterr().out)
    assert m["shards_run_this_invocation"] == 2  # only the invalidated two
    urls = _routed_urls(out)
    assert len(urls) == len(set(urls))
    assert sorted(urls) == baseline


def test_cli_flag_beats_config_file(tmp_path, capsys):
    """Real precedence check through cmd_run: explicit --num-shards beats
    the config file's value; without the flag the config value applies."""
    info = synth_pages(tmp_path / "in", rows=300, num_files=8)
    cfgp = tmp_path / "settings.ini"
    cfgp.write_text("[Processing]\nnum_shards = 8\n")
    common = ["run", "--pages-dir", str(info["pages_dir"]),
              "--lang", info["lookup_lang"], "--host", info["lookup_host"],
              "--config", str(cfgp)]

    assert main(common + ["--out", str(tmp_path / "o1"),
                          "--num-shards", "2"]) == 0
    m1 = json.loads(capsys.readouterr().out)
    assert m1["shards_total"] == 2  # flag wins

    assert main(common + ["--out", str(tmp_path / "o2")]) == 0
    m2 = json.loads(capsys.readouterr().out)
    assert m2["shards_total"] == 8  # config applies when flag absent


def test_watch_requires_incremental(tmp_path):
    import pytest

    info = synth_pages(tmp_path / "in", rows=100, num_files=1)
    with pytest.raises(SystemExit, match="watch requires"):
        main(["run", "--watch", "--pages-dir", str(info["pages_dir"]),
              "--lang", info["lookup_lang"], "--host", info["lookup_host"],
              "--out", str(tmp_path / "out")])


def test_cli_subprocess_job_submit_surface(tmp_path):
    """The `ray job submit -- python -m illumio_ray run …` surface, driven
    for real: a FRESH process (own Ray session, no pytest fixtures) runs
    synth → run → stats end-to-end and the reports agree."""
    import subprocess
    import sys

    out = tmp_path / "run1"
    r = subprocess.run(
        [sys.executable, "-m", "illumio_ray", "synth",
         "--out", str(tmp_path / "d"), "--rows", "500", "--num-files", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout)

    r = subprocess.run(
        [sys.executable, "-m", "illumio_ray", "run",
         "--pages-dir", info["pages_dir"],
         "--lang", info["lookup_lang"], "--host", info["lookup_host"],
         "--out", str(out), "--num-shards", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads(r.stdout[r.stdout.index("{"):])
    assert metrics["rows_routed"] > 0

    r = subprocess.run(
        [sys.executable, "-m", "illumio_ray", "stats", "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout)
    assert report["rows_routed"] == metrics["rows_routed"]
    assert report["shards_committed"] == 2


def test_watch_poll_loop_second_poll_is_noop(tmp_path, capsys):
    info = synth_pages(tmp_path / "in", rows=400, num_files=4)
    out = tmp_path / "out"
    args = ["run", "--incremental", "--watch", "--max-polls", "2",
            "--poll-interval", "0.05",
            "--pages-dir", str(info["pages_dir"]),
            "--lang", info["lookup_lang"], "--host", info["lookup_host"],
            "--out", str(out)]
    assert main(args) == 0
    m = json.loads(capsys.readouterr().out)
    assert m["poll"] == 1                       # second iteration reported
    assert m["shards_run_this_invocation"] == 0  # no new fragments → no-op
    assert m["rows_routed"] > 0                  # first poll's rows persist


def test_cli_query_list_and_run(tmp_path, capsys):
    assert main(["query", "--list"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert any(ln.startswith("q6_revenue\toracle") for ln in lines)
    assert len(lines) > 100

    assert main(["query", "q6_revenue",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert '"rows": 1' in out

    assert main(["query", "no_such_query"]) == 2


def test_run_log_rotation_and_json_lines(tmp_path):
    """Rotating JSON run log (≙ reference app/logger_config.py): events
    are one JSON object per line, the file rotates at max_bytes, and a
    second setup call adds no duplicate handler."""
    import json
    import logging

    from illumio_ray.state.runlog import (RUN_LOGGER_NAME, LOG_FILE,
                                          setup_run_logging)

    log_dir = tmp_path / "logs"
    lg = setup_run_logging(log_dir, max_bytes=600, backup_count=2)
    lg2 = setup_run_logging(log_dir, max_bytes=600, backup_count=2)
    assert lg is lg2
    file_handlers = [h for h in lg.handlers
                     if not isinstance(h, logging.NullHandler)]
    assert len(file_handlers) == 1  # idempotent setup

    for i in range(30):
        lg.info("shard %d committed", i,
                extra={"event": "shard_commit", "shard_id": i, "rows": 10})
    main = log_dir / LOG_FILE
    assert main.exists()
    assert (log_dir / (LOG_FILE + ".1")).exists()  # rotated
    for line in main.read_text().splitlines():
        rec = json.loads(line)
        assert rec["name"] == RUN_LOGGER_NAME
        assert rec["event"] == "shard_commit"
        assert isinstance(rec["shard_id"], int) and rec["rows"] == 10
    # detach so later tests' flagship runs don't write into tmp_path
    for h in file_handlers:
        lg.removeHandler(h)
        h.close()


def test_run_cli_writes_run_log(tmp_path):
    """run --log-dir emits shard_commit + aggregate_written events."""
    import json

    from illumio_ray import cli as cli_mod

    info = synth_pages(tmp_path / "in", rows=300, num_files=4)
    out = tmp_path / "out"
    logs = tmp_path / "logs"
    rc = cli_mod.main([
        "run", "--pages-dir", str(info["pages_dir"]),
        "--lang", info["lookup_lang"],
        "--host", info["lookup_host"],
        "--out", str(out), "--num-shards", "2", "--log-dir", str(logs),
    ])
    assert rc == 0
    recs = [json.loads(l) for l in
            (logs / "app.json").read_text().splitlines()]
    events = [r["event"] for r in recs if "event" in r]
    assert events.count("shard_commit") == 2
    assert "aggregate_written" in events
    # stats --log-dir surfaces the event tail
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cli_mod.main(["stats", "--out", str(out),
                             "--log-dir", str(logs)]) == 0
    report = json.loads(buf.getvalue())
    tail_events = [r.get("event") for r in report["run_log_tail"]]
    assert "aggregate_written" in tail_events
    import logging

    from illumio_ray.state.runlog import get_run_logger
    lg = get_run_logger()
    for h in [h for h in lg.handlers
              if not isinstance(h, logging.NullHandler)]:
        lg.removeHandler(h)
        h.close()


def test_export_cli_shards_and_manifest(tmp_path, capsys):
    """`export` subcommand: packed shard files + manifest from a kept-docs
    parquet; stats JSON printed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array(np.arange(120, dtype=np.int64)),
        "text": pa.array([f"d{i}" for i in range(120)]),
        "n_tokens": pa.array((np.arange(120) % 60 + 1).astype(np.int64)),
    })
    src = tmp_path / "kept.parquet"
    pq.write_table(docs, str(src))
    out = tmp_path / "shards"
    assert main(["export", "--docs", str(src), "--out", str(out),
                 "--num-shards", "2", "--pack-budget", "64"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert sum(s["n_docs"] for s in rep["shards"]) == 120
    assert (out / "_manifest.json").exists()
    got = pads.dataset(
        [str(out / f"shard-{i:05d}.parquet") for i in range(2)]
    ).to_table()
    assert sorted(got["doc_id"].to_pylist()) == list(range(120))


def test_ingest_warc_then_run_flagship(tmp_path, capsys):
    """Crawl-archive loop: pages → write_warc → `ingest` (utf8-gate, body
    extract, constant lang) → canonical pages parquet → `run` routes the
    staged corpus exactly once. text equals the body extract byte-for-byte
    (the flagship's own byte-identity invariant downstream)."""
    import glob

    import pyarrow.parquet as pq

    from illumio_ray.sources.warc import write_warc

    info = synth_pages(tmp_path / "in", rows=400, num_files=2)
    wdir = tmp_path / "warc"
    wdir.mkdir()
    for i, fp in enumerate(sorted(glob.glob(info["pages_dir"]
                                            + "/*.parquet"))):
        t = pq.read_table(fp, columns=["url", "warc_ts", "html"])
        write_warc(t, wdir / f"p{i}.warc.gz")

    staged = tmp_path / "staged"
    assert main(["ingest", "--warc-dir", str(wdir), "--out", str(staged),
                 "--no-lang-id", "--default-lang", "xx"]) == 0
    rep = json.loads(capsys.readouterr().out)

    import duckdb
    con = duckdb.connect()
    n_body = con.execute(
        f"SELECT count(*) FROM read_parquet('{info['pages_dir']}/*.parquet')"
        " WHERE regexp_matches(decode(html), '<body>.*?</body>')"
    ).fetchone()[0]
    assert rep["rows_written"] == n_body
    sp = f"{staged}/pages/*.parquet"
    bad = con.execute(
        f"SELECT count(*) FROM read_parquet('{sp}') WHERE lang != 'xx' OR "
        "text IS DISTINCT FROM "
        "regexp_extract(decode(html), '<body>(.*?)</body>', 1)"
    ).fetchone()[0]
    assert bad == 0

    out = tmp_path / "out"
    assert main(["run", "--pages-dir", rep["pages_dir"],
                 "--lang", info["lookup_lang"], "--host", info["lookup_host"],
                 "--out", str(out), "--num-shards", "2"]) == 0
    m = json.loads(capsys.readouterr().out)
    assert m["rows_routed"] == n_body
    urls = _routed_urls(out)
    assert len(urls) == len(set(urls)) == n_body


def test_ingest_jsonl_stages_canonical_pages(tmp_path, capsys):
    """`ingest --format jsonl` stages a gzipped-JSONL crawl drop (the
    reference's wire-in format) into canonical pages parquet, keeping the
    drop-invalid-line policy."""
    import base64
    import gzip as _gz

    rows = [
        {"url": "https://a/1", "warc_ts": "2024-10-01T00:00:01",
         "html": base64.b64encode(b"<body>hi</body>").decode(),
         "text": "hi", "lang": "en"},
        {"url": "https://a/2", "warc_ts": 1727740800000000,
         "html": base64.b64encode(b"<body>yo</body>").decode(),
         "text": "yo", "lang": "de"},
    ]
    src = tmp_path / "drop"
    src.mkdir()
    with _gz.open(src / "pages.jsonl.gz", "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("{broken\n")  # malformed -> dropped, not fatal
    staged = tmp_path / "staged"
    assert main(["ingest", "--format", "jsonl", "--warc-dir", str(src),
                 "--out", str(staged)]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["rows_written"] == 2

    import duckdb
    got = duckdb.connect().execute(
        f"SELECT url, lang, decode(html) FROM "
        f"read_parquet('{staged}/pages/*.parquet') ORDER BY url"
    ).fetchall()
    assert got == [("https://a/1", "en", "<body>hi</body>"),
                   ("https://a/2", "de", "<body>yo</body>")]

    # rerun guard: staging next to existing parts would double-stage
    assert main(["ingest", "--format", "jsonl", "--warc-dir", str(src),
                 "--out", str(staged)]) == 1
    capsys.readouterr()
