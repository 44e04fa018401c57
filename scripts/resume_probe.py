"""Live exactly-once resume probe: start the flagship in a subprocess,
kill -9 mid-run (after a configurable number of shard manifests commit),
rerun the same invocation, and verify with DuckDB — which shares no code
with the pipeline — that the final routed output has ZERO duplicate urls,
ZERO missing urls versus the independent `</body>`-presence expectation,
and no leftover `*.tmp` staging dirs.

This automates the manual probe in .claude/skills/verify/SKILL.md (the
test-suite versions in tests/test_resume.py cover the same contract
in-process; this one exercises a REAL os-level SIGKILL of a separate
driver process, the failure a cluster actually sees).

    python scripts/resume_probe.py                 # defaults below
    python scripts/resume_probe.py --rows 400000 --shards 32 --kill-at 4

Prints one JSON line with the verdict; exit code 0 iff exactly-once held.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_DRIVER = """
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from illumio_ray.synth import synth_pages
from illumio_ray.pipelines.flagship import run_flagship
info = synth_pages({in_dir!r}, rows={rows}, num_files={files})
print(run_flagship(info["pages_dir"], {out_dir!r}, info["lookup_lang"],
                   info["lookup_host"], num_shards={shards},
                   max_concurrent_shards={conc}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--concurrent", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--kill-at", type=int, default=4,
                    help="SIGKILL the driver once this many shard "
                         "manifests have committed")
    ap.add_argument("--work-dir", default=None)
    args = ap.parse_args()

    work = Path(args.work_dir or tempfile.mkdtemp(prefix="illumio_resume_"))
    in_dir, out_dir = str(work / "in"), str(work / "out")
    script = work / "driver.py"
    script.write_text(_DRIVER.format(
        cpus=args.cpus, in_dir=in_dir, rows=args.rows, files=args.files,
        out_dir=out_dir, shards=args.shards, conc=args.concurrent))
    env = {**os.environ, "PYTHONPATH": str(REPO)}
    manifests = Path(out_dir) / "manifests"

    # run 1: kill -9 once kill_at manifests exist
    p = subprocess.Popen([sys.executable, str(script)], env=env,
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    killed_at = None
    deadline = time.time() + 600
    while time.time() < deadline:
        if p.poll() is not None:  # finished before we could kill: still a
            break                 # valid (trivial) probe, flagged below
        n = len(list(manifests.glob("*"))) if manifests.is_dir() else 0
        if n >= args.kill_at:
            p.send_signal(signal.SIGKILL)
            p.wait()
            killed_at = n
            break
        time.sleep(0.2)
    subprocess.run(["ray", "stop", "--force"], capture_output=True)

    # run 2: same invocation resumes
    r2 = subprocess.run([sys.executable, str(script)], env=env,
                        capture_output=True, text=True, timeout=900)
    subprocess.run(["ray", "stop", "--force"], capture_output=True)

    import duckdb
    con = duckdb.connect()
    routed_glob = f"{out_dir}/routed/*/*/*.parquet"
    tot, uniq = con.sql(
        f"SELECT count(*), count(DISTINCT url) FROM "
        f"read_parquet('{routed_glob}', hive_partitioning=true)").fetchone()
    exp = con.sql(
        f"SELECT count(*) FROM read_parquet('{in_dir}/pages/*.parquet') "
        f"WHERE CAST(html AS VARCHAR) LIKE '%</body>%'").fetchone()[0]
    tmps = list(Path(out_dir).glob("routed/**/*.tmp*"))
    ok = (tot == uniq == exp) and not tmps and r2.returncode == 0
    print(json.dumps({
        "killed_at_manifests": killed_at,
        "shards_total": args.shards,
        "routed": tot, "distinct_urls": uniq, "expected": exp,
        "duplicates": tot - uniq, "missing": exp - tot,
        "tmp_dirs_left": len(tmps),
        "resume_rc": r2.returncode,
        "exactly_once": ok,
    }))
    if args.work_dir is None:
        shutil.rmtree(work, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
