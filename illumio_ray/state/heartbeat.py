"""In-run heartbeat reporter — the live health signal a long run emits
WHILE processing (≙ reference app/health_reporter.py:62-68,127-142, which
runs a reporter thread beside the worker loop), complementing the
post-run `_metrics.json` and the `stats` CLI.

A daemon thread writes `out_dir/_heartbeat.json` every ``interval_sec``
(atomic tmp→rename, same discipline as the lineage manifests): elapsed
wall time, shards committed / planned this invocation, rows routed so
far, and throughput. Progress is tracked at SHARD-COMMIT granularity —
the unit the resume protocol reasons in — so the heartbeat never claims
rows that a crash could take back. A final beat (``in_progress: false``,
``ok``) lands on both clean exit and exception; a SIGKILL leaves the last
periodic beat behind, which is exactly what an operator polls for."""

from __future__ import annotations

import json
import os
import threading
import time
from pathlib import Path

HEARTBEAT_FILE = "_heartbeat.json"


class Heartbeat:
    def __init__(self, out_dir: str | Path, shards_planned: int,
                 interval_sec: float = 10.0):
        self.out_dir = Path(out_dir)
        self.shards_planned = shards_planned
        self.interval = float(interval_sec)
        self._lock = threading.Lock()
        self._t0 = time.perf_counter()
        self._shards = 0
        self._rows = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="illumio-heartbeat")

    def shard_done(self, manifest: dict) -> None:
        with self._lock:
            self._shards += 1
            self._rows += int(manifest.get("row_count") or 0)

    def _write(self, in_progress: bool = True, ok: bool | None = None) -> None:
        elapsed = time.perf_counter() - self._t0
        with self._lock:
            snap = {
                "ts": time.time(),
                "pid": os.getpid(),
                "elapsed_sec": elapsed,
                "shards_committed": self._shards,
                "shards_planned": self.shards_planned,
                "rows_routed_committed": self._rows,
                "rows_per_sec": (self._rows / elapsed) if elapsed > 0 else 0.0,
                "in_progress": in_progress,
            }
        if ok is not None:
            snap["ok"] = ok
        tmp = self.out_dir / (HEARTBEAT_FILE + ".tmp")
        tmp.write_text(json.dumps(snap, indent=1))
        os.replace(tmp, self.out_dir / HEARTBEAT_FILE)

    def _loop(self) -> None:
        while not self._stop.wait(self.interval):
            self._write()

    def __enter__(self) -> "Heartbeat":
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self._write()
        self._thread.start()
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self._stop.set()
        self._thread.join(timeout=max(1.0, 2 * self.interval))
        self._write(in_progress=False, ok=exc_type is None)
