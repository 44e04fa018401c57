"""Syslog/TCP sink stage + token-bucket rate limiter.

≙ the reference's SIEM delivery path: ``send_to_siem`` (TCP ``sendall`` with
newline framing, lazy connect, reconnect-on-error — app/log_processor.py:
242-276, socket setup 117-127) and the ``TokenBucket`` throughput ceiling
(app/log_processor.py:33-51, consumed per message at :178). The reference
drains a durable SQLite queue through one socket; here the sink is a Ray
Data actor-pool stage — each actor owns one connection, batches stream
through with backpressure, and the stage emits per-batch delivery counts
(≙ HealthReporter's syslog_messages_sent counter).

Parquet remains the correctness sink (deliveries aren't replayable —
exactly-once is the manifest commit's job); this stage exists for delivery
parity and is exercised against a local TCP server in tests.
"""

from __future__ import annotations

import socket
import time

import pyarrow as pa


class TokenBucket:
    """Token bucket: capacity ``rate`` tokens, refilled at ``rate``/s.
    ``consume(n)`` blocks until n tokens are available (the reference
    busy-waits per message; we sleep the exact deficit)."""

    def __init__(self, rate: float, capacity: float | None = None):
        self.rate = float(rate)
        self.capacity = float(capacity if capacity is not None else rate)
        self.tokens = self.capacity
        self.last = time.monotonic()

    def _refill(self) -> None:
        now = time.monotonic()
        self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
        self.last = now

    def consume(self, n: float = 1.0) -> None:
        while True:
            self._refill()
            if self.tokens >= n:
                self.tokens -= n
                return
            time.sleep(max((n - self.tokens) / self.rate, 0.001))


class SyslogSinkStage:
    """Actor-pool map_batches stage: wire column → TCP lines / UDP datagrams.

    ``proto="tcp"`` (default): lazy connect on first use, reconnect-per-line
    on error (≙ reference reconnect logic, app/log_processor.py:117-127).
    ``proto="udp"``: one connectionless socket, one datagram per message, no
    newline framing (≙ ``sendto``, app/log_processor.py:265-267).
    Optional TokenBucket ceiling. Emits one summary row per batch:
    (n_sent,). Use ``concurrency=N`` for N parallel connections; set
    ``max_per_second`` to rate-limit EACH connection (the reference's
    MAX_MESSAGES_PER_SECOND is per process).

    Envelope parity note: the reference prepends a per-send syslog header
    '<timestamp> <local-ip> <USER:NOTE> ' before each wire line
    (app/log_processor.py:242-276). That header is wall-clock- and
    host-dependent — non-deterministic by construction — so it is OFF by
    default here (the wire column itself is the byte-identity surface);
    pass ``envelope="..."`` (a prefix string, e.g. built from
    time.strftime + local ip) to opt into reference-style framing."""

    def __init__(self, host: str, port: int, wire_col: str = "wire",
                 max_per_second: float | None = None,
                 connect_timeout: float = 5.0, proto: str = "tcp",
                 envelope: str | None = None):
        if proto not in ("tcp", "udp"):
            raise ValueError(f"proto must be 'tcp' or 'udp', got {proto!r}")
        self.addr = (host, port)
        self.wire_col = wire_col
        self.bucket = TokenBucket(max_per_second) if max_per_second else None
        self.connect_timeout = connect_timeout
        self.proto = proto
        self.envelope = (envelope or "").encode("utf-8")
        self.sock: socket.socket | None = None

    def _connect(self) -> socket.socket:
        if self.sock is None:
            if self.proto == "udp":
                self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            else:
                s = socket.create_connection(self.addr,
                                             timeout=self.connect_timeout)
                s.settimeout(None)
                self.sock = s
        return self.sock

    def _send_line(self, line: bytes, retries: int = 3) -> None:
        for attempt in range(retries):
            try:
                if self.proto == "udp":
                    self._connect().sendto(line, self.addr)
                else:
                    self._connect().sendall(line + b"\n")
                return
            except OSError:
                if self.sock is not None:
                    try:
                        self.sock.close()
                    except OSError:
                        pass
                    self.sock = None
                if attempt == retries - 1:
                    raise
                time.sleep(0.05 * (2 ** attempt))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = 0
        for wire in batch[self.wire_col].to_pylist():
            if wire is None:
                continue
            if self.bucket is not None:
                self.bucket.consume()
            self._send_line(self.envelope + wire.encode("utf-8"))
            n += 1
        return pa.table({"n_sent": pa.array([n], pa.int64())})

    def __del__(self):
        if self.sock is not None:
            try:
                self.sock.close()
            except OSError:
                pass


def send_to_syslog(routed_ds, host: str, port: int, wire_col: str = "wire",
                   concurrency: int | tuple = 1,
                   max_per_second: float | None = None,
                   proto: str = "tcp", envelope: str | None = None) -> int:
    """Drive a routed dataset through the syslog sink; returns messages sent.

    The per-row send loop is inherent to the wire protocol (one framed line
    per message over one ordered connection) — this is a delivery boundary,
    not a transform; everything upstream stays vectorized."""
    counts = routed_ds.map_batches(
        SyslogSinkStage,
        fn_constructor_kwargs={"host": host, "port": port,
                               "wire_col": wire_col,
                               "max_per_second": max_per_second,
                               "proto": proto, "envelope": envelope},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=0.5,
    )
    total = 0
    for b in counts.iter_batches(batch_format="pyarrow"):
        col = b["n_sent"]
        total += sum(col.to_pylist())
    return total
