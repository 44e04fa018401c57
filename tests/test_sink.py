"""Syslog sink stage (S4) + token bucket (T3) against a local TCP server."""

import socketserver
import threading
import time

import pandas as pd
import ray.data as rd

from illumio_ray.stages.sink import SyslogSinkStage, TokenBucket, send_to_syslog


class _Collector(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        self.lines = []
        self.lock = threading.Lock()
        outer = self

        class H(socketserver.StreamRequestHandler):
            def handle(self):
                for raw in self.rfile:
                    with outer.lock:
                        outer.lines.append(raw.rstrip(b"\n").decode())

        super().__init__(("127.0.0.1", 0), H)


def test_syslog_sink_delivers_all_lines():
    srv = _Collector()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        wires = [f"beatname=webbeat|msg={i}" for i in range(200)]
        ds = rd.from_pandas(pd.DataFrame({"wire": wires}))
        sent = send_to_syslog(ds, "127.0.0.1", srv.server_address[1],
                              concurrency=2)
        assert sent == 200
        deadline = time.time() + 5
        while time.time() < deadline:
            with srv.lock:
                if len(srv.lines) == 200:
                    break
            time.sleep(0.05)
        with srv.lock:
            assert sorted(srv.lines) == sorted(wires)
    finally:
        srv.shutdown()
        srv.server_close()


def test_syslog_sink_udp_datagrams_and_envelope():
    """UDP variant (≙ reference sendto, app/log_processor.py:265-267): one
    datagram per message, no newline framing; optional envelope prefix."""
    import socket

    import pyarrow as pa

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(5)
    port = rx.getsockname()[1]
    try:
        stage = SyslogSinkStage("127.0.0.1", port, proto="udp",
                                envelope="Jan 01 00:00:00 10.0.0.1 USER:NOTE ")
        out = stage(pa.table({"wire": ["m1", "m2", None]}))
        assert out["n_sent"].to_pylist() == [2]
        got = sorted(rx.recvfrom(65535)[0].decode() for _ in range(2))
        assert got == ["Jan 01 00:00:00 10.0.0.1 USER:NOTE m1",
                       "Jan 01 00:00:00 10.0.0.1 USER:NOTE m2"]
    finally:
        rx.close()


def test_token_bucket_caps_rate():
    b = TokenBucket(rate=100, capacity=10)
    t0 = time.monotonic()
    for _ in range(60):
        b.consume()
    elapsed = time.monotonic() - t0
    # 60 msgs with 10 burst at 100/s -> >= ~0.5s
    assert elapsed >= 0.4


def test_sink_reconnects_after_server_restart():
    srv = _Collector()
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    stage = SyslogSinkStage("127.0.0.1", port)
    import pyarrow as pa
    stage(pa.table({"wire": ["a", "b"]}))
    # kill the server, restart on the same port -> stage must reconnect
    srv.shutdown(); srv.server_close()
    time.sleep(0.1)
    srv2 = _Collector.__new__(_Collector)
    _Collector.__init__(srv2)  # new ephemeral port; emulate endpoint move
    # reconnect path: point the stage at the new server
    stage.addr = ("127.0.0.1", srv2.server_address[1])
    if stage.sock is not None:
        stage.sock.close()
    t2 = threading.Thread(target=srv2.serve_forever, daemon=True)
    t2.start()
    try:
        out = stage(pa.table({"wire": ["c", "d", None]}))
        assert out["n_sent"].to_pylist() == [2]
        deadline = time.time() + 5
        while time.time() < deadline:
            with srv2.lock:
                if len(srv2.lines) == 2:
                    break
            time.sleep(0.05)
        with srv2.lock:
            assert sorted(srv2.lines) == ["c", "d"]
    finally:
        srv2.shutdown(); srv2.server_close()
