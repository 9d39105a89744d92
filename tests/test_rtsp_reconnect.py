"""Live-stream ingest fault tests: a socket-backed MJPEG server drops the
connection mid-stream; the producer must reconnect and resume publishing,
and the consumer must degrade gracefully meanwhile (VERDICT r4 item 6).

Parity target: the reference's production ingest was a live RTSP decoder per
camera (ruandata/TestRelease/GetFromRtsp.exe, spawn contract at 64-bit
stitching_detailed.cpp:785-793). No live RTSP source exists in this
environment, so the substitute is a local fault-injecting HTTP MJPEG server
(cv2/FFmpeg consumes multipart/x-mixed-replace exactly like an IP camera's
MJPEG endpoint); the failure class exercised — a TCP stream dying mid-frame
and coming back — is the same one. The reference consumer waits INFINITE on
a dead producer (stitching_sharemem.cpp:106); here the producer survives the
drop and the consumer's reads stay bounded either way.
"""
import socket
import subprocess
import sys
import threading
import time
import uuid

import numpy as np
import pytest

from stitchingvideo_tpu.video.sharemem import ShmRing
from stitchingvideo_tpu.video.sources import SharedMemorySource, producer_env

cv2 = pytest.importorskip("cv2")

H, W = 96, 128


def _jpeg(val: int) -> bytes:
    ok, buf = cv2.imencode(".jpg", np.full((H, W, 3), val, np.uint8))
    assert ok
    return buf.tobytes()


class MjpegFaultServer:
    """Serves solid-color MJPEG frames; connection k serves value
    `values[min(k, len-1)]` and DROPS (closes mid-stream) after
    `drop_after[min(k, len-1)]` frames (0 = never)."""

    def __init__(self, values, drop_after, fps: float = 60.0,
                 max_connections: int = 0):
        self.values = values
        self.drop_after = drop_after
        self.fps = fps
        self.max_connections = max_connections   # 0 = unlimited; after the
        # limit the listen socket closes, so reconnects are REFUSED
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.sock.listen(4)
        self.sock.settimeout(0.2)
        self.connections = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}/stream"

    def _serve(self):
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except socket.timeout:
                continue
            k = min(self.connections, len(self.values) - 1)
            self.connections += 1
            try:
                conn.settimeout(2.0)
                conn.recv(4096)
                conn.sendall(b"HTTP/1.0 200 OK\r\nContent-Type: "
                             b"multipart/x-mixed-replace; boundary=fb\r\n\r\n")
                jpg = _jpeg(self.values[k])
                i = 0
                while not self._stop.is_set():
                    if self.drop_after[k] and i >= self.drop_after[k]:
                        break                      # simulated network drop
                    conn.sendall(b"--fb\r\nContent-Type: image/jpeg\r\n"
                                 b"Content-Length: " +
                                 str(len(jpg)).encode() + b"\r\n\r\n" +
                                 jpg + b"\r\n")
                    i += 1
                    time.sleep(1.0 / self.fps)
            except OSError:
                pass
            finally:
                conn.close()
            if (self.max_connections
                    and self.connections >= self.max_connections):
                self.sock.close()     # further connects are refused
                return

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
        try:
            self.sock.close()
        except OSError:
            pass


def _spawn_producer(url: str, name: str, reconnect: int,
                    wait_s: float = 0.1) -> subprocess.Popen:
    argv = [sys.executable, "-m", "stitchingvideo_tpu.video.producer",
            url, name, "--reconnect", str(reconnect),
            "--reconnect-wait", str(wait_s)]
    return subprocess.Popen(argv, env=producer_env(),
                            stderr=subprocess.PIPE, text=True)


def _wait_ring(name: str, proc, deadline_s: float = 90.0) -> ShmRing:
    t0 = time.monotonic()
    while True:
        try:
            return ShmRing.open(name)
        except OSError:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"producer exited rc={proc.returncode}: "
                    f"{proc.stderr.read()[-500:]}")
            if time.monotonic() - t0 > deadline_s:
                raise
            time.sleep(0.05)


def _mean_val(frame: np.ndarray) -> float:
    return float(frame.mean())


def test_producer_reconnects_after_midstream_drop():
    """Phase-1 frames (gray 40) -> server drops the TCP connection ->
    producer reconnects -> phase-2 frames (gray 200). The consumer rides
    the gap on its stale-frame budget and sees both phases, untorn."""
    srv = MjpegFaultServer(values=[40, 200], drop_after=[8, 0])
    name = f"/rtsp_rc_{uuid.uuid4().hex[:8]}"
    p = _spawn_producer(srv.url, name, reconnect=20)
    src = None
    try:
        _wait_ring(name, p).close()
        # generous stale budget: reconnect backoff + FFmpeg open can take
        # seconds under suite load, and each stale read burns 1s of timeout
        src = SharedMemorySource([name], timeout_s=1.0, stale_reads=60)
        saw_phase1 = saw_phase2 = False
        t_end = time.monotonic() + 60.0
        while time.monotonic() < t_end:
            frames = src.read()
            assert frames is not None, \
                "consumer gave up before the producer reconnected"
            m = _mean_val(frames[0])
            # JPEG of a solid frame decodes within ~2 gray levels
            if abs(m - 40) < 15:
                saw_phase1 = True
            elif abs(m - 200) < 15:
                saw_phase2 = True
                break
            else:
                pytest.fail(f"unexpected frame mean {m} (torn/mixed?)")
        assert saw_phase1, "never saw a pre-drop frame"
        assert saw_phase2, "producer did not reconnect after the drop"
        assert srv.connections >= 2, "server never saw a reconnect"
    finally:
        p.kill()
        p.wait()
        if src is not None:
            src.close(unlink=True)
        srv.close()


def test_reconnect_budget_exhausted_exits_cleanly():
    """When the stream dies for good, the producer exits after its
    reconnect budget instead of spinning, and the consumer's reads stay
    bounded (None after timeout) — never the reference's INFINITE hang."""
    srv = MjpegFaultServer(values=[90], drop_after=[5], max_connections=1)
    name = f"/rtsp_dead_{uuid.uuid4().hex[:8]}"
    p = _spawn_producer(srv.url, name, reconnect=2, wait_s=0.05)
    ring = None
    try:
        ring = _wait_ring(name, p)
        got = 0
        t_end = time.monotonic() + 30.0
        while time.monotonic() < t_end:
            f = ring.consume(timeout_s=1.0)
            if f is None:
                break
            got += 1
        assert got > 0, "no frames before the permanent drop"
        # the listen socket is closed: both re-open attempts are refused,
        # the budget exhausts, and the producer must EXIT (not hang/spin)
        p.wait(timeout=30.0)
    finally:
        p.kill()
        p.wait()
        if ring is not None:
            ring.close(unlink=True)
        srv.close()
