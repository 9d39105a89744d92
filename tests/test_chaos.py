"""Ingest chaos tests (round-4 item 7): kill producers mid-publish, stall
consumers past ring wrap, restart producers, and re-register under streaming
load — proving the lock-free seqlock ring's claims where the reference is
known to hang (stitching_sharemem.cpp:106 INFINITE wait on a dead producer).

Frames carry a self-checking payload (every byte == seq % 251) so ANY torn
read — a mix of two frames' bytes — is detected, not just crashes.
"""
import os
import signal
import subprocess
import sys
import time
import uuid

import numpy as np
import pytest

from stitchingvideo_tpu.video.sharemem import ShmRing
from stitchingvideo_tpu.video.sources import SharedMemorySource, producer_env

H, W = 256, 512        # ~0.4 MB frames: long memcpy windows for real races


def _hammer_producer(name: str, frames: int = 10 ** 9) -> subprocess.Popen:
    """Publish self-checking frames as fast as possible (no sleep)."""
    code = (
        "import numpy as np, sys;"
        "from stitchingvideo_tpu.video.sharemem import ShmRing;"
        f"r = ShmRing.create({name!r}, {W}, {H}, 3, 4);"
        f"buf = np.empty(({H}, {W}, 3), np.uint8);"
        f"[ (buf.fill(i % 251), r.publish(buf, i)) for i in range({frames}) ]"
    )
    return subprocess.Popen([sys.executable, "-c", code], env=producer_env())


def _assert_untorn(frame: np.ndarray) -> int:
    v = int(frame.flat[0])
    assert (frame == v).all(), \
        f"TORN FRAME: first byte {v}, {np.unique(frame)[:8]}"
    return v


def _wait_ring(name: str, deadline_s: float = 90.0,
               proc: "subprocess.Popen | None" = None) -> ShmRing:
    """Wait for a producer's ring to appear. The deadline is generous (a
    producer is a fresh python process importing numpy/imageio; under full-
    suite load six of them start at once and interpreter startup alone has
    measured >20 s), but a producer that DIED is reported immediately."""
    t0 = time.monotonic()
    while True:
        try:
            return ShmRing.open(name)
        except OSError:
            if proc is not None and proc.poll() is not None:
                raise RuntimeError(
                    f"producer for {name} exited rc={proc.returncode} "
                    "before creating its ring")
            if time.monotonic() - t0 > deadline_s:
                raise
            time.sleep(0.05)


def test_kill_producer_mid_publish_no_hang_no_torn_frame():
    """SIGKILL a full-speed producer at a random moment; the consumer must
    (a) never see a torn frame, (b) return None within the timeout instead
    of hanging, across several kill rounds."""
    rng = np.random.default_rng(7)
    for trial in range(3):
        name = f"/chaos_kill_{uuid.uuid4().hex[:8]}"
        p = _hammer_producer(name)
        try:
            ring = _wait_ring(name, proc=p)
            t_kill = time.monotonic() + float(rng.uniform(0.1, 0.4))
            consumed = 0
            killed = False
            t_end = time.monotonic() + 15.0
            while time.monotonic() < t_end:
                if not killed and time.monotonic() >= t_kill:
                    p.kill()          # SIGKILL: maybe mid-memcpy
                    killed = True
                f = ring.consume(timeout_s=1.0)
                if f is None:
                    assert killed, "consume timed out with a live producer"
                    break             # dead producer detected, no hang
                _assert_untorn(f)
                consumed += 1
            else:
                pytest.fail("consumer never detected the dead producer")
            assert consumed > 0, "no frames consumed before the kill"
        finally:
            p.kill()
            p.wait()
            ring.close(unlink=True)


def test_consumer_stall_past_ring_wrap():
    """A consumer that sleeps while the producer wraps the 4-slot ring must
    wake to the NEWEST frame — valid and untorn, not stale slot garbage."""
    name = f"/chaos_wrap_{uuid.uuid4().hex[:8]}"
    ring = ShmRing.create(name, W, H, 3, slots=4)
    try:
        buf = np.empty((H, W, 3), np.uint8)
        for i in range(23):           # 23 frames through 4 slots
            buf.fill(i % 251)
            ring.publish(buf, i)
        consumer = ShmRing.open(name)
        f = consumer.consume(timeout_s=1.0)
        assert f is not None
        assert _assert_untorn(f) == 22 % 251     # newest, not an old slot
        consumer.close()
    finally:
        ring.close(unlink=True)


def test_torn_read_retry_under_wrap_pressure():
    """Consumer hammers a 4-slot ring while the producer overwrites at full
    speed: every returned frame must be internally consistent and sequence
    numbers must be non-decreasing (the seqlock retry path gets exercised
    for real — overwrites land mid-copy at these rates)."""
    name = f"/chaos_race_{uuid.uuid4().hex[:8]}"
    p = _hammer_producer(name)
    try:
        ring = _wait_ring(name, proc=p)
        last_v = -1
        got = 0
        t_end = time.monotonic() + 3.0
        while time.monotonic() < t_end:
            f = ring.consume(timeout_s=1.0)
            assert f is not None, "live producer timed out"
            v = _assert_untorn(f)
            # values cycle mod 251; monotonicity via the ring's own last_seq
            got += 1
            last_v = v
        assert got > 20, f"only {got} frames consumed under pressure"
    finally:
        p.kill()
        p.wait()
        ring.close(unlink=True)


def test_producer_restart_consumer_reattaches():
    """Producer dies; a replacement recreates the ring under the same name.
    A consumer whose reads time out can re-open the name and resume — the
    recovery the reference's named-event protocol never had."""
    name = f"/chaos_restart_{uuid.uuid4().hex[:8]}"
    p1 = _hammer_producer(name)
    ring = None
    p2 = None
    try:
        ring = _wait_ring(name, proc=p1)
        assert ring.consume(timeout_s=5.0) is not None
        p1.kill()
        p1.wait()
        # drain: eventually None (dead producer, bounded wait)
        t0 = time.monotonic()
        while ring.consume(timeout_s=0.5) is not None:
            assert time.monotonic() - t0 < 10.0
        ring.close(unlink=False)
        ring = None
        p2 = _hammer_producer(name)   # recreates the shm name
        time.sleep(0.5)
        ring = _wait_ring(name, proc=p2)
        f = ring.consume(timeout_s=5.0)
        assert f is not None, "consumer did not recover after restart"
        _assert_untorn(f)
    finally:
        for p in (p1, p2):
            if p is not None:
                p.kill()
                p.wait()
        if ring is not None:
            ring.close(unlink=True)


def test_dead_camera_degrades_then_stops():
    """SharedMemorySource with a stale-frame budget: one dead camera keeps
    the rig streaming on its last good frame for `stale_reads` reads, then
    the source reports end-of-stream (None) — graceful degradation instead
    of the reference's pipeline hang."""
    names = [f"/chaos_deg_{uuid.uuid4().hex[:8]}_{k}" for k in range(2)]
    procs = [_hammer_producer(n) for n in names]
    src = None
    try:
        for n, pr in zip(names, procs):
            _wait_ring(n, proc=pr).close()
        src = SharedMemorySource(names, timeout_s=0.5, stale_reads=3)
        first = src.read()
        assert first is not None and len(first) == 2
        procs[1].kill()               # camera 1 dies mid-stream
        procs[1].wait()
        time.sleep(0.2)
        served = 0
        while True:
            frames = src.read()
            if frames is None:
                break
            _assert_untorn(frames[0])
            _assert_untorn(frames[1])  # last-good reserve, still consistent
            served += 1
            assert served <= 3, "stale budget not enforced"
        assert served == 3, f"expected 3 degraded reads, got {served}"
    finally:
        for p in procs:
            p.kill()
            p.wait()
        if src is not None:
            src.close(unlink=True)


@pytest.mark.slow
def test_reregister_under_streaming_load(tmp_path):
    """Live producers + streaming composition + forced re-registrations on
    every loop pass: no deadlock, no torn frames, the LUT swap stays atomic
    (frames keep composing to the frozen output shape throughout)."""
    import imageio.v3 as iio

    from stitchingvideo_tpu.config import StitchConfig
    from stitchingvideo_tpu.video.runtime import VideoStitcher

    ref = "/root/reference/stitching/OpenCV2.4.11-Stitching/Release/output1"
    if not os.path.isdir(ref):
        pytest.skip("reference footage not mounted")
    paths = []
    for i in range(6):
        im = iio.imread(f"{ref}/img-{i}.jpg")[::3, ::3]
        pth = tmp_path / f"cam{i}.jpg"
        iio.imwrite(pth, im)
        paths.append(str(pth))

    names = [f"/chaos_reg_{uuid.uuid4().hex[:8]}_{k}" for k in range(6)]
    from stitchingvideo_tpu.video.sources import spawn_replay_producer
    procs = [spawn_replay_producer(n, p, fps=30.0)
             for n, p in zip(names, paths)]
    src = None
    try:
        for n, pr in zip(names, procs):
            _wait_ring(n, proc=pr).close()
        src = SharedMemorySource(names, timeout_s=5.0)
        vs = VideoStitcher(StitchConfig())
        shapes = []

        def on_frame(pano, i):
            shapes.append(pano.shape)
            vs.force_reregister()      # 'a'-key hammering under load

        stats = vs.run(src, on_frame=on_frame, max_frames=4)
        assert stats.frames == 4
        assert len(set(shapes)) == 1, f"output shape changed: {set(shapes)}"
        assert vs.registrations >= 2, "re-registration never ran under load"
    finally:
        for p in procs:
            p.kill()
            p.wait()
        if src is not None:
            src.close(unlink=True)
