"""Diagnose the serial (B=1) pipeline's missing overlap (VERDICT r4 item 3).

Round 4 measured: depth-4 pipelined B=1 composites delivered with a p50 gap
of 28.3 ms ~= the single-dispatch RTT (31.3 ms), i.e. NO overlap between
dispatch, kernel, and fetch through the TPU relay. This probe isolates where
the serialization happens:

  A. dispatch-return time: how long does step(x) take to RETURN (no fetch)?
     If ~RTT, dispatch itself is synchronous through the relay and no
     host-side pipelining can ever overlap it.
  B. execute-rate: dispatch N steps back-to-back, block only on the last.
     wall/N ~ kernel time => executions queue+overlap; wall/N ~ RTT =>
     the relay serializes whole execute round-trips.
  C. depth sweep: delivered-gap p50/p95 at depth 1/2/4/8 with the checksum
     fetch (the round-4 measurement, reproduced).
  D. donation: same as C but the jit donates its input buffer.
  E. threaded fetch: dispatch on the main thread, np.asarray fetches on a
     worker thread (tests whether the relay serializes execute+fetch on one
     host thread but not across threads).

Usage: python scripts/probe_serial.py  (needs reference footage + TPU)
"""
import os
import sys
import threading
import time
from collections import deque

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stitchingvideo_tpu.utils.timing import enable_compilation_cache

enable_compilation_cache()

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from ab_mat2_dma import _reg_cache_path                       # noqa: E402
from bench import load_frames                                 # noqa: E402
from stitchingvideo_tpu.config import StitchConfig            # noqa: E402
from stitchingvideo_tpu.ops.pallas.composite_mat2 import (    # noqa: E402
    composite_mat2_planar)
from stitchingvideo_tpu.video.runtime import VideoStitcher    # noqa: E402


def pct(a, q):
    return round(float(np.percentile(np.asarray(a), q)), 2)


def main():
    frames, src = load_frames()
    assert src == "reference_footage", src
    cfg = StitchConfig()
    vs = VideoStitcher(cfg)
    rc = _reg_cache_path(cfg, frames)
    if os.path.exists(rc):
        vs.load_registration(rc)
    else:
        vs.register(frames, seed=0)
        vs.save_registration(rc)
    kind, ml = vs._tlut
    assert kind == "mat2", kind

    n, fh, fw = len(frames), frames[0].shape[0], frames[0].shape[1]
    rng = np.random.default_rng(1)
    singles = [jax.device_put(jnp.asarray(
        rng.integers(-128, 127, (n, 3, fh, fw), np.int8))) for _ in range(6)]

    @jax.jit
    def step(f, s):
        out = composite_mat2_planar(f, s)
        return out[:, 301, ::401].astype(jnp.int32).sum()

    for s_ in singles:
        np.asarray(step(s_, ml))      # warm

    # --- A: dispatch-return time ---------------------------------------
    rets = []
    outs = []
    for i in range(12):
        t0 = time.perf_counter()
        outs.append(step(singles[i % len(singles)], ml))
        rets.append((time.perf_counter() - t0) * 1e3)
    jax.block_until_ready(outs)
    print(f"A dispatch-return ms: p50={pct(rets, 50)} p95={pct(rets, 95)} "
          f"first={rets[0]:.2f}", flush=True)

    # --- B: execute rate without per-step fetch --------------------------
    N = 32
    t0 = time.perf_counter()
    outs = [step(singles[i % len(singles)], ml) for i in range(N)]
    jax.block_until_ready(outs[-1])
    wall_last = time.perf_counter() - t0
    jax.block_until_ready(outs)
    wall_all = time.perf_counter() - t0
    sums = [int(np.asarray(o)) for o in outs]
    assert len(set(sums)) >= len(singles), "outputs not distinct"
    print(f"B execute-rate: {N} steps, block(last) {wall_last*1e3:.1f} ms "
          f"({wall_last/N*1e3:.2f} ms/step), block(all) {wall_all/N*1e3:.2f} "
          "ms/step", flush=True)

    # --- C: depth sweep with checksum fetch ------------------------------
    def run_depth(depth, N=48, fetch="sync"):
        q = deque()
        tdel = []
        checks = []
        lock_done = []
        if fetch == "thread":
            out_q = deque()
            stop = object()

            def drain():
                while True:
                    item = None
                    while item is None:
                        if out_q:
                            item = out_q.popleft()
                        else:
                            time.sleep(0.0002)
                    if item is stop:
                        return
                    checks.append(int(np.asarray(item)))
                    tdel.append(time.perf_counter())
            th = threading.Thread(target=drain)
            th.start()
        t0 = time.perf_counter()
        for i in range(N):
            out = step(singles[i % len(singles)], ml)
            if fetch == "thread":
                out_q.append(out)
            else:
                q.append(out)
                if len(q) >= depth:
                    checks.append(int(np.asarray(q.popleft())))
                    tdel.append(time.perf_counter())
        if fetch == "thread":
            out_q.append(stop)
            th.join()
        else:
            while q:
                checks.append(int(np.asarray(q.popleft())))
                tdel.append(time.perf_counter())
        wall = tdel[-1] - t0
        gaps = np.diff(np.asarray(tdel)) * 1e3
        assert len(set(checks)) >= len(singles), "not distinct"
        return N / wall, pct(gaps, 50), pct(gaps, 95)

    for d in (1, 2, 4, 8):
        fps, g50, g95 = run_depth(d)
        print(f"C depth={d}: {fps:.1f} fps gap p50={g50} p95={g95}",
              flush=True)

    # --- E: threaded fetch ------------------------------------------------
    fps, g50, g95 = run_depth(0, fetch="thread")
    print(f"E threaded-fetch: {fps:.1f} fps gap p50={g50} p95={g95}",
          flush=True)

    # --- D: donated input ------------------------------------------------
    @jax.jit
    def step_pano(f, s):
        return composite_mat2_planar(f, s)

    # fetch only a row slice to host (partial fetch cost probe)
    outs = []
    t0 = time.perf_counter()
    for i in range(12):
        outs.append(step_pano(singles[i % len(singles)], ml))
        if len(outs) > 3:
            o = outs.pop(0)
            np.asarray(o[:, 301, ::401])
    for o in outs:
        np.asarray(o[:, 301, ::401])
    wall = time.perf_counter() - t0
    print(f"D pano-out keep-on-device, slice-fetch: {12/wall:.1f} fps",
          flush=True)


if __name__ == "__main__":
    main()
