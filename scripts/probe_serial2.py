"""Serial pipeline probe, part 2: can D2H fetches overlap at all?

probe_serial.py established: dispatch async (0.03 ms), execute queue runs at
6.87 ms/step, but EVERY np.asarray fetch costs ~26 ms RTT and one-at-a-time
fetching caps delivery at ~38 fps. This probe tests the remaining levers:

  F. copy_to_host_async at dispatch time, asarray at depth K: if the copy
     is truly in flight, the later asarray is ~free and per-frame delivery
     reaches the execute rate.
  G. 4 concurrent asarray threads on different outputs: does aggregate
     fetch throughput exceed 1/RTT (i.e. do fetch RTTs overlap across
     threads)?
  H. raw D2H: one scalar, 1 MB, and the full panorama (bandwidth + RTT).
  I. coalesced fetch: device-stack M checksums, one fetch per M frames.
"""
import os
import sys
import threading
import time

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
    _, ml = vs._tlut

    n, fh, fw = len(frames), frames[0].shape[0], frames[0].shape[1]
    rng = np.random.default_rng(1)
    singles = [jax.device_put(jnp.asarray(
        rng.integers(-128, 127, (n, 3, fh, fw), np.int8))) for _ in range(6)]

    @jax.jit
    def step(f, s):
        out = composite_mat2_planar(f, s)
        return out[:, 301, ::401].astype(jnp.int32).sum()

    for s_ in singles:
        np.asarray(step(s_, ml))

    # --- F: copy_to_host_async at dispatch --------------------------------
    from collections import deque
    N, depth = 48, 8
    q = deque()
    tdel = []
    checks = []
    t0 = time.perf_counter()
    for i in range(N):
        o = step(singles[i % len(singles)], ml)
        try:
            o.copy_to_host_async()
        except Exception as e:
            print("F copy_to_host_async unsupported:", repr(e)[:80])
        q.append(o)
        if len(q) >= depth:
            checks.append(int(np.asarray(q.popleft())))
            tdel.append(time.perf_counter())
    while q:
        checks.append(int(np.asarray(q.popleft())))
        tdel.append(time.perf_counter())
    wall = tdel[-1] - t0
    gaps = np.diff(np.asarray(tdel)) * 1e3
    print(f"F async-copy depth={depth}: {N/wall:.1f} fps gap "
          f"p50={np.percentile(gaps, 50):.2f} p95={np.percentile(gaps, 95):.2f}",
          flush=True)

    # --- G: concurrent asarray across threads -----------------------------
    outs = [step(singles[i % len(singles)], ml) for i in range(16)]
    jax.block_until_ready(outs)
    res = [None] * 16

    def fetch(k):
        res[k] = int(np.asarray(outs[k]))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=fetch, args=(k,)) for k in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    print(f"G 16 concurrent fetches (ready values): {wall*1e3:.1f} ms total, "
          f"{wall/16*1e3:.2f} ms each effective", flush=True)

    # --- H: raw D2H --------------------------------------------------------
    for nm, arr in [("scalar", jnp.float32(1.0) + 0),
                    ("1MB", jnp.zeros((256, 1024), jnp.float32) + 1),
                    ("pano 22MB", composite_mat2_planar(singles[0], ml))]:
        arr = jax.block_until_ready(arr)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(arr)
            ts.append(time.perf_counter() - t0)
        print(f"H D2H {nm}: p50 {np.percentile(ts, 50)*1e3:.1f} ms",
              flush=True)

    # --- I: coalesced checksum fetch (M frames per RTT) --------------------
    for M in (4, 8):
        N = 48
        q = deque()
        tdel = []
        vals = []
        t0 = time.perf_counter()
        for i in range(N):
            q.append(step(singles[i % len(singles)], ml))
            if len(q) >= M:
                batch = jnp.stack([q.popleft() for _ in range(M)])
                got = np.asarray(batch)
                now = time.perf_counter()
                vals.extend(got.tolist())
                tdel.extend([now] * M)
        while q:
            vals.append(int(np.asarray(q.popleft())))
            tdel.append(time.perf_counter())
        wall = tdel[-1] - t0
        assert len(set(vals)) >= len(singles), "not distinct"
        print(f"I coalesced M={M}: {N/wall:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
