"""Fine-grained warm-registration profiler (round-4 item 1 diagnosis).

Breaks the two dominant warm stages (find_features 0.461 s, seam_finding
0.473 s per BENCH_r03) into relay-visible sub-steps: upload, dispatch,
fetch, and host compute. Run on the real TPU.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import load_frames
from stitchingvideo_tpu.video.runtime import VideoStitcher
from stitchingvideo_tpu import config as cfg_mod
from stitchingvideo_tpu.seams import graphcut as gc
from stitchingvideo_tpu.utils import timing

frames, src = load_frames()
print("source", src, flush=True)

vs = VideoStitcher()
t0 = time.perf_counter()
vs.register(frames, seed=0)
print("cold", round(time.perf_counter() - t0, 2), flush=True)

# instrument _pair_cut and the banded driver
orig_pair_cut = gc._pair_cut
PROF = {"pair_cut_s": 0.0, "pair_cuts": 0, "bk_s": 0.0}


def timed_pair_cut(*a, **kw):
    t = time.perf_counter()
    out = orig_pair_cut(*a, **kw)
    PROF["pair_cut_s"] += time.perf_counter() - t
    PROF["pair_cuts"] += 1
    return out


gc._pair_cut = timed_pair_cut

orig_banded = gc.graphcut_seams_banded


def timed_banded(canvas_imgs, canvas_masks, cost_type="color", sticky=None):
    t0 = time.perf_counter()
    out = orig_banded(canvas_imgs, canvas_masks, cost_type, sticky=sticky)
    print(f"  banded total {time.perf_counter()-t0:.3f}s sticky={sticky}",
          flush=True)
    return out


gc.graphcut_seams_banded = timed_banded

rng = np.random.default_rng(1)
for rep in range(3):
    PROF["pair_cut_s"] = 0.0
    PROF["pair_cuts"] = 0
    jit = [np.clip(f.astype(np.int16) + rng.integers(-2, 3), 0,
                   255).astype(np.uint8) for f in frames]
    t = time.perf_counter()
    vs.register(jit, seed=1 + rep)
    wall = time.perf_counter() - t
    print(f"warm[{rep}] {wall:.3f}s  pair_cut {PROF['pair_cut_s']:.3f}s "
          f"x{PROF['pair_cuts']}", flush=True)
    rep_d = timing.GLOBAL_TRACER.report()
    print("  stages:", {k: round(v["last_s"], 3) for k, v in rep_d.items()},
          flush=True)
