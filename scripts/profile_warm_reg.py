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


def timed_banded(canvas_imgs, canvas_masks, cost_type="color"):
    import jax.numpy as jnp
    t0 = time.perf_counter()
    N, H, W = canvas_masks.shape
    ii, jj = np.triu_indices(N, 1)
    pairs = tuple((int(a), int(b)) for a, b in zip(ii, jj))
    if gc._OVERLAP_META is None:
        gc._OVERLAP_META = gc._overlap_meta_jit()
        gc._CROP_BANDS = gc._crop_bands_jit()
    meta = np.asarray(gc._OVERLAP_META(canvas_masks, pairs))
    t1 = time.perf_counter()
    masks = np.asarray(canvas_masks).astype(bool).copy()
    t2 = time.perf_counter()
    live = [k for k in range(len(pairs)) if meta[k, 0]]
    bh = min(H, gc._bucket(max(int(meta[k, 2] - meta[k, 1]) + 1 for k in live)
                           + 2 * gc.GAP, gc._B_BUCKET))
    bw = min(W, gc._bucket(max(int(meta[k, 4] - meta[k, 3]) + 1 for k in live)
                           + 2 * gc.GAP, gc._B_BUCKET))
    origins = [(int(np.clip(meta[k, 1] - gc.GAP, 0, H - bh)),
                int(np.clip(meta[k, 3] - gc.GAP, 0, W - bw)))
               for k in live]
    Lp = gc._bucket(len(live), gc._L_BUCKET)
    idx_np = np.array([[ii[k], jj[k]] for k in live]
                      + [[ii[live[0]], jj[live[0]]]] * (Lp - len(live)))
    org_np = np.array(origins + [origins[0]] * (Lp - len(live)))
    t3 = time.perf_counter()
    bands_dev = gc._CROP_BANDS(canvas_imgs, jnp.asarray(idx_np),
                               jnp.asarray(org_np), bh, bw)
    bands_dev.block_until_ready()
    t4 = time.perf_counter()
    bands = np.asarray(bands_dev, dtype=np.float32)
    t5 = time.perf_counter()
    for t, k in enumerate(live):
        oy, ox = origins[t]
        i, j = int(ii[k]), int(jj[k])
        sl = (slice(oy, oy + bh), slice(ox, ox + bw))
        m1, m2 = gc._pair_cut(bands[t, 0], bands[t, 1],
                              masks[i][sl], masks[j][sl], cost_type)
        masks[i][sl] = m1
        masks[j][sl] = m2
    t6 = time.perf_counter()
    print(f"  banded: meta {t1-t0:.3f} mask_fetch {t2-t1:.3f} "
          f"plan {t3-t2:.3f} crop_dispatch {t4-t3:.3f} band_fetch {t5-t4:.3f} "
          f"cuts {t6-t5:.3f}  live={len(live)} band={bh}x{bw} "
          f"bytes={bands.nbytes/1e6:.1f}MB(fp32 host) "
          f"dev_bytes={Lp*2*bh*bw*3/1e6:.1f}MB(u8)", flush=True)
    return masks


gc.graphcut_seams_banded = timed_banded
import stitchingvideo_tpu.models.stitcher as st_mod
# stitcher imports the symbol lazily inside the function from ..seams.graphcut
# so patching the module attribute is enough

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
