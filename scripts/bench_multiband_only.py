"""Standalone bench-methodology multiband fps (bench.py's step_m exactly)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_frames
from stitchingvideo_tpu.config import StitchConfig
from stitchingvideo_tpu.video.runtime import VideoStitcher
from ab_mat2_dma import _reg_cache_path

frames, src = load_frames()
cfg = StitchConfig()
vs = VideoStitcher(cfg)
rc = _reg_cache_path(cfg, frames)
if os.path.exists(rc):
    vs.load_registration(rc)
else:
    vs.register(frames, seed=0)
    vs.save_registration(rc)
fh, fw = frames[0].shape[:2]
vs._tlut = None          # free HBM like bench does
vs._ftlut = None
assert vs.build_multiband_state((fh, fw))
from stitchingvideo_tpu.blend.multiband_video import \
    multiband_video_frame as _mbf
stmb, crop_yx = vs._mbtlut

n = len(frames)
rng = np.random.default_rng(1)
Bm = int(sys.argv[1]) if len(sys.argv) > 1 else 8
mb_batches = [jax.device_put(jnp.asarray(
    rng.integers(-128, 127, (Bm, n, 3, fh, fw), np.int8)))
    for _ in range(3)]


MODE = sys.argv[2] if len(sys.argv) > 2 else "batched"
from stitchingvideo_tpu.blend.multiband_video import \
    multiband_video_frames_batched as _mbfb


@jax.jit
def step_m(fb, s):
    if MODE == "batched":
        outs = _mbfb(fb, s, crop_yx=crop_yx)
    else:
        outs = jax.lax.map(lambda f: _mbf(f, s, crop_yx=crop_yx), fb)
    return outs[:, :, 301, ::401].astype(jnp.int32).sum(axis=(1, 2))


for b in mb_batches:
    np.asarray(step_m(b, stmb))
t0 = time.perf_counter()
iters = 4
sums = [tuple(np.asarray(step_m(mb_batches[i % 3], stmb)).ravel().tolist())
        for i in range(iters)]
dt = (time.perf_counter() - t0) / (iters * Bm)
flat = [v for t in sums for v in t]
assert len(set(flat)) > len(flat) // 2
print(f"multiband Bm={Bm} {MODE}: {1.0/dt:.2f} fps ({dt*1e3:.2f} ms/frame)",
      flush=True)
