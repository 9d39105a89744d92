"""Decompose the batched mat2 pipeline's 7.2 ms/frame: shift copies, hard
kernel, easy kernel, untile/round/transpose glue."""
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
from stitchingvideo_tpu.ops.pallas import composite_mat2 as m2
from ab_mat2_dma import _reg_cache_path

frames, src = load_frames()
cfg = StitchConfig()
vs = VideoStitcher(cfg)
import os
rc = _reg_cache_path(cfg, frames)
if os.path.exists(rc):
    vs.load_registration(rc)
else:
    vs.register(frames, seed=0)
    vs.save_registration(rc)
kind, ml = vs._tlut
assert kind == "mat2"

n, fh, fw = len(frames), frames[0].shape[0], frames[0].shape[1]
rng = np.random.default_rng(1)
B = 16
batches = [jax.device_put(jnp.asarray(
    rng.integers(-128, 127, (B, n, 3, fh, fw), np.int8))) for _ in range(3)]
Tg = -(-ml.n_tiles // m2.GROUP) + (1 if ml.scratch_slot else 0)


def fn_for(upto):
    @jax.jit
    def run(pb, s):
        sh = m2.shift_planar_bn(pb)
        if upto == "shift":
            return sh[:, :, :, 1, 301, ::401].astype(jnp.int32).sum()
        out = m2._class_call_batched(sh, s.hard, m2.WIN_HH, Tg, B,
                                     None, False, True)
        if upto == "hard":
            return out[:, 3, :, ::401].astype(jnp.int32).sum()
        out = m2._class_call_batched(sh, s.easy, m2.WIN_HE, Tg, B,
                                     out, False, True)
        if upto == "easy":
            return out[:, 3, :, ::401].astype(jnp.int32).sum()
        o = out.transpose(2, 0, 1, 3)[:, :, :ml.n_tiles]
        o = jnp.clip(jnp.round(o), 0, 255).astype(jnp.uint8)
        nty, ntx = ml.grid_hw
        Hp, Wp = ml.pano_hw
        o = o.reshape(B, 3, nty, ntx, m2.TILE_H, m2.TILE_W) \
             .transpose(0, 1, 2, 4, 3, 5).reshape(B, 3, nty * m2.TILE_H,
                                                  ntx * m2.TILE_W)
        o = o[:, :, :Hp, :Wp]
        return o[:, :, 301, ::401].astype(jnp.int32).sum()
    return run


prev = 0.0
for upto in ("shift", "hard", "easy", "full"):
    fn = fn_for(upto)
    for b in batches:
        np.asarray(fn(b, ml))
    t0 = time.perf_counter()
    iters = 6
    outs = [int(np.asarray(fn(batches[i % 3], ml))) for i in range(iters)]
    dt = (time.perf_counter() - t0) / (iters * B) * 1e3
    assert len(set(outs)) >= 3
    print(f"{upto:6s}: {dt:6.3f} ms/frame (+{dt - prev:6.3f})", flush=True)
    prev = dt
