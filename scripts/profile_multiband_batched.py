"""Cumulative-prefix profile of multiband_video_frames_batched at Bm=8.

Per-iteration sync costs RTT/Bm ~ 4 ms/frame baked into every row; the
INCREMENTS between rows are the real per-frame stage costs.
"""
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
from stitchingvideo_tpu.ops import pyramid_planar as ppyr
from stitchingvideo_tpu.blend.multiband import WEIGHT_EPS
from stitchingvideo_tpu.blend import multiband_video as mbv
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
vs._tlut = None
vs._ftlut = None
assert vs.build_multiband_state((fh, fw))
st, crop_yx = vs._mbtlut

n = len(frames)
rng = np.random.default_rng(1)
B = 8
batches = [jax.device_put(jnp.asarray(
    rng.integers(-128, 127, (B, n, 3, fh, fw), np.int8)))
    for _ in range(3)]

Nv = len(st.piece_cam)
CHp, CWp = st.canvas_hw
CHb, Wb = st.buf_hw
bands = st.bands
print(f"Nv={Nv} canvas={CHp}x{CWp} buf={CHb}x{Wb} bands={bands} B={B}",
      flush=True)

from stitchingvideo_tpu.ops.pallas.composite_mat2 import \
    composite_mat2_planar_pieces_batched


def stage_fn(upto):
    @jax.jit
    def run(pb, st):
        x = composite_mat2_planar_pieces_batched(pb, st.warp_lut, Nv)
        if upto == "warp":
            return x[:, :, :, 301, ::401].astype(jnp.float32).sum()
        gp = ppyr.gaussian_pyramid_p(x.reshape(B * Nv * 3, CHb, Wb), bands)
        if upto == "pyr":
            return sum(g[:, 1, ::31].astype(jnp.float32).sum() for g in gp)
        norms = [None]
        for lvl in range(1, bands + 1):
            gi = gp[lvl].reshape(B, Nv, 3, CHb >> lvl, Wb >> lvl)
            norms.append((gi / jnp.maximum(
                st.gm[lvl], WEIGHT_EPS)[None, :, None]).astype(jnp.bfloat16))
        if upto == "norms":
            return sum(x2[:, :, :, 1, ::31].astype(jnp.float32).sum()
                       for x2 in norms[1:])
        band = []
        for lvl in range(1, bands + 1):
            if lvl < bands:
                up = mbv._bblur_up(norms[lvl + 1].reshape(
                    B * Nv * 3, CHb >> (lvl + 1), Wb >> (lvl + 1))) \
                    .reshape(B, Nv, 3, CHb >> lvl, Wb >> lvl)
                lap = norms[lvl].astype(jnp.float32) - up
            else:
                lap = norms[bands].astype(jnp.float32)
            contrib = lap * st.gm[lvl][None, :, None]
            hl, wl = CHp >> lvl, CWp >> lvl
            hb, wb = CHb >> lvl, Wb >> lvl
            acc = jnp.zeros((B, 3, hl, wl), jnp.float32)
            for p, ax in enumerate(st.piece_ax):
                a = ax >> lvl
                acc = acc.at[:, :, :min(hb, hl), a:a + wb].add(
                    contrib[:, p, :, :min(hb, hl), :min(wb, wl - a)])
            band.append(acc)
        if upto == "bands":
            return sum(b[:, :, 1, ::31].sum() for b in band)
        C = band[-1] * st.recip[bands][None, None]
        for lvl in range(bands - 1, 0, -1):
            C = ppyr.pyr_up_p(C.reshape(B * 3, CHp >> (lvl + 1),
                                        CWp >> (lvl + 1))) \
                .reshape(B, 3, CHp >> lvl, CWp >> lvl) \
                + band[lvl - 1] * st.recip[lvl][None, None]
        if upto == "collapse":
            return C[:, :, 1, ::31].sum()
        u_all = mbv._bblur_up(norms[1].reshape(B * Nv * 3, CHb >> 1,
                                               Wb >> 1)) \
            .reshape(B, Nv, 3, CHb, Wb) * st.m0[None, :, None] \
            .astype(jnp.float32)
        d_all = x.astype(jnp.float32) - u_all
        if upto == "dall":
            return d_all[:, :, :, 301, ::401].sum()
        B0 = jnp.zeros((B, 3, CHp, CWp), jnp.float32)
        for p, ax in enumerate(st.piece_ax):
            B0 = B0.at[:, :, :CHp, ax:ax + Wb].add(
                d_all[:, p, :, :CHp, :min(Wb, CWp - ax)])
        pano = B0 * st.recip[0][None, None] \
            + ppyr.pyr_up_p(C.reshape(B * 3, CHp >> 1, CWp >> 1)) \
            .reshape(B, 3, CHp, CWp)
        return pano[:, :, 301, ::401].sum()
    return run


prev = 0.0
for upto in ("warp", "pyr", "norms", "bands", "collapse", "dall", "full"):
    fn = stage_fn(upto)
    for b in batches:
        np.asarray(fn(b, st))
    t0 = time.perf_counter()
    iters = 6
    outs = [float(np.asarray(fn(batches[i % 3], st))) for i in range(iters)]
    dt = (time.perf_counter() - t0) / (iters * B) * 1e3
    assert len(set(outs)) >= 3, "not distinct"
    print(f"{upto:9s}: {dt:7.2f} ms/frame (+{dt - prev:6.2f})", flush=True)
    prev = dt
