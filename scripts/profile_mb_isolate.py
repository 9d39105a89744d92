"""Direct isolation of the multiband pipeline at Bm=8: null RTT floor,
warp alone (map + batched), chain alone (precomputed windows as input),
and full — each its own jitted program, same fetch discipline."""
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
from stitchingvideo_tpu.blend import multiband_video as mbv
from stitchingvideo_tpu.blend.multiband import WEIGHT_EPS
from stitchingvideo_tpu.ops import pyramid_planar as ppyr
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
B = 8
Nv = len(st.piece_cam)
CHp, CWp = st.canvas_hw
CHb, Wb = st.buf_hw
bands = st.bands
rng = np.random.default_rng(1)
batches = [jax.device_put(jnp.asarray(
    rng.integers(-128, 127, (B, n, 3, fh, fw), np.int8)))
    for _ in range(3)]

from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
    composite_mat2_planar_pieces, composite_mat2_planar_pieces_batched)


@jax.jit
def f_null(pb, s):
    return pb[:, 0, 0, 301, ::401].astype(jnp.int32).sum()


@jax.jit
def f_warp_map(pb, s):
    x = jax.lax.map(
        lambda f: composite_mat2_planar_pieces(f, s.warp_lut, Nv), pb)
    return x[:, :, :, 301, ::401].astype(jnp.float32).sum()


@jax.jit
def f_warp_batched(pb, s):
    x = composite_mat2_planar_pieces_batched(pb, s.warp_lut, Nv)
    return x[:, :, :, 301, ::401].astype(jnp.float32).sum()


def chain(x, s):
    """Everything after the warp (copy of multiband_video_frames_batched)."""
    gp = ppyr.gaussian_pyramid_p(x.reshape(B * Nv * 3, CHb, Wb), bands)
    norms = [None]
    for lvl in range(1, bands + 1):
        gi = gp[lvl].reshape(B, Nv, 3, CHb >> lvl, Wb >> lvl)
        norms.append((gi / jnp.maximum(
            s.gm[lvl], WEIGHT_EPS)[None, :, None]).astype(jnp.bfloat16))
    band = []
    for lvl in range(1, bands + 1):
        if lvl < bands:
            up = mbv._bblur_up(norms[lvl + 1].reshape(
                B * Nv * 3, CHb >> (lvl + 1), Wb >> (lvl + 1))) \
                .reshape(B, Nv, 3, CHb >> lvl, Wb >> lvl)
            lap = norms[lvl].astype(jnp.float32) - up
        else:
            lap = norms[bands].astype(jnp.float32)
        contrib = lap * s.gm[lvl][None, :, None]
        hl, wl = CHp >> lvl, CWp >> lvl
        hb, wb = CHb >> lvl, Wb >> lvl
        acc = jnp.zeros((B, 3, hl, wl), jnp.float32)
        for p, ax in enumerate(s.piece_ax):
            a = ax >> lvl
            acc = acc.at[:, :, :min(hb, hl), a:a + wb].add(
                contrib[:, p, :, :min(hb, hl), :min(wb, wl - a)])
        band.append(acc)
    C = band[-1] * s.recip[bands][None, None]
    for lvl in range(bands - 1, 0, -1):
        C = ppyr.pyr_up_p(C.reshape(B * 3, CHp >> (lvl + 1),
                                    CWp >> (lvl + 1))) \
            .reshape(B, 3, CHp >> lvl, CWp >> lvl) \
            + band[lvl - 1] * s.recip[lvl][None, None]
    u_all = mbv._bblur_up(norms[1].reshape(B * Nv * 3, CHb >> 1, Wb >> 1)) \
        .reshape(B, Nv, 3, CHb, Wb) * s.m0[None, :, None] \
        .astype(jnp.float32)
    d_all = x.astype(jnp.float32) - u_all
    B0 = jnp.zeros((B, 3, CHp, CWp), jnp.float32)
    for p, ax in enumerate(s.piece_ax):
        B0 = B0.at[:, :, :CHp, ax:ax + Wb].add(
            d_all[:, p, :, :CHp, :min(Wb, CWp - ax)])
    pano = B0 * s.recip[0][None, None] \
        + ppyr.pyr_up_p(C.reshape(B * 3, CHp >> 1, CWp >> 1)) \
        .reshape(B, 3, CHp, CWp)
    return pano


@jax.jit
def f_chain(xin, s):
    return chain(xin, s)[:, :, 301, ::401].sum()


@jax.jit
def f_full(pb, s):
    x = jax.lax.map(
        lambda f: composite_mat2_planar_pieces(f, s.warp_lut, Nv), pb)
    return chain(x, s)[:, :, 301, ::401].sum()


# precompute warped windows for the chain-only runs
xs = [np.asarray(0) for _ in range(3)]
xs = [jax.jit(lambda pb, s: jax.lax.map(
    lambda f: composite_mat2_planar_pieces(f, s.warp_lut, Nv), pb))(b, st)
    for b in batches]
for x in xs:
    x.block_until_ready()

for name, fn, args in (("null", f_null, batches),
                       ("warp_map", f_warp_map, batches),
                       ("warp_batched", f_warp_batched, batches),
                       ("chain", f_chain, xs),
                       ("full", f_full, batches)):
    for a in args:
        np.asarray(fn(a, st))
    t0 = time.perf_counter()
    iters = 6
    outs = [float(np.asarray(fn(args[i % 3], st))) for i in range(iters)]
    dt = (time.perf_counter() - t0) / (iters * B) * 1e3
    assert len(set(outs)) >= 3, f"{name} not distinct"
    print(f"{name:12s}: {dt:7.2f} ms/frame", flush=True)
