"""Materialized-weights composite kernel: the fast per-frame hot loop.

Two measured facts drive this design (see git history for the experiments):
  * The on-the-fly kernel (composite.py) spends most of its frame budget on
    per-grid-step overhead (~4 us x 8960 tile-steps) plus the VPU hat-matrix
    build — not on the MXU contraction.
  * The interpolation matrices only depend on the registration, not on the
    frame.

So this kernel (a) materializes the weights once per registration —
vx: [*, WIN_W, P] int8 rows summing exactly 127, vy bf16 — and streams them
through auto-pipelined BlockSpecs, and (b) processes GROUP tiles per grid
step to amortize step overhead, with all GROUP x 2 source windows of the next
group DMA'd while the current group computes.

Frames are pre-offset int8 (src - 128) so the x-contraction uses the int8 MXU
with exact +128 restore:

  out = (sum_wy vy * (sum_wx vx_i8 * src8)) / 127 + 128.

Output is channel-planar uint8 [3, Hp, Wp] — the native layout for video
encoders; the HWC interleave (which costs ~28 ms as an XLA transpose) is a
separate convenience (`planar_to_hwc`).

Weight quantization error: <= ~1 gray level, matching the reference's own
speed-over-exactness stance in its hot loop (it dropped bounds checks,
64-bit driver :170).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite import (ALIGN_X, ALIGN_Y, BAND_STEP, P, TILE_H, TILE_W,
                        VXW, WIN_H, WIN_W, TiledLUT, build_tiled_lut)

GROUP = 8        # tiles per grid step
GPAD = 16        # gc rows + sel rows = 2*GROUP for (1, GPAD, P) blocks


@flax.struct.dataclass
class MatLUT:
    """Grouped, materialized composite state.

    vx:   [Tg, GROUP*VXW, P] int8 (band-local hats)
    vy:   [Tg, GROUP*WIN_H, P] int8
    gcs:  [Tg, GPAD, P] f32 — rows 0..G-1: gain*covered; rows G..2G-1: sel_a
    tile_cam: [Tg*GROUP*2] int32 (flat);  tile_org: [Tg*GROUP*4] int32
    """
    vx: jnp.ndarray
    vy: jnp.ndarray
    gcs: jnp.ndarray
    tile_cam: jnp.ndarray
    tile_org: jnp.ndarray
    tile_band: jnp.ndarray
    n_fallback: jnp.ndarray
    grid_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    pano_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    frame_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    n_tiles: int = flax.struct.field(pytree_node=False)


def _mat_chunk(xl, yl):
    """Per-tile-chunk weight materialization. xl/yl: [C, P] window-local."""
    x0 = jnp.floor(xl)
    fx = xl - x0
    a = jnp.round(127.0 * (1.0 - fx)).astype(jnp.int32)
    wxi = jax.lax.broadcasted_iota(jnp.int32, (xl.shape[0], VXW, P), 1)
    x0b = x0.astype(jnp.int32)[:, None, :]
    vx = jnp.where(wxi == x0b, a[:, None, :], 0) + \
        jnp.where(wxi == x0b + 1, 127 - a[:, None, :], 0)
    # right edge: x0 == VXW-1 puts the whole mass on the last column
    vx = jnp.where((wxi == x0b) & (x0b == VXW - 1), 127, vx)
    vx = vx.astype(jnp.int8)

    y0 = jnp.floor(yl)
    fy = yl - y0
    ay = jnp.round(127.0 * (1.0 - fy)).astype(jnp.int32)
    wyi = jax.lax.broadcasted_iota(jnp.int32, (yl.shape[0], WIN_H, P), 1)
    y0b = y0.astype(jnp.int32)[:, None, :]
    vy = jnp.where(wyi == y0b, ay[:, None, :], 0) + \
        jnp.where(wyi == y0b + 1, 127 - ay[:, None, :], 0)
    vy = jnp.where((wyi == y0b) & (y0b == WIN_H - 1), 127, vy)
    return vx, vy.astype(jnp.int8)


@jax.jit
def _materialize(tlut: TiledLUT) -> MatLUT:
    T = tlut.sx.shape[0]
    cam = tlut.cidx[:, 0, :]                       # [T, P]
    cam_a = tlut.tile_cam.reshape(T, 2)[:, 0]
    org = tlut.tile_org.reshape(T, 4)
    band = tlut.tile_band.reshape(T, 2)
    is_a = cam == cam_a[:, None]
    ox = jnp.where(is_a, org[:, 1:2], org[:, 3:4]).astype(jnp.float32)
    oy = jnp.where(is_a, org[:, 0:1], org[:, 2:3]).astype(jnp.float32)
    boff = jnp.where(is_a, band[:, 0:1], band[:, 1:2]).astype(jnp.float32)

    # x is band-local: the kernel slices the DMA window at the band offset
    xl = jnp.clip(tlut.sx[:, 0, :] - ox - boff, 0.0, VXW - 1.0)
    yl = jnp.clip(tlut.sy[:, 0, :] - oy, 0.0, WIN_H - 1.0)

    Tg = -(-T // GROUP)
    Tpad = Tg * GROUP

    def padT(a, fill=0):
        return jnp.pad(a, ((0, Tpad - T),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    xl, yl = padT(xl), padT(yl)

    # chunked weight build bounds live intermediates (a monolithic build
    # materializes multi-GB int32 temporaries and stalls compilation)
    CHUNK = 128
    Tc = -(-Tpad // CHUNK) * CHUNK
    xlc = jnp.pad(xl, ((0, Tc - Tpad), (0, 0)))
    ylc = jnp.pad(yl, ((0, Tc - Tpad), (0, 0)))
    vx, vy = jax.lax.map(
        lambda args: _mat_chunk(*args),
        (xlc.reshape(-1, CHUNK, P), ylc.reshape(-1, CHUNK, P)))
    vx = vx.reshape(Tc, VXW, P)[:Tpad].reshape(Tg, GROUP * VXW, P)
    vy = vy.reshape(Tc, WIN_H, P)[:Tpad].reshape(Tg, GROUP * WIN_H, P)

    covered = padT((cam >= 0).astype(jnp.float32))
    gain = padT(tlut.gain[:, 0, :])
    sel = padT(is_a.astype(jnp.float32), 1)
    gc = (gain * covered).reshape(Tg, GROUP, P)
    sel = sel.reshape(Tg, GROUP, P)
    gcs = jnp.concatenate([gc, sel], axis=1)       # [Tg, 2*GROUP, P] = GPAD

    tile_cam = padT(tlut.tile_cam.reshape(T, 2)).reshape(-1)
    tile_org = padT(tlut.tile_org.reshape(T, 4)).reshape(-1)
    tile_band = padT(band).reshape(-1)
    return MatLUT(vx=vx, vy=vy, gcs=gcs,
                  tile_cam=tile_cam, tile_org=tile_org, tile_band=tile_band,
                  n_fallback=tlut.n_fallback, grid_hw=tlut.grid_hw,
                  pano_hw=tlut.pano_hw, frame_hw=tlut.frame_hw, n_tiles=T)


def build_mat_lut(lut, frame_hw: Tuple[int, int]) -> MatLUT:
    return _materialize(build_tiled_lut(lut, frame_hw))


def _kernel(tile_cam_ref, tile_org_ref, tile_band_ref,  # scalar prefetch
            vx_ref, vy_ref, gcs_ref,               # auto-blocked per group
            frames_ref,                            # [N, 3, H, W] int8, ANY
            out_ref,                               # [3, 1, GPAD, P] f32
            win, sem):                             # [2, GROUP, 2, 3, WIN_H, WIN_W]
    tg = pl.program_id(0)
    Tg = pl.num_programs(0)
    buf = jax.lax.rem(tg, 2)
    nbuf = jax.lax.rem(tg + 1, 2)

    def cams(tt):
        return tile_cam_ref[2 * tt], tile_cam_ref[2 * tt + 1]

    def org(tt, k):
        return tile_org_ref[4 * tt + k]

    def dma(b, g, slot, cam, oy, ox):
        oy = pl.multiple_of(oy, ALIGN_Y)
        ox = pl.multiple_of(ox, ALIGN_X)
        return pltpu.make_async_copy(
            frames_ref.at[cam, :, pl.ds(oy, WIN_H), pl.ds(ox, WIN_W)],
            win.at[b, g, slot], sem.at[b, g, slot])

    def start_group(tgrp, b):
        for g in range(GROUP):
            tt = tgrp * GROUP + g
            ca, cb = cams(tt)
            dma(b, g, 0, ca, org(tt, 0), org(tt, 1)).start()

            @pl.when(cb != ca)
            def _():
                dma(b, g, 1, cb, org(tt, 2), org(tt, 3)).start()

    @pl.when(tg == 0)
    def _():
        start_group(0, 0)

    @pl.when(tg + 1 < Tg)
    def _():
        start_group(tg + 1, nbuf)

    for g in range(GROUP):
        tt = tg * GROUP + g
        cam_a, cam_b = cams(tt)
        two = cam_b != cam_a

        def slot_val(slot, g=g):
            # int8 is the storage/DMA format; the MXU contraction runs in
            # bf16 (int8 values are exactly representable) — Mosaic's int8
            # dot lowering measured ~8x slower here. The hat band is VXW wide
            # at a 32-granular offset within the DMA window: 4-way static
            # slice selected by the prefetched band offset.
            full = win[buf, g, slot].reshape(3 * WIN_H, WIN_W)
            k = tile_band_ref[2 * tt + slot] // BAND_STEP
            src = jax.lax.switch(
                k, [lambda off=off: full[:, off:off + VXW].astype(jnp.bfloat16)
                    for off in range(0, WIN_W - VXW + 1, BAND_STEP)])
            vxg = vx_ref[0, g * VXW:(g + 1) * VXW, :].astype(jnp.bfloat16)
            c_all = jax.lax.dot_general(
                src, vxg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # [3*WIN_H, P]
            vy = vy_ref[0, g * WIN_H:(g + 1) * WIN_H, :].astype(jnp.float32)
            vals = [jnp.sum(c_all[c * WIN_H:(c + 1) * WIN_H] * vy,
                            axis=0, keepdims=True) for c in range(3)]
            return jnp.concatenate(vals, axis=0) * (1.0 / (127.0 * 127.0))

        gc = gcs_ref[0, g, :][None, :]
        sel = gcs_ref[0, GROUP + g, :][None, :]

        dma(buf, g, 0, cam_a, org(tt, 0), org(tt, 1)).wait()
        acc = slot_val(0) * sel

        @pl.when(two)
        def _():
            dma(buf, g, 1, cam_b, org(tt, 2), org(tt, 3)).wait()

        res = jax.lax.cond(two, lambda g=g: acc + slot_val(1, g) * (1.0 - sel),
                           lambda: acc)
        # gc already folds gain * covered; Mosaic lacks f32->uint8 so emit f32
        out_ref[:, 0, g, :] = (res + 128.0) * gc


@partial(jax.jit, static_argnames=("interpret",))
def frames_to_planar_i8(frames: jnp.ndarray, interpret: bool = False):
    """[N, H, W, 3] uint8 -> [N, 3, H, W] int8 (value - 128)."""
    del interpret
    x = frames.transpose(0, 3, 1, 2).astype(jnp.int16) - 128
    return x.astype(jnp.int8)


@partial(jax.jit, static_argnames=("interpret",))
def composite_mat(frames: jnp.ndarray, mlut: MatLUT,
                  interpret: bool = False) -> jnp.ndarray:
    """[N, H, W, 3] uint8 -> planar uint8 panorama [3, Hp, Wp]."""
    planar = frames_to_planar_i8(frames)
    return composite_mat_planar(planar, mlut, interpret=interpret)


@partial(jax.jit, static_argnames=("interpret",))
def composite_mat_planar(planar_i8: jnp.ndarray, mlut: MatLUT,
                         interpret: bool = False) -> jnp.ndarray:
    Tg = mlut.vx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Tg,),
        in_specs=[
            pl.BlockSpec((1, GROUP * VXW, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP * WIN_H, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GPAD, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((3, 1, GPAD, P), lambda t, *_: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, 2, 3, WIN_H, WIN_W), jnp.int8),
            pltpu.SemaphoreType.DMA((2, GROUP, 2)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((3, Tg, GPAD, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(mlut.tile_cam, mlut.tile_org, mlut.tile_band, mlut.vx, mlut.vy,
      mlut.gcs, planar_i8)

    nty, ntx = mlut.grid_hw
    Hp, Wp = mlut.pano_hw
    T = mlut.n_tiles
    out = out[:, :, :GROUP, :].reshape(3, Tg * GROUP, P)[:, :T]
    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    # planar re-blocking: minor dim stays 128-granular — near-memcpy
    pano = out.reshape(3, nty, ntx, TILE_H, TILE_W) \
              .transpose(0, 1, 3, 2, 4) \
              .reshape(3, nty * TILE_H, ntx * TILE_W)[:, :Hp, :Wp]
    return pano


def planar_to_hwc(pano_planar: jnp.ndarray) -> jnp.ndarray:
    """[3, H, W] -> [H, W, 3] (display/export convenience; not the hot path)."""
    return jnp.transpose(pano_planar, (1, 2, 0))
