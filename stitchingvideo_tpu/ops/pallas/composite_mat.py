"""Materialized-weights composite kernel: the fast per-frame hot loop.

The on-the-fly kernel (composite.py) spends ~90% of its time building the
hat-function weight matrices on the VPU every frame — but those matrices only
depend on the registration, not the frame. This variant materializes them
once per registration:

  vx: [T, WIN_W, P] int8  — x-interpolation, rows quantized to sum exactly 127
  vy: [T, WIN_H, P] bf16  — y-interpolation (small, kept high precision)

and streams them through auto-pipelined BlockSpecs while source windows are
double-buffer DMA'd as before. Frames are pre-offset int8 (src - 128), so the
x-contraction runs on the int8 MXU (2x bf16 rate) with exact +128 restore:
rows of vx sum to 127 exactly and vy to ~1, hence

  out = (sum_wy vy * (sum_wx vx_i8 * src8)) / 127 + 128.

Per-frame cost shifts from VPU compute to HBM streaming (~5 GB/frame of
weights at v5e's ~800 GB/s) + int8 matmuls. Output is planar uint8 tiles
[3, T, 1, P]; the planar->canvas re-blocking is a cheap same-minor-dim XLA
reshape (the HWC interleave that cost ~28 ms is gone — consumers get
channel-planar frames, the native layout for video encoders).

Weight quantization error: <=1/127 per tap => <=~1 gray level, matching the
reference's own speed-over-exactness stance in its hot loop (it dropped
bounds checks, 64-bit driver :170).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite import (ALIGN_X, ALIGN_Y, P, TILE_H, TILE_W, WIN_H, WIN_W,
                        TiledLUT, build_tiled_lut)


@flax.struct.dataclass
class MatLUT:
    """TiledLUT + materialized interpolation matrices."""
    vx: jnp.ndarray          # [T, WIN_W, P] int8
    vy: jnp.ndarray          # [T, WIN_H, P] bf16
    gain: jnp.ndarray        # [T, 1, P] f32
    covered: jnp.ndarray     # [T, 1, P] f32 (0/1)
    sel_a: jnp.ndarray       # [T, 1, P] f32: 1 where pixel belongs to slot A
    tile_cam: jnp.ndarray    # [T*2] int32
    tile_org: jnp.ndarray    # [T*4] int32
    n_fallback: jnp.ndarray
    grid_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    pano_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    frame_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)


def _mat_chunk(xl, yl):
    """Per-tile-chunk weight materialization. xl/yl: [C, P] window-local."""
    # x: int8 rows summing exactly 127
    x0 = jnp.floor(xl)
    fx = xl - x0
    a = jnp.round(127.0 * (1.0 - fx)).astype(jnp.int32)
    wxi = jax.lax.broadcasted_iota(jnp.int32, (xl.shape[0], WIN_W, P), 1)
    x0b = x0.astype(jnp.int32)[:, None, :]
    vx = jnp.where(wxi == x0b, a[:, None, :], 0) + \
        jnp.where(wxi == x0b + 1, 127 - a[:, None, :], 0)
    # guard the right edge: x0 == WIN_W-1 puts the whole mass on the last col
    vx = jnp.where((wxi == x0b) & (x0b == WIN_W - 1), 127, vx)
    vx = vx.astype(jnp.int8)

    # y: bf16 two-tap hat
    y0 = jnp.floor(yl)
    fy = (yl - y0).astype(jnp.float32)
    wyi = jax.lax.broadcasted_iota(jnp.int32, (yl.shape[0], WIN_H, P), 1)
    y0b = y0.astype(jnp.int32)[:, None, :]
    vy = jnp.where(wyi == y0b, 1.0 - fy[:, None, :], 0.0) + \
        jnp.where(wyi == y0b + 1, fy[:, None, :], 0.0)
    vy = jnp.where((wyi == y0b) & (y0b == WIN_H - 1), 1.0, vy)
    return vx, vy.astype(jnp.bfloat16)


@jax.jit
def _materialize(tlut: TiledLUT) -> MatLUT:
    T = tlut.sx.shape[0]
    cam = tlut.cidx[:, 0, :]                       # [T, P]
    cam_a = tlut.tile_cam.reshape(T, 2)[:, 0]
    org = tlut.tile_org.reshape(T, 4)
    is_a = cam == cam_a[:, None]
    ox = jnp.where(is_a, org[:, 1:2], org[:, 3:4]).astype(jnp.float32)  # [T,P]
    oy = jnp.where(is_a, org[:, 0:1], org[:, 2:3]).astype(jnp.float32)

    xl = jnp.clip(tlut.sx[:, 0, :] - ox, 0.0, WIN_W - 1.0)
    yl = jnp.clip(tlut.sy[:, 0, :] - oy, 0.0, WIN_H - 1.0)

    # chunked over tiles: bounds the live intermediates (the monolithic
    # version materializes multi-GB int32 temporaries and stalls compilation)
    CHUNK = 128
    Tpad = -(-T // CHUNK) * CHUNK
    xlp = jnp.pad(xl, ((0, Tpad - T), (0, 0)))
    ylp = jnp.pad(yl, ((0, Tpad - T), (0, 0)))
    vx, vy = jax.lax.map(
        lambda args: _mat_chunk(*args),
        (xlp.reshape(-1, CHUNK, P), ylp.reshape(-1, CHUNK, P)))
    vx = vx.reshape(Tpad, WIN_W, P)[:T]
    vy = vy.reshape(Tpad, WIN_H, P)[:T]

    covered = (cam >= 0).astype(jnp.float32)[:, None, :]
    sel_a = is_a.astype(jnp.float32)[:, None, :]
    return MatLUT(vx=vx, vy=vy, gain=tlut.gain, covered=covered, sel_a=sel_a,
                  tile_cam=tlut.tile_cam, tile_org=tlut.tile_org,
                  n_fallback=tlut.n_fallback, grid_hw=tlut.grid_hw,
                  pano_hw=tlut.pano_hw, frame_hw=tlut.frame_hw)


def build_mat_lut(lut, frame_hw: Tuple[int, int]) -> MatLUT:
    return _materialize(build_tiled_lut(lut, frame_hw))


def _kernel(tile_cam_ref, tile_org_ref,            # scalar prefetch (flat)
            vx_ref, vy_ref, gain_ref, covered_ref, sel_ref,  # auto-blocked
            frames_ref,                            # [N, 3, H, W] int8, ANY
            out_ref,                               # [3, 1, 1, P] f32
            win, sem):                             # [2, 2, 3, WIN_H, WIN_W] i8
    t = pl.program_id(0)
    T = pl.num_programs(0)
    buf = jax.lax.rem(t, 2)
    nbuf = jax.lax.rem(t + 1, 2)

    def cams(tt):
        return tile_cam_ref[2 * tt], tile_cam_ref[2 * tt + 1]

    def org(tt, k):
        return tile_org_ref[4 * tt + k]

    def dma(b, slot, cam, oy, ox):
        oy = pl.multiple_of(oy, ALIGN_Y)
        ox = pl.multiple_of(ox, ALIGN_X)
        return pltpu.make_async_copy(
            frames_ref.at[cam, :, pl.ds(oy, WIN_H), pl.ds(ox, WIN_W)],
            win.at[b, slot], sem.at[b, slot])

    def start_tile(tt, b):
        ca, cb = cams(tt)
        dma(b, 0, ca, org(tt, 0), org(tt, 1)).start()

        @pl.when(cb != ca)
        def _():
            dma(b, 1, cb, org(tt, 2), org(tt, 3)).start()

    @pl.when(t == 0)
    def _():
        start_tile(0, 0)

    @pl.when(t + 1 < T)
    def _():
        start_tile(t + 1, nbuf)

    cam_a, cam_b = cams(t)
    two = cam_b != cam_a

    def slot_val(slot):
        """[3, P] f32: x/y interpolated src8 for this slot's window."""
        src = win[buf, slot].reshape(3 * WIN_H, WIN_W)       # int8
        c_all = jax.lax.dot_general(
            src, vx_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                # [3*WIN_H, P]
        vy = vy_ref[0].astype(jnp.float32)                   # [WIN_H, P]
        vals = [jnp.sum(c_all[c * WIN_H:(c + 1) * WIN_H].astype(jnp.float32)
                        * vy, axis=0, keepdims=True) for c in range(3)]
        return jnp.concatenate(vals, axis=0) * (1.0 / 127.0)

    sel = sel_ref[0]                                         # [1, P]
    g = gain_ref[0]
    covered = covered_ref[0]

    dma(buf, 0, cam_a, org(t, 0), org(t, 1)).wait()
    acc = slot_val(0) * sel

    @pl.when(two)
    def _():
        dma(buf, 1, cam_b, org(t, 2), org(t, 3)).wait()

    # second slot only where the tile actually spans two cameras
    res = jax.lax.cond(
        two,
        lambda: acc + slot_val(1) * (1.0 - sel),
        lambda: acc)
    out = (res + 128.0) * g * covered
    # Mosaic lacks f32->uint8 casts; emit f32, cast in XLA (elementwise, cheap)
    out_ref[:, 0, 0, :] = out


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
    T = mlut.vx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, WIN_W, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WIN_H, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((3, 1, 1, P), lambda t, *_: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 3, WIN_H, WIN_W), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((3, T, 1, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(mlut.tile_cam, mlut.tile_org, mlut.vx, mlut.vy, mlut.gain,
      mlut.covered, mlut.sel_a, planar_i8)

    nty, ntx = mlut.grid_hw
    Hp, Wp = mlut.pano_hw
    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    # planar re-blocking: minor dim stays 128-granular — near-memcpy
    pano = out.reshape(3, nty, ntx, TILE_H, TILE_W) \
              .transpose(0, 1, 3, 2, 4) \
              .reshape(3, nty * TILE_H, ntx * TILE_W)[:, :Hp, :Wp]
    return pano


def planar_to_hwc(pano_planar: jnp.ndarray) -> jnp.ndarray:
    """[3, H, W] -> [H, W, 3] (display/export convenience; not the hot path)."""
    return jnp.transpose(pano_planar, (1, 2, 0))
