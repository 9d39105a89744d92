"""Pallas TPU composite kernel: the per-frame hot loop at MXU speed.

Why: the XLA-gather formulation of the composite LUT (video/lut.py) measures
~0.66 s/frame on v5e for a 5-cam 1080p -> 10 MP panorama — TPU gathers are
scalar-issue. This kernel reformulates exact bilinear resampling as dense
matmuls (SURVEY §7.3 'Gather performance'):

  For each 8x128 output tile owned by <=2 cameras, the source pixels live in
  a small window (80x384, origins tiling-aligned) whose origin is precomputed at LUT-build time.
  Bilinear interpolation is separable per pixel:

      out[p] = sum_wy Vy[wy, p] * (sum_wx src[c, wy, wx] * Vx[wx, p])

  with hat-function weight matrices Vx = relu(1 - |wx - x_local[p]|) (2 nnz
  per column, built on the VPU in f32, cast to bf16). The wx contraction is
  one MXU matmul [3*WIN_H, WIN_W] x [WIN_W, P]; the wy reduction is a cheap
  VPU sum. Per-tile source windows are DMA'd from HBM with scalar-prefetched
  (camera, origin) metadata; tiles whose pixels span >2 cameras or overflow
  the window are counted at build time and the caller falls back to the
  XLA path (correct, slow) — they don't occur for panorama-style LUTs.

Layout notes: LUT arrays are pre-flattened to [T, P=1024] at build time and
the kernel output is channel-planar [3, T, P], so the kernel contains no
reshapes that change the minor dimension; the final un-tiling is one fused
XLA transpose.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
P = TILE_H * TILE_W          # 1024 pixels per tile
WIN_H = 80
WIN_W = 384
# The hat matrices only span a 256-wide band within the 384 DMA window; the
# band starts at one of four 32-granular offsets {0,32,64,96} from the window
# origin (materialized kernel slices the window accordingly).
VXW = 256
BAND_STEP = 32
# DMA slice origins must be aligned to the HBM tiling (sublane 8, lane 128)
ALIGN_Y = 8
ALIGN_X = 128


@flax.struct.dataclass
class TiledLUT:
    """Tile-major composite LUT + per-tile DMA metadata.

    sx, sy, gain: [T, P] float32 (source coords are window-local at use time)
    cidx:         [T, P] int32 (-1 = uncovered)
    tile_cam:     [T*2] int32  up to two source cameras per tile (flat)
    tile_org:     [T*4] int32  (oy_a, ox_a, oy_b, ox_b) window origins (flat)
    tile_band:    [T*2] int32  32-granular hat-band offsets within the window
    fallback:     [T] bool      per-tile not-representable flag (>2 cams /
                                window overflow) — such tiles are composited
                                by the exact XLA gather and merged post-kernel
    n_fallback:   [] int32      count of fallback tiles
    grid_hw / pano_hw / frame_hw: static shapes
    """
    sx: jnp.ndarray
    sy: jnp.ndarray
    gain: jnp.ndarray
    cidx: jnp.ndarray
    tile_cam: jnp.ndarray
    tile_org: jnp.ndarray
    tile_band: jnp.ndarray
    fallback: jnp.ndarray
    n_fallback: jnp.ndarray
    grid_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    pano_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    frame_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)


@partial(jax.jit, static_argnames=("pano_hw", "frame_hw"))
def _build(cam_idx, src_x, src_y, gain, pano_hw, frame_hw):
    Hp, Wp = pano_hw
    fh, fw = frame_hw
    nty = -(-Hp // TILE_H)
    ntx = -(-Wp // TILE_W)
    Hq, Wq = nty * TILE_H, ntx * TILE_W

    def pad(a, fill):
        return jnp.pad(a, ((0, Hq - Hp), (0, Wq - Wp)), constant_values=fill)

    cam = pad(cam_idx, -1)
    sx = pad(src_x, 0.0)
    sy = pad(src_y, 0.0)
    g = pad(gain, 1.0)

    def tiles(a):
        # [Hq, Wq] -> [T, 1, P] tile-major, row-major within tile (the
        # singleton axis satisfies the TPU block-shape divisibility rule:
        # block (1, 1, P) has its last two dims equal to the array's)
        return a.reshape(nty, TILE_H, ntx, TILE_W).transpose(0, 2, 1, 3) \
                .reshape(nty * ntx, 1, P)

    camt, sxt, syt, gt = tiles(cam), tiles(sx), tiles(sy), tiles(g)
    # edge pixels may carry coords in (W-1, W-0.5) from the <W-0.5 validity
    # convention; clamp to the last source pixel (the gather path clamps its
    # taps identically)
    sxt = jnp.clip(sxt, 0.0, fw - 1.0)
    syt = jnp.clip(syt, 0.0, fh - 1.0)
    valid = camt[:, 0, :] >= 0

    big = jnp.int32(1 << 20)
    camf = camt[:, 0, :]
    cam_a = jnp.min(jnp.where(valid, camf, big), axis=1)
    cam_a = jnp.where(cam_a == big, 0, cam_a)
    cam_b = jnp.max(jnp.where(valid, camf, -1), axis=1)
    cam_b = jnp.where(cam_b < 0, cam_a, cam_b)
    middle = valid & (camf != cam_a[:, None]) & (camf != cam_b[:, None])
    fallback = middle.any(axis=1)

    def origin(mask, coord, size, limit, align):
        lo = jnp.min(jnp.where(mask, coord, jnp.inf), axis=1)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        o = (jnp.floor(lo).astype(jnp.int32) - 1) // align * align
        o = jnp.clip(o, 0, (limit - size) // align * align)
        hi = jnp.max(jnp.where(mask, coord, -jnp.inf), axis=1)
        # a coord exactly on the last window row/col has a zero-weight
        # second tap outside the window, which the hat matrix never forms
        overflow = jnp.isfinite(hi) & (hi > o.astype(jnp.float32) + size - 1)
        return o, overflow

    orgs = []
    bands = []
    ovf = fallback
    for cam_s in (cam_a, cam_b):
        m = valid & (camf == cam_s[:, None])
        oy, ovy = origin(m, syt[:, 0, :], WIN_H, fh, ALIGN_Y)
        ox, ovx = origin(m, sxt[:, 0, :], WIN_W, fw, ALIGN_X)
        # 32-granular band start within the aligned window
        lo = jnp.min(jnp.where(m, sxt[:, 0, :], jnp.inf), axis=1)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        boff = jnp.clip((jnp.floor(lo).astype(jnp.int32) - 1 - ox)
                        // BAND_STEP * BAND_STEP, 0, WIN_W - VXW)
        hi = jnp.max(jnp.where(m, sxt[:, 0, :], -jnp.inf), axis=1)
        ovb = jnp.isfinite(hi) & \
            (hi > (ox + boff).astype(jnp.float32) + VXW - 1)
        orgs += [oy, ox]
        bands.append(boff)
        ovf = ovf | ovy | ovx | ovb

    # flattened 1D for SMEM scalar prefetch (2D SMEM arrays get lane-padded)
    tile_cam = jnp.stack([cam_a, cam_b], axis=1).astype(jnp.int32).reshape(-1)
    tile_org = jnp.stack(orgs, axis=1).astype(jnp.int32).reshape(-1)
    tile_band = jnp.stack(bands, axis=1).astype(jnp.int32).reshape(-1)
    return TiledLUT(sx=sxt, sy=syt, gain=gt, cidx=camt,
                    tile_cam=tile_cam, tile_org=tile_org, tile_band=tile_band,
                    fallback=ovf, n_fallback=ovf.sum().astype(jnp.int32),
                    grid_hw=(nty, ntx), pano_hw=(Hp, Wp), frame_hw=(fh, fw))


def build_tiled_lut(lut, frame_hw: Tuple[int, int]) -> TiledLUT:
    """From a CompositeLUT (video/lut.py). frame_hw = (H, W) of camera frames."""
    if frame_hw[0] < WIN_H or frame_hw[1] < WIN_W:
        raise ValueError(f"camera frames {frame_hw} smaller than the source "
                         f"window ({WIN_H}, {WIN_W}); use the XLA path")
    Hp, Wp = lut.cam_idx.shape
    return _build(lut.cam_idx, lut.src_x, lut.src_y, lut.gain,
                  (Hp, Wp), frame_hw)


def _kernel(tile_cam_ref, tile_org_ref,   # scalar prefetch (SMEM, flat)
            sx_ref, sy_ref, gain_ref, cidx_ref,   # [1, 1, P] VMEM blocks
            frames_ref,                   # [N, 3, H, W] bf16, HBM (ANY)
            out_ref,                      # [3, 1, 1, P] f32 VMEM block
            win, sem):                    # scratch: [2, 2, 3, WIN_H, WIN_W] bf16
    # Software-pipelined over the tile grid: tile t's source windows were
    # DMA'd during step t-1 (double buffer), so the per-tile DMA latency that
    # dominated the naive version overlaps with the previous tile's matmuls.
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
    wx_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, P), 0).astype(jnp.float32)
    wy_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_H, P), 0).astype(jnp.float32)

    def slot_contrib(slot, cam, oy, ox):
        xl = sx_ref[0, 0, :] - ox.astype(jnp.float32)     # [P] window-local
        yl = sy_ref[0, 0, :] - oy.astype(jnp.float32)
        vx = jnp.maximum(0.0, 1.0 - jnp.abs(wx_iota - xl[None, :]))
        vy = jnp.maximum(0.0, 1.0 - jnp.abs(wy_iota - yl[None, :]))
        src = win[buf, slot].reshape(3 * WIN_H, WIN_W)  # major-dims collapse
        c_all = jax.lax.dot_general(
            src, vx.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [3*WIN_H, P]
        mask = (cidx_ref[0, 0, :] == cam).astype(jnp.float32)[None, :]
        vals = [jnp.sum(c_all[c * WIN_H:(c + 1) * WIN_H] * vy, axis=0,
                        keepdims=True) for c in range(3)]
        return jnp.concatenate(vals, axis=0) * mask    # [3, P]

    g = gain_ref[0, 0, :][None, :]
    covered = (cidx_ref[0, 0, :] >= 0).astype(jnp.float32)[None, :]
    dma(buf, 0, cam_a, org(t, 0), org(t, 1)).wait()
    out_ref[:, 0, 0, :] = slot_contrib(0, cam_a, org(t, 0), org(t, 1)) * g * covered

    @pl.when(two)
    def _():
        # seam-crossing tile: second camera's contribution (rare, ~1% of tiles)
        dma(buf, 1, cam_b, org(t, 2), org(t, 3)).wait()
        contrib = slot_contrib(1, cam_b, org(t, 2), org(t, 3))
        out_ref[:, 0, 0, :] = out_ref[:, 0, 0, :] + contrib * g * covered


@partial(jax.jit, static_argnames=("interpret",))
def composite_tiled(frames: jnp.ndarray, tlut: TiledLUT,
                    interpret: bool = False) -> jnp.ndarray:
    """[N, H, W, 3] uint8 frames -> [Hp, Wp, 3] uint8 panorama.

    NOTE: when nesting this whole computation inside a larger jit, XLA can
    fuse the HWC->planar transpose into a non-default LAYOUT on the pallas
    operand, which Mosaic mis-verifies as a DMA shape mismatch. Nested
    callers must pass pre-planarized frames through a jit boundary and use
    `composite_tiled_planar` instead (layouts are default at boundaries).
    """
    planar = frames.transpose(0, 3, 1, 2).astype(jnp.bfloat16)  # [N,3,H,W]
    return composite_tiled_planar(planar, tlut, interpret=interpret)


@partial(jax.jit, static_argnames=("interpret",))
def composite_tiled_planar(planar: jnp.ndarray, tlut: TiledLUT,
                           interpret: bool = False) -> jnp.ndarray:
    """[N, 3, H, W] bfloat16 planar frames -> [Hp, Wp, 3] uint8 panorama."""
    T = tlut.sx.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((3, 1, 1, P), lambda t, *_: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 3, WIN_H, WIN_W), jnp.bfloat16),
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
    )(tlut.tile_cam, tlut.tile_org, tlut.sx, tlut.sy, tlut.gain, tlut.cidx,
      planar)

    nty, ntx = tlut.grid_hw
    Hp, Wp = tlut.pano_hw
    pano = out.reshape(3, nty, ntx, TILE_H, TILE_W) \
              .transpose(1, 3, 2, 4, 0) \
              .reshape(nty * TILE_H, ntx * TILE_W, 3)[:Hp, :Wp]
    return jnp.clip(jnp.round(pano), 0, 255).astype(jnp.uint8)


def concat_tiled_luts(luts, cams) -> TiledLUT:
    """Concatenate per-piece single-camera TiledLUTs into ONE multi-camera
    LUT so a single kernel launch warps every piece.

    Each input LUT was built against one camera (cam_idx in {0, -1});
    tile_cam/cidx are rewritten to the real camera index `cams[p]` so the
    kernel DMAs from — and masks against — the right frame in the full
    [N, 3, H, W] stack. All pieces must share grid and frame shapes."""
    nty, ntx = luts[0].grid_hw
    fhw = luts[0].frame_hw
    assert all(l.grid_hw == (nty, ntx) and l.frame_hw == fhw for l in luts)

    def cat(f):
        return jnp.concatenate([getattr(l, f) for l in luts], axis=0)

    cidx = jnp.concatenate(
        [jnp.where(l.cidx >= 0, jnp.int32(c), jnp.int32(-1))
         for l, c in zip(luts, cams)], axis=0)
    tile_cam = jnp.concatenate(
        [jnp.full_like(l.tile_cam, c) for l, c in zip(luts, cams)], axis=0)
    return TiledLUT(
        sx=cat("sx"), sy=cat("sy"), gain=cat("gain"), cidx=cidx,
        tile_cam=tile_cam, tile_org=cat("tile_org"),
        tile_band=cat("tile_band"), fallback=cat("fallback"),
        n_fallback=sum(l.n_fallback for l in luts),
        grid_hw=(len(luts) * nty, ntx),
        pano_hw=(len(luts) * nty * TILE_H, ntx * TILE_W), frame_hw=fhw)
