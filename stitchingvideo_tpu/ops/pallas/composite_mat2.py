"""Two-class materialized composite: easy tiles get short source windows.

Most panorama tiles need only a ~24-row source window (WIN_HE=32 with
alignment); only tiles near the panorama's top/bottom corners — where the
warp's vertical slope across a tile is large — need the full WIN_H=80. This
variant classifies each GROUP of tiles at build time and runs two pallas
calls:

  1. hard groups (WIN_H=80) write their output blocks;
  2. easy groups (WIN_H=32) run with the hard output ALIASED as their output
     buffer, filling the remaining blocks — no merge pass.

Both calls place blocks by a scalar-prefetched group-id list (the out
index_map reads it), so per-class weight/metadata arrays stay contiguous in
class order. Cuts the vy stream, window DMA bytes, and the MXU M-dimension
(240 -> 96) for the easy majority.
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

from .composite import (ALIGN_X, ALIGN_Y, BAND_STEP, P, TILE_H, TILE_W, VXW,
                        WIN_W, TiledLUT, build_tiled_lut)
from .composite_mat import GPAD, GROUP, _mat_chunk

WIN_HH = 80     # hard-class window height (matches composite.WIN_H)
WIN_HE = 32     # easy-class window height


@flax.struct.dataclass
class ClassLUT:
    """One class's grouped arrays (class-group order)."""
    vx: jnp.ndarray         # [TgC, GROUP*VXW, P] int8
    vy: jnp.ndarray         # [TgC, GROUP*win_h, P] int8
    gcs: jnp.ndarray        # [TgC, GPAD, P] f32
    tile_cam: jnp.ndarray   # [TgC*GROUP*2] int32
    tile_org: jnp.ndarray   # [TgC*GROUP*4] int32 (per-class oy!)
    tile_band: jnp.ndarray  # [TgC*GROUP*2] int32
    gid: jnp.ndarray        # [TgC] int32 original group index


@flax.struct.dataclass
class MatLUT2:
    easy: ClassLUT
    hard: ClassLUT
    n_fallback: jnp.ndarray
    grid_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    pano_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    frame_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    n_tiles: int = flax.struct.field(pytree_node=False)
    tg_easy: int = flax.struct.field(pytree_node=False)
    tg_hard: int = flax.struct.field(pytree_node=False)


def _per_tile_fields(tlut: TiledLUT):
    """Window-local coords + per-tile metadata (both slots folded per pixel)."""
    T = tlut.sx.shape[0]
    cam = tlut.cidx[:, 0, :]
    cam_a = tlut.tile_cam.reshape(T, 2)[:, 0]
    org = tlut.tile_org.reshape(T, 4)
    band = tlut.tile_band.reshape(T, 2)
    is_a = cam == cam_a[:, None]
    ox = jnp.where(is_a, org[:, 1:2], org[:, 3:4]).astype(jnp.float32)
    boff = jnp.where(is_a, band[:, 0:1], band[:, 1:2]).astype(jnp.float32)
    xl = jnp.clip(tlut.sx[:, 0, :] - ox - boff, 0.0, VXW - 1.0)
    return cam, is_a, org, band, xl


def build_mat2_lut(lut, frame_hw: Tuple[int, int]) -> MatLUT2:
    tlut = build_tiled_lut(lut, frame_hw)
    return _materialize2(tlut, frame_hw)


def _materialize2(tlut: TiledLUT, frame_hw) -> MatLUT2:
    """Host-orchestrated two-class build (runs jitted chunks on device)."""
    fh, _fw = frame_hw
    T = tlut.sx.shape[0]
    Tg = -(-T // GROUP)
    Tpad = Tg * GROUP

    cam, is_a, org, band, xl = jax.jit(_per_tile_fields)(tlut)
    cam = np.asarray(tlut.cidx[:, 0, :])
    sy = np.asarray(tlut.sy[:, 0, :])
    is_a_np = np.asarray(is_a)
    org_np = np.asarray(org)
    band_np = np.asarray(band)
    tile_cam = np.asarray(tlut.tile_cam).reshape(T, 2)

    # per-slot easy-window origins + easy feasibility (host numpy; tiny)
    def slot_stats(slot):
        m = (cam >= 0) & (is_a_np == (slot == 0))
        lo = np.where(m, sy, np.inf).min(axis=1)
        lo = np.where(np.isfinite(lo), lo, 0.0)
        oy_e = np.clip((np.floor(lo).astype(np.int64) - 1)
                       // ALIGN_Y * ALIGN_Y, 0,
                       (fh - WIN_HE) // ALIGN_Y * ALIGN_Y)
        hi = np.where(m, sy, -np.inf).max(axis=1)
        fits = ~np.isfinite(hi) | (hi <= oy_e + WIN_HE - 1)
        return oy_e.astype(np.int32), fits

    oy_e0, fit0 = slot_stats(0)
    oy_e1, fit1 = slot_stats(1)
    tile_easy = fit0 & fit1
    tile_easy = np.concatenate([tile_easy, np.ones(Tpad - T, bool)])
    group_easy = tile_easy.reshape(Tg, GROUP).all(axis=1)

    def padT(a, fill=0):
        return np.concatenate(
            [a, np.full((Tpad - a.shape[0],) + a.shape[1:], fill, a.dtype)])

    # per-class per-tile origins (easy uses its own oy)
    org_pad = padT(org_np)
    band_pad = padT(band_np)
    cam_pad = padT(tile_cam)
    org_easy = org_pad.copy()
    org_easy[:T, 0] = oy_e0
    org_easy[:T, 2] = oy_e1

    gids = np.arange(Tg, dtype=np.int32)
    easy_g = gids[group_easy]
    hard_g = gids[~group_easy]

    # device weight build (reuse _mat_chunk with per-class window heights)
    sx_loc = np.asarray(xl)
    sx_loc = np.concatenate([sx_loc, np.zeros((Tpad - T, P), np.float32)])
    sy_np = np.concatenate([sy, np.zeros((Tpad - T, P), np.float32)])
    isa_pad = np.concatenate([is_a_np, np.ones((Tpad - T, P), bool)])

    def build_class(group_ids, win_h, orgs):
        if group_ids.size == 0:
            TgC = 0
            return ClassLUT(
                vx=jnp.zeros((0, GROUP * VXW, P), jnp.int8),
                vy=jnp.zeros((0, GROUP * win_h, P), jnp.int8),
                gcs=jnp.zeros((0, GPAD, P), jnp.float32),
                tile_cam=jnp.zeros((0,), jnp.int32),
                tile_org=jnp.zeros((0,), jnp.int32),
                tile_band=jnp.zeros((0,), jnp.int32),
                gid=jnp.zeros((0,), jnp.int32))
        tidx = (group_ids[:, None] * GROUP +
                np.arange(GROUP)[None, :]).reshape(-1)    # class tile ids
        oy = np.where(isa_pad[tidx], orgs[tidx, 0:1], orgs[tidx, 2:3])
        yl = np.clip(sy_np[tidx] - oy, 0.0, win_h - 1.0).astype(np.float32)
        xlc = sx_loc[tidx].astype(np.float32)

        nC = tidx.shape[0]
        CH = 128
        nCp = -(-nC // CH) * CH
        xlp = np.concatenate([xlc, np.zeros((nCp - nC, P), np.float32)])
        ylp = np.concatenate([yl, np.zeros((nCp - nC, P), np.float32)])
        vx, vy = jax.lax.map(
            lambda a: _mat_chunk_h(a[0], a[1], win_h),
            (jnp.asarray(xlp).reshape(-1, CH, P),
             jnp.asarray(ylp).reshape(-1, CH, P)))
        TgC = group_ids.size
        vx = vx.reshape(nCp, VXW, P)[:nC].reshape(TgC, GROUP * VXW, P)
        vy = vy.reshape(nCp, win_h, P)[:nC].reshape(TgC, GROUP * win_h, P)

        covered = (cam >= 0).astype(np.float32)
        covered = np.concatenate([covered, np.zeros((Tpad - T, P), np.float32)])
        gain = np.asarray(tlut.gain[:, 0, :])
        gain = np.concatenate([gain, np.zeros((Tpad - T, P), np.float32)])
        sel = np.concatenate([is_a_np.astype(np.float32),
                              np.ones((Tpad - T, P), np.float32)])
        gc = (gain * covered)[tidx].reshape(TgC, GROUP, P)
        sl = sel[tidx].reshape(TgC, GROUP, P)
        gcs = np.concatenate([gc, sl], axis=1)

        return ClassLUT(
            vx=vx, vy=vy, gcs=jnp.asarray(gcs.astype(np.float32)),
            tile_cam=jnp.asarray(cam_pad[tidx].reshape(-1).astype(np.int32)),
            tile_org=jnp.asarray(orgs[tidx].reshape(-1).astype(np.int32)),
            tile_band=jnp.asarray(band_pad[tidx].reshape(-1).astype(np.int32)),
            gid=jnp.asarray(group_ids.astype(np.int32)))

    easy = build_class(easy_g, WIN_HE, org_easy)
    hard = build_class(hard_g, WIN_HH, org_pad)
    return MatLUT2(easy=easy, hard=hard, n_fallback=tlut.n_fallback,
                   grid_hw=tlut.grid_hw, pano_hw=tlut.pano_hw,
                   frame_hw=tlut.frame_hw, n_tiles=T,
                   tg_easy=int(easy_g.size), tg_hard=int(hard_g.size))


@partial(jax.jit, static_argnames=("win_h",))
def _mat_chunk_h(xl, yl, win_h):
    """Weight materialization with a parameterized y-window height."""
    x0 = jnp.floor(xl)
    fx = xl - x0
    a = jnp.round(127.0 * (1.0 - fx)).astype(jnp.int32)
    wxi = jax.lax.broadcasted_iota(jnp.int32, (xl.shape[0], VXW, P), 1)
    x0b = x0.astype(jnp.int32)[:, None, :]
    vx = jnp.where(wxi == x0b, a[:, None, :], 0) + \
        jnp.where(wxi == x0b + 1, 127 - a[:, None, :], 0)
    vx = jnp.where((wxi == x0b) & (x0b == VXW - 1), 127, vx).astype(jnp.int8)

    y0 = jnp.floor(yl)
    fy = yl - y0
    ay = jnp.round(127.0 * (1.0 - fy)).astype(jnp.int32)
    wyi = jax.lax.broadcasted_iota(jnp.int32, (yl.shape[0], win_h, P), 1)
    y0b = y0.astype(jnp.int32)[:, None, :]
    vy = jnp.where(wyi == y0b, ay[:, None, :], 0) + \
        jnp.where(wyi == y0b + 1, 127 - ay[:, None, :], 0)
    vy = jnp.where((wyi == y0b) & (y0b == win_h - 1), 127, vy).astype(jnp.int8)
    return vx, vy


def _make_kernel(win_h: int):
    def _kernel(gid_ref, tile_cam_ref, tile_org_ref, tile_band_ref,
                vx_ref, vy_ref, gcs_ref, frames_ref, out_ref, win, sem):
        tg = pl.program_id(0)
        TgN = pl.num_programs(0)
        buf = jax.lax.rem(tg, 2)
        nbuf = jax.lax.rem(tg + 1, 2)

        def cams(tt):
            return tile_cam_ref[2 * tt], tile_cam_ref[2 * tt + 1]

        def org(tt, k):
            return tile_org_ref[4 * tt + k]

        def dma(b, g, slot, camv, oy, ox):
            oy = pl.multiple_of(oy, ALIGN_Y)
            ox = pl.multiple_of(ox, ALIGN_X)
            return pltpu.make_async_copy(
                frames_ref.at[camv, :, pl.ds(oy, win_h), pl.ds(ox, WIN_W)],
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

        @pl.when(tg + 1 < TgN)
        def _():
            start_group(tg + 1, nbuf)

        for g in range(GROUP):
            tt = tg * GROUP + g
            cam_a, cam_b = cams(tt)
            two = cam_b != cam_a

            def slot_val(slot, g=g):
                full = win[buf, g, slot].reshape(3 * win_h, WIN_W)
                k = tile_band_ref[2 * tt + slot] // BAND_STEP
                src = jax.lax.switch(
                    k, [lambda off=off:
                        full[:, off:off + VXW].astype(jnp.bfloat16)
                        for off in range(0, WIN_W - VXW + 1, BAND_STEP)])
                vxg = vx_ref[0, g * VXW:(g + 1) * VXW, :].astype(jnp.bfloat16)
                c_all = jax.lax.dot_general(
                    src, vxg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                vy = vy_ref[0, g * win_h:(g + 1) * win_h, :].astype(jnp.float32)
                vals = [jnp.sum(c_all[c * win_h:(c + 1) * win_h] * vy,
                                axis=0, keepdims=True) for c in range(3)]
                return jnp.concatenate(vals, axis=0) * (1.0 / (127.0 * 127.0))

            gc = gcs_ref[0, g, :][None, :]
            sel = gcs_ref[0, GROUP + g, :][None, :]
            dma(buf, g, 0, cam_a, org(tt, 0), org(tt, 1)).wait()
            acc = slot_val(0) * sel

            @pl.when(two)
            def _():
                dma(buf, g, 1, cam_b, org(tt, 2), org(tt, 3)).wait()

            res = jax.lax.cond(
                two, lambda g=g: acc + slot_val(1, g) * (1.0 - sel),
                lambda: acc)
            out_ref[:, 0, g, :] = (res + 128.0) * gc

    return _kernel


def _class_call(planar_i8, cl: ClassLUT, win_h: int, Tg_total: int,
                out_init=None, interpret: bool = False):
    TgC = cl.vx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(TgC,),
        in_specs=[
            pl.BlockSpec((1, GROUP * VXW, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP * win_h, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GPAD, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((3, 1, GPAD, P),
                           lambda t, gid, *_: (0, gid[t], 0, 0),
                           memory_space=pltpu.VMEM)] if out_init is not None
             else []) + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((3, 1, GPAD, P),
                               lambda t, gid, *_: (0, gid[t], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, 2, 3, win_h, WIN_W), jnp.int8),
            pltpu.SemaphoreType.DMA((2, GROUP, 2)),
        ],
    )
    kernel = _make_kernel(win_h)
    if out_init is not None:
        def wrapped(gid_ref, cam_ref, org_ref, band_ref,
                    vx_ref, vy_ref, gcs_ref, prev_ref, frames_ref,
                    out_ref, win, sem):
            del prev_ref  # aliased with out_ref; blocks not written persist
            kernel(gid_ref, cam_ref, org_ref, band_ref,
                   vx_ref, vy_ref, gcs_ref, frames_ref, out_ref, win, sem)
        args = (cl.gid, cl.tile_cam, cl.tile_org, cl.tile_band,
                cl.vx, cl.vy, cl.gcs, out_init, planar_i8)
        return pl.pallas_call(
            wrapped,
            out_shape=jax.ShapeDtypeStruct((3, Tg_total, GPAD, P), jnp.float32),
            grid_spec=grid_spec,
            input_output_aliases={7: 0},  # prev output buffer -> output
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(*args)
    args = (cl.gid, cl.tile_cam, cl.tile_org, cl.tile_band,
            cl.vx, cl.vy, cl.gcs, planar_i8)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, Tg_total, GPAD, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*args)


@partial(jax.jit, static_argnames=("interpret",))
def composite_mat2_planar(planar_i8: jnp.ndarray, ml: MatLUT2,
                          interpret: bool = False) -> jnp.ndarray:
    Tg = -(-ml.n_tiles // GROUP)
    if ml.tg_hard > 0:
        out = _class_call(planar_i8, ml.hard, WIN_HH, Tg, None, interpret)
        if ml.tg_easy > 0:
            out = _class_call(planar_i8, ml.easy, WIN_HE, Tg, out, interpret)
    else:
        out = _class_call(planar_i8, ml.easy, WIN_HE, Tg, None, interpret)

    nty, ntx = ml.grid_hw
    Hp, Wp = ml.pano_hw
    out = out[:, :, :GROUP, :].reshape(3, Tg * GROUP, P)[:, :ml.n_tiles]
    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    pano = out.reshape(3, nty, ntx, TILE_H, TILE_W) \
              .transpose(0, 1, 3, 2, 4) \
              .reshape(3, nty * TILE_H, ntx * TILE_W)[:, :Hp, :Wp]
    return pano
