"""Feather blending fused into the materialized Pallas hot loop.

The reference hot loop is seam-select only (one source camera per panorama
pixel, 64-bit driver feedSizeRemap :150-177); feather blending exists only on
its still path (FeatherBlender, src/blenders.cpp:115-186). This module makes
full feather blending a HOT-LOOP mode: every panorama pixel blends the two
highest-weight cameras with distance-transform feather weights, at
materialized-kernel speed.

Design: the seam kernel (composite_mat.py) already runs up to two source
windows per tile and mixes them with a binary per-pixel `sel`. Feathering
needs two genuinely different sample positions per pixel (camera A's and
camera B's backward maps disagree in the overlap), so this kernel carries
per-slot weight matrices (vx/vy doubled, laid out slot-major within each
group) and per-slot combined gains gw = w_feather_normalized * exposure_gain:

    out = valA * gwA + valB * gwB + 128 * (gwA + gwB)

(frames are int8 value-128; the +128 restore distributes because gwA+gwB is
the pixel's total gain — exact, no renormalization pass). Pixels covered by
one camera have gwB = 0 and skip the second window DMA entirely, so the
overhead over the seam kernel is the doubled weight stream on overlap tiles.

Truncation vs the full blender: per PIXEL only the top-2 cameras by feather
weight contribute (renormalized); at >=3-camera overlap points the dropped
weights are the smallest of 3+. Tiles whose top-2 slots span >2 distinct
cameras fall back to an exact XLA dual-gather overlay (same mechanism as
composite_mat2).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite import (ALIGN_X, ALIGN_Y, BAND_STEP, P, TILE_H, TILE_W, VXW,
                        WIN_H, WIN_W)
from .composite_mat2 import FB_BUCKET, GPAD, GROUP, _mat_chunk_h


@flax.struct.dataclass
class BlendLUT:
    """Per-panorama-pixel dual-slot blend table (canvas space).

    cam_*: int32, -1 = slot inactive. gw_* = normalized feather weight x
    exposure gain (0 where inactive); gw_a + gw_b is the pixel's total gain.
    """
    cam_a: jnp.ndarray
    sx_a: jnp.ndarray
    sy_a: jnp.ndarray
    gw_a: jnp.ndarray
    cam_b: jnp.ndarray
    sx_b: jnp.ndarray
    sy_b: jnp.ndarray
    gw_b: jnp.ndarray

    @property
    def shape(self):
        return self.cam_a.shape

    def crop(self, y0: int, y1: int, x0: int, x1: int) -> "BlendLUT":
        sl = (slice(y0, y1), slice(x0, x1))
        return jax.tree.map(lambda a: a[sl], self)


@partial(jax.jit, static_argnames=("canvas_wh", "roi_hw"))
def _build_blend(corners, valid, xmaps, ymaps, seam_masks, gain_maps,
                 canvas_wh, roi_hw, sharpness):
    """Canvas-space dual-slot LUT from registration fields.

    Weight semantics follow FeatherBlender::createWeightMap
    (blenders.cpp:427-432): min(L1-distance-transform(owned mask) *
    sharpness, 1), computed on the canvas like the still feather path.
    """
    from ...ops.distance import distance_transform_l1

    CW, CH = canvas_wh
    Hr, Wr = roi_hw
    n = xmaps.shape[0]
    HP, WP = CH + Hr, CW + Wr   # oversized so placement never clamps

    def place(i, arr, fill):
        canvas = jnp.full((HP, WP), fill, arr.dtype)
        return jax.lax.dynamic_update_slice(
            canvas, arr, (corners[i, 1], corners[i, 0]))

    own = jnp.stack([place(i, seam_masks[i] & valid[i], False)
                     for i in range(n)])
    w = jax.vmap(lambda m: jnp.minimum(distance_transform_l1(m) * sharpness,
                                       1.0) * m)(own)
    sx = jnp.stack([place(i, xmaps[i], 0.0) for i in range(n)])
    sy = jnp.stack([place(i, ymaps[i], 0.0) for i in range(n)])
    g = jnp.stack([place(i, gain_maps[i], 1.0) for i in range(n)])

    # top-2 cameras per pixel by feather weight
    w1 = jnp.zeros((HP, WP), jnp.float32)
    w2 = jnp.zeros((HP, WP), jnp.float32)
    c1 = jnp.full((HP, WP), -1, jnp.int32)
    c2 = jnp.full((HP, WP), -1, jnp.int32)
    for i in range(n):
        wi = w[i]
        gt1 = wi > w1
        gt2 = (~gt1) & (wi > w2)
        c2 = jnp.where(gt1, c1, jnp.where(gt2, i, c2))
        w2 = jnp.where(gt1, w1, jnp.where(gt2, wi, w2))
        c1 = jnp.where(gt1, i, c1)
        w1 = jnp.where(gt1, wi, w1)

    s = w1 + w2
    wa = jnp.where(s > 0, w1 / jnp.maximum(s, 1e-20), 0.0)
    wb = jnp.where(s > 0, w2 / jnp.maximum(s, 1e-20), 0.0)

    def take(a, c):
        # equality-masked select: a take_along_axis here is a 22M-index
        # scalar-issue gather (see video/lut.py _build for the same fix)
        out = a[0]
        for i in range(1, n):
            out = jnp.where(c == i, a[i], out)
        return out

    act_a = (c1 >= 0) & (wa > 0)
    act_b = (c2 >= 0) & (wb > 0)
    sl = (slice(0, CH), slice(0, CW))
    return BlendLUT(
        cam_a=jnp.where(act_a, c1, -1)[sl],
        sx_a=take(sx, c1)[sl], sy_a=take(sy, c1)[sl],
        gw_a=jnp.where(act_a, wa * take(g, c1), 0.0)[sl],
        cam_b=jnp.where(act_b, c2, -1)[sl],
        sx_b=take(sx, c2)[sl], sy_b=take(sy, c2)[sl],
        gw_b=jnp.where(act_b, wb * take(g, c2), 0.0)[sl])


def build_blend_lut(reg, sharpness: float = 0.02) -> BlendLUT:
    """From a Registration pytree (models/registration.py)."""
    return _build_blend(reg.corners, reg.valid, reg.xmaps, reg.ymaps,
                        reg.seam_masks, reg.gain_maps, reg.canvas_wh,
                        reg.roi_hw, jnp.float32(sharpness))


@flax.struct.dataclass
class FeatherMatLUT:
    """Materialized dual-slot kernel state (group-major, slot-interleaved)."""
    vx: jnp.ndarray         # [Tg, GROUP*2*VXW, P] int8
    vy: jnp.ndarray         # [Tg, GROUP*2*WIN_H, P] int8
    gws: jnp.ndarray        # [Tg, GPAD, P] f32: rows g=gw0, GROUP+g=gw1
    tile_cam: jnp.ndarray   # [Tg*GROUP*2] int32
    tile_org: jnp.ndarray   # [Tg*GROUP*4] int32
    tile_band: jnp.ndarray  # [Tg*GROUP*2] int32
    n_fallback: jnp.ndarray
    fb_tid: jnp.ndarray     # [Fb] int32
    fb_valid: jnp.ndarray   # [Fb] bool
    fb_cam: jnp.ndarray     # [Fb, 2, P] int32 (-1 inactive)
    fb_sx: jnp.ndarray      # [Fb, 2, P] f32
    fb_sy: jnp.ndarray      # [Fb, 2, P] f32
    fb_gw: jnp.ndarray      # [Fb, 2, P] f32
    grid_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    pano_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    frame_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    n_tiles: int = flax.struct.field(pytree_node=False)
    n_fb: int = flax.struct.field(pytree_node=False)


def _tiles(a, nty, ntx):
    return a.reshape(nty, TILE_H, ntx, TILE_W).transpose(0, 2, 1, 3) \
            .reshape(nty * ntx, P)


def _tile_fields(blut: BlendLUT, frame_hw):
    """Per-tile dual-slot assignment + fallback classification (traced)."""
    fh, fw = frame_hw
    Hp, Wp = blut.cam_a.shape
    nty, ntx = -(-Hp // TILE_H), -(-Wp // TILE_W)
    Hq, Wq = nty * TILE_H, ntx * TILE_W

    def padhw(a, fill):
        return jnp.pad(a, ((0, Hq - Hp), (0, Wq - Wp)), constant_values=fill)

    camA = _tiles(padhw(blut.cam_a, -1), nty, ntx)
    camB = _tiles(padhw(blut.cam_b, -1), nty, ntx)
    gwA = _tiles(padhw(blut.gw_a, 0.0), nty, ntx)
    gwB = _tiles(padhw(blut.gw_b, 0.0), nty, ntx)
    sxA = jnp.clip(_tiles(padhw(blut.sx_a, 0.0), nty, ntx), 0.0, fw - 1.0)
    syA = jnp.clip(_tiles(padhw(blut.sy_a, 0.0), nty, ntx), 0.0, fh - 1.0)
    sxB = jnp.clip(_tiles(padhw(blut.sx_b, 0.0), nty, ntx), 0.0, fw - 1.0)
    syB = jnp.clip(_tiles(padhw(blut.sy_b, 0.0), nty, ntx), 0.0, fh - 1.0)

    actA = (camA >= 0) & (gwA > 0)
    actB = (camB >= 0) & (gwB > 0)
    big = jnp.int32(1 << 20)
    cand_lo = jnp.minimum(jnp.where(actA, camA, big).min(axis=1),
                          jnp.where(actB, camB, big).min(axis=1))
    lo = jnp.where(cand_lo == big, 0, cand_lo)
    cand_hi = jnp.maximum(jnp.where(actA, camA, -1).max(axis=1),
                          jnp.where(actB, camB, -1).max(axis=1))
    hi = jnp.where(cand_hi < 0, lo, cand_hi)
    mid = (actA & (camA != lo[:, None]) & (camA != hi[:, None])) | \
          (actB & (camB != lo[:, None]) & (camB != hi[:, None]))
    fallback = mid.any(axis=1)

    # per-pixel contribution to each TILE slot
    def slot_fields(c_s, is_second):
        from_a = actA & (camA == c_s[:, None])
        from_b = actB & (camB == c_s[:, None])
        gw = jnp.where(from_a, gwA, jnp.where(from_b, gwB, 0.0))
        sx = jnp.where(from_a, sxA, jnp.where(from_b, sxB, 0.0))
        sy = jnp.where(from_a, syA, jnp.where(from_b, syB, 0.0))
        if is_second:
            # single-camera tile: everything already in slot 0
            gw = jnp.where((hi != lo)[:, None], gw, 0.0)
        return gw, sx, sy

    gw0, sx0, sy0 = slot_fields(lo, False)
    gw1, sx1, sy1 = slot_fields(hi, True)
    return (lo, hi, fallback, (gw0, sx0, sy0), (gw1, sx1, sy1),
            (camA, camB, gwA, gwB, sxA, syA, sxB, syB),
            (nty, ntx))


def _window(mask, sy, sx, fh, fw):
    """Aligned DMA window origin + band offset + overflow for one tile slot."""
    def origin(coord, size, limit, align):
        lo = jnp.min(jnp.where(mask, coord, jnp.inf), axis=1)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        o = (jnp.floor(lo).astype(jnp.int32) - 1) // align * align
        o = jnp.clip(o, 0, (limit - size) // align * align)
        hi = jnp.max(jnp.where(mask, coord, -jnp.inf), axis=1)
        ovf = jnp.isfinite(hi) & (hi > o.astype(jnp.float32) + size - 1)
        return o, ovf

    oy, ovy = origin(sy, WIN_H, fh, ALIGN_Y)
    ox, ovx = origin(sx, WIN_W, fw, ALIGN_X)
    lo = jnp.min(jnp.where(mask, sx, jnp.inf), axis=1)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    boff = jnp.clip((jnp.floor(lo).astype(jnp.int32) - 1 - ox)
                    // BAND_STEP * BAND_STEP, 0, WIN_W - VXW)
    hi = jnp.max(jnp.where(mask, sx, -jnp.inf), axis=1)
    ovb = jnp.isfinite(hi) & (hi > (ox + boff).astype(jnp.float32) + VXW - 1)
    return oy, ox, boff, ovy | ovx | ovb


@partial(jax.jit, static_argnames=("frame_hw",))
def _count_fallback(blut: BlendLUT, frame_hw):
    fh, fw = frame_hw
    (_lo, _hi, fallback, s0, s1, _raw, _grid) = _tile_fields(blut, frame_hw)
    gw0, sx0, sy0 = s0
    gw1, sx1, sy1 = s1
    _, _, _, ov0 = _window(gw0 > 0, sy0, sx0, fh, fw)
    _, _, _, ov1 = _window(gw1 > 0, sy1, sx1, fh, fw)
    return (fallback | ov0 | ov1).sum().astype(jnp.int32)


def build_feather_mat(blut: BlendLUT, frame_hw: Tuple[int, int]
                      ) -> FeatherMatLUT:
    """Device-resident build; one scalar fetch (fallback count bucket)."""
    if frame_hw[0] < WIN_H or frame_hw[1] < WIN_W:
        raise ValueError(f"frames {frame_hw} smaller than window "
                         f"({WIN_H},{WIN_W})")
    n_fb = int(_count_fallback(blut, tuple(frame_hw)))
    n_fb_b = -(-n_fb // FB_BUCKET) * FB_BUCKET if n_fb else 0
    # the bucket can overshoot the total tile count on tiny panoramas;
    # argsort(...)[:n_fb] below would silently clamp to T while the static
    # n_fb field claimed more — keep them consistent
    nty = -(-blut.shape[0] // TILE_H)
    ntx = -(-blut.shape[1] // TILE_W)
    n_fb_b = min(n_fb_b, nty * ntx)
    return _materialize_feather(blut, tuple(frame_hw), n_fb_b)


@partial(jax.jit, static_argnames=("frame_hw", "n_fb"))
def _materialize_feather(blut: BlendLUT, frame_hw, n_fb) -> FeatherMatLUT:
    fh, fw = frame_hw
    (lo, hi, fallback, s0, s1, raw, grid) = _tile_fields(blut, frame_hw)
    nty, ntx = grid
    T = nty * ntx
    Tg = -(-T // GROUP)
    Tpad = Tg * GROUP

    slots = []
    ovf_all = fallback
    for gw, sx, sy in (s0, s1):
        m = gw > 0
        oy, ox, boff, ovf = _window(m, sy, sx, fh, fw)
        xl = jnp.clip(sx - (ox + boff)[:, None].astype(jnp.float32),
                      0.0, VXW - 1.0)
        yl = jnp.clip(sy - oy[:, None].astype(jnp.float32), 0.0, WIN_H - 1.0)
        slots.append((gw, xl, yl, oy, ox, boff))
        ovf_all = ovf_all | ovf
    fallback = ovf_all

    def padT(a, fill=0):
        return jnp.pad(a, ((0, Tpad - T),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    # interleave slots: [Tpad, 2, P] -> rows (t, slot)
    xl2 = jnp.stack([padT(slots[0][1]), padT(slots[1][1])], axis=1) \
        .reshape(Tpad * 2, P)
    yl2 = jnp.stack([padT(slots[0][2]), padT(slots[1][2])], axis=1) \
        .reshape(Tpad * 2, P)
    CH = 128
    nR = Tpad * 2
    nRp = -(-nR // CH) * CH
    xlp = jnp.pad(xl2, ((0, nRp - nR), (0, 0)))
    ylp = jnp.pad(yl2, ((0, nRp - nR), (0, 0)))
    vx, vy = jax.lax.map(
        lambda a: _mat_chunk_h(a[0], a[1], WIN_H),
        (xlp.reshape(-1, CH, P), ylp.reshape(-1, CH, P)))
    vx = vx.reshape(nRp, VXW, P)[:nR].reshape(Tg, GROUP * 2 * VXW, P)
    vy = vy.reshape(nRp, WIN_H, P)[:nR].reshape(Tg, GROUP * 2 * WIN_H, P)

    gws = jnp.concatenate([padT(slots[0][0]).reshape(Tg, GROUP, P),
                           padT(slots[1][0]).reshape(Tg, GROUP, P)],
                          axis=1)                      # [Tg, GPAD, P]

    tile_cam = jnp.stack([padT(lo), padT(hi)], axis=1) \
        .astype(jnp.int32).reshape(-1)
    tile_org = jnp.stack([padT(slots[0][3]), padT(slots[0][4]),
                          padT(slots[1][3]), padT(slots[1][4])], axis=1) \
        .astype(jnp.int32).reshape(-1)
    tile_band = jnp.stack([padT(slots[0][5]), padT(slots[1][5])], axis=1) \
        .astype(jnp.int32).reshape(-1)

    camA, camB, gwA, gwB, sxA, syA, sxB, syB = raw
    if n_fb:
        order = jnp.argsort(~fallback, stable=True)[:n_fb].astype(jnp.int32)
        fb_valid = fallback[order]

        def pick2(a, b):
            return jnp.stack([a[order], b[order]], axis=1)   # [Fb, 2, P]

        fb_cam = pick2(jnp.where(gwA > 0, camA, -1),
                       jnp.where(gwB > 0, camB, -1))
        fb_sx = pick2(sxA, sxB)
        fb_sy = pick2(syA, syB)
        fb_gw = pick2(gwA, gwB)
    else:
        order = jnp.zeros((0,), jnp.int32)
        fb_valid = jnp.zeros((0,), bool)
        fb_cam = jnp.zeros((0, 2, P), jnp.int32)
        fb_sx = fb_sy = fb_gw = jnp.zeros((0, 2, P), jnp.float32)

    return FeatherMatLUT(
        vx=vx, vy=vy, gws=gws, tile_cam=tile_cam, tile_org=tile_org,
        tile_band=tile_band, n_fallback=fallback.sum().astype(jnp.int32),
        fb_tid=order, fb_valid=fb_valid, fb_cam=fb_cam, fb_sx=fb_sx,
        fb_sy=fb_sy, fb_gw=fb_gw, grid_hw=(nty, ntx),
        pano_hw=blut.cam_a.shape, frame_hw=(fh, fw), n_tiles=T, n_fb=n_fb)


def _fkernel(tile_cam_ref, tile_org_ref, tile_band_ref,
             vx_ref, vy_ref, gws_ref, frames_ref, out_ref, win, sem):
    tg = pl.program_id(0)
    TgN = pl.num_programs(0)
    buf = jax.lax.rem(tg, 2)
    nbuf = jax.lax.rem(tg + 1, 2)

    def cams(tt):
        return tile_cam_ref[2 * tt], tile_cam_ref[2 * tt + 1]

    def org(tt, k):
        return tile_org_ref[4 * tt + k]

    def dma(b, g, slot, tt, camv, oy, ox):
        # band offset selects a pre-shifted frame copy (see composite_mat2.
        # shift_planar) — windows are VXW wide, no in-kernel band slice
        oy = pl.multiple_of(oy, ALIGN_Y)
        ox = pl.multiple_of(ox, ALIGN_X)
        kk = tile_band_ref[2 * tt + slot] // BAND_STEP
        return pltpu.make_async_copy(
            frames_ref.at[kk, camv, :, pl.ds(oy, WIN_H), pl.ds(ox, VXW)],
            win.at[b, g, slot], sem.at[b, g, slot])

    def start_group(tgrp, b):
        for g in range(GROUP):
            tt = tgrp * GROUP + g
            ca, cb = cams(tt)
            dma(b, g, 0, tt, ca, org(tt, 0), org(tt, 1)).start()

            @pl.when(cb != ca)
            def _():
                dma(b, g, 1, tt, cb, org(tt, 2), org(tt, 3)).start()

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
            # int8 operands, i32 accumulation: exact for int8 frames and
            # int8-quantized weights, ~2x the bf16 MXU issue rate (the
            # mat2 pipeline's measured wall; same compute structure here)
            src = win[buf, g, slot].reshape(3 * WIN_H, VXW)
            r = 2 * g + slot
            vxg = vx_ref[0, r * VXW:(r + 1) * VXW, :]
            c_all = jax.lax.dot_general(
                src, vxg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            vyg = vy_ref[0, r * WIN_H:(r + 1) * WIN_H, :].astype(jnp.float32)
            vals = [jnp.sum(c_all[c * WIN_H:(c + 1) * WIN_H] * vyg,
                            axis=0, keepdims=True) for c in range(3)]
            return jnp.concatenate(vals, axis=0) * (1.0 / (127.0 * 127.0))

        gw0 = gws_ref[0, g, :][None, :]
        gw1 = gws_ref[0, GROUP + g, :][None, :]
        dma(buf, g, 0, tt, cam_a, org(tt, 0), org(tt, 1)).wait()
        acc = slot_val(0) * gw0

        @pl.when(two)
        def _():
            dma(buf, g, 1, tt, cam_b, org(tt, 2), org(tt, 3)).wait()

        res = jax.lax.cond(two, lambda g=g: acc + slot_val(1, g) * gw1,
                           lambda: acc)
        out_ref[:, 0, g, :] = res + 128.0 * (gw0 + gw1)


def _fb_blend_values(planar_i8: jnp.ndarray, ml: FeatherMatLUT) -> jnp.ndarray:
    """Exact dual-slot bilinear gather for fallback tiles: [3, Fb, P] f32."""
    N, _, H, W = planar_i8.shape
    flat = planar_i8.reshape(-1).astype(jnp.float32)

    def slot(s):
        from .composite_mat2 import bilinear_taps
        cam = jnp.maximum(ml.fb_cam[:, s], 0)
        gw = jnp.where(ml.fb_cam[:, s] >= 0, ml.fb_gw[:, s], 0.0)
        x0, y0, x1, y1, fx, fy = bilinear_taps(ml.fb_sx[:, s],
                                               ml.fb_sy[:, s], H, W)

        def chan(c):
            base = cam * (3 * H * W) + c * (H * W)

            def g(yi, xi):
                return jnp.take(flat, base + yi * W + xi, axis=0)

            v8 = ((1 - fx) * (1 - fy) * g(y0, x0) + fx * (1 - fy) * g(y0, x1)
                  + (1 - fx) * fy * g(y1, x0) + fx * fy * g(y1, x1))
            return (v8 + 128.0) * gw

        return jnp.stack([chan(c) for c in range(3)])

    return slot(0) + slot(1)


@partial(jax.jit, static_argnames=("interpret",))
def composite_feather_planar(planar_i8: jnp.ndarray, ml: FeatherMatLUT,
                             interpret: bool = False) -> jnp.ndarray:
    """[N,3,H,W] int8 (value-128) -> feather-blended [3, Hp, Wp] uint8."""
    Tg = ml.vx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Tg,),
        in_specs=[
            pl.BlockSpec((1, GROUP * 2 * VXW, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP * 2 * WIN_H, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GPAD, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((3, 1, GPAD, P), lambda t, *_: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, 2, 3, WIN_H, VXW), jnp.int8),
            pltpu.SemaphoreType.DMA((2, GROUP, 2)),
        ],
    )
    from .composite_mat2 import shift_planar
    out = pl.pallas_call(
        _fkernel,
        out_shape=jax.ShapeDtypeStruct((3, Tg, GPAD, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(ml.tile_cam, ml.tile_org, ml.tile_band, ml.vx, ml.vy, ml.gws,
      shift_planar(planar_i8))

    nty, ntx = ml.grid_hw
    Hp, Wp = ml.pano_hw
    out = out[:, :, :GROUP, :].reshape(3, Tg * GROUP, P)
    if ml.n_fb:
        vals = _fb_blend_values(planar_i8, ml)
        cur = out[:, ml.fb_tid, :]
        merged = jnp.where(ml.fb_valid[None, :, None], vals, cur)
        out = out.at[:, ml.fb_tid, :].set(merged)
    out = out[:, :ml.n_tiles]
    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out.reshape(3, nty, ntx, TILE_H, TILE_W) \
              .transpose(0, 1, 3, 2, 4) \
              .reshape(3, nty * TILE_H, ntx * TILE_W)[:, :Hp, :Wp]


@jax.jit
def composite_blend_gather(frames: jnp.ndarray,
                           blut: BlendLUT) -> jnp.ndarray:
    """XLA dual-gather reference for the feather LUT: [Hp, Wp, 3] float32.

    Exact (no weight quantization) — the correctness oracle for the Pallas
    kernel and the fallback when the kernel is unavailable.
    """
    n, H, W, C = frames.shape
    flat = frames.reshape(n * H * W, C).astype(jnp.float32)

    def slot(cam_idx, sx, sy, gw):
        from .composite_mat2 import bilinear_taps
        base = jnp.maximum(cam_idx, 0) * (H * W)
        x0, y0, x1, y1, fx, fy = bilinear_taps(sx, sy, H, W)

        def g(yi, xi):
            return jnp.take(flat, (base + yi * W + xi).reshape(-1), axis=0) \
                .reshape(*cam_idx.shape, C)

        v = ((1 - fx) * (1 - fy))[..., None] * g(y0, x0) \
            + (fx * (1 - fy))[..., None] * g(y0, x1) \
            + ((1 - fx) * fy)[..., None] * g(y1, x0) \
            + (fx * fy)[..., None] * g(y1, x1)
        return v * jnp.where(cam_idx >= 0, gw, 0.0)[..., None]

    return slot(blut.cam_a, blut.sx_a, blut.sy_a, blut.gw_a) + \
        slot(blut.cam_b, blut.sx_b, blut.sy_b, blut.gw_b)
