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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite import (ALIGN_X, ALIGN_Y, BAND_STEP, P, TILE_H, TILE_W, VXW,
                        WIN_W, TiledLUT, build_tiled_lut)
from .composite_mat import _mat_chunk

WIN_HH = 80     # hard-class window height (matches composite.WIN_H)
WIN_HE = 32     # easy-class window height
# Same GROUP as composite_mat: measured sweeps found GROUP=12 LOSES fps —
# group-granularity easy classification degrades (one hard tile poisons a
# bigger group: 642 -> 398 easy groups on the 5-cam synthetic LUT) and the
# step-count saving does not pay for it. The VXW-wide shift windows still
# free ~4 MB of VMEM scratch at GROUP=8.
GROUP = 8
GPAD = 2 * GROUP
# Experimental kernel variants are exposed as static parameters on the
# batched entry points (NOT module globals — a mutated global would not
# retrace an already-jitted program): vy_bf16 runs the vy reduction in bf16
# (default False = exact f32, required by parity gates); mm_int8 (default
# True on the batched path) runs the x-interp matmul with int8 operands
# accumulating in int32 (exact for int8 values either way; only the MXU
# rate differs — measured +34% fps at B=16). sweep_mat2.py measures both.


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
    """Two-class materialized LUT + per-tile fallback data.

    Fallback tiles (>2 cameras or window overflow) stay in the grid — their
    kernel output is overwritten post-kernel by an exact XLA bilinear gather
    over just those tiles (fb_* arrays, bucketed to n_fb), so one awkward
    tile no longer demotes the whole canvas to the slow path.
    """
    easy: ClassLUT
    hard: ClassLUT
    n_fallback: jnp.ndarray
    fb_tid: jnp.ndarray     # [Fb] int32 tile ids (pad entries arbitrary)
    fb_valid: jnp.ndarray   # [Fb] bool
    fb_cam: jnp.ndarray     # [Fb, P] int32 (-1 = uncovered)
    fb_sx: jnp.ndarray      # [Fb, P] f32 source coords
    fb_sy: jnp.ndarray      # [Fb, P] f32
    fb_gain: jnp.ndarray    # [Fb, P] f32
    grid_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    pano_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    frame_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    n_tiles: int = flax.struct.field(pytree_node=False)
    tg_easy: int = flax.struct.field(pytree_node=False)
    tg_hard: int = flax.struct.field(pytree_node=False)
    n_fb: int = flax.struct.field(pytree_node=False)
    # scratch_slot: class arrays contain PAD groups whose gid points one past
    # the real group range; the output grows one throwaway block to absorb
    # their writes (used by the canvas-sharded per-band LUTs, where class
    # counts are bucketed uniformly across bands)
    scratch_slot: bool = flax.struct.field(pytree_node=False, default=False)


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


BUCKET = 64      # easy-class group-count granularity (compile-cache buckets)
FB_BUCKET = 16   # fallback tile-count granularity


def _easy_split(tlut: TiledLUT, cam, is_a, sy):
    """Per-slot easy-window origins + per-group easy feasibility (device)."""
    fh, _fw = tlut.frame_hw
    T = tlut.sx.shape[0]
    Tg = -(-T // GROUP)
    Tpad = Tg * GROUP

    def slot_stats(slot):
        m = (cam >= 0) & (is_a == (slot == 0))
        lo = jnp.min(jnp.where(m, sy, jnp.inf), axis=1)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        oy_e = jnp.clip((jnp.floor(lo).astype(jnp.int32) - 1)
                        // ALIGN_Y * ALIGN_Y, 0,
                        (fh - WIN_HE) // ALIGN_Y * ALIGN_Y)
        hi = jnp.max(jnp.where(m, sy, -jnp.inf), axis=1)
        fits = ~jnp.isfinite(hi) | (hi <= oy_e.astype(jnp.float32) + WIN_HE - 1)
        return oy_e.astype(jnp.int32), fits

    oy_e0, fit0 = slot_stats(0)
    oy_e1, fit1 = slot_stats(1)
    tile_easy = jnp.concatenate([fit0 & fit1,
                                 jnp.ones(Tpad - T, bool)])
    group_easy = tile_easy.reshape(Tg, GROUP).all(axis=1)
    return group_easy, oy_e0, oy_e1


@jax.jit
def _class_counts(tlut: TiledLUT):
    """The only host fetch of the build: (easy group count, fallback count)."""
    cam, is_a, _org, _band, _xl = _per_tile_fields(tlut)
    group_easy, _, _ = _easy_split(tlut, cam, is_a, tlut.sy[:, 0, :])
    return group_easy.sum().astype(jnp.int32), tlut.n_fallback


def _group_used(tlut: TiledLUT):
    """[Tg] bool: group contains at least one covered pixel."""
    T = tlut.sx.shape[0]
    Tg = -(-T // GROUP)
    covered = (tlut.cidx[:, 0, :] >= 0).any(axis=1)
    covered = jnp.concatenate([covered, jnp.zeros(Tg * GROUP - T, bool)])
    return covered.reshape(Tg, GROUP).any(axis=1)


@jax.jit
def _class_counts_used(tlut: TiledLUT):
    """(used & easy count, used count, fallback count) — for LUTs with many
    fully-uncovered tiles (the multiband window layout), where skipping
    unused groups halves the kernel grid."""
    cam, is_a, _org, _band, _xl = _per_tile_fields(tlut)
    group_easy, _, _ = _easy_split(tlut, cam, is_a, tlut.sy[:, 0, :])
    used = _group_used(tlut)
    return ((group_easy & used).sum().astype(jnp.int32),
            used.sum().astype(jnp.int32), tlut.n_fallback)


def _sticky_classes(n_easy: int, n_fb: int, bucket: int,
                    sticky: dict | None):
    """Class-count buckets with re-registration hysteresis. tg_easy buckets
    DOWN (a smaller value is always correct: the remainder runs as hard
    groups), n_fb buckets UP (pad entries are inert). With `sticky`, a prior
    bucket is reused whenever it is still VALID, and a forced change leaves
    one extra bucket of slack — so 30 s re-registrations whose class counts
    jitter across a bucket boundary stop recompiling the weight-build
    program (measured 3.0 s per flip on the TPU relay)."""
    tg_easy = (n_easy // bucket) * bucket
    n_fb_b = -(-n_fb // FB_BUCKET) * FB_BUCKET if n_fb else 0
    if sticky is not None:
        prev = sticky.get("tg_easy")
        if prev is not None and prev <= n_easy:
            tg_easy = prev
        else:
            tg_easy = max(0, ((n_easy - bucket) // bucket) * bucket)
        sticky["tg_easy"] = tg_easy
        prevf = sticky.get("n_fb")
        if prevf is not None and prevf >= n_fb:
            n_fb_b = prevf
        elif n_fb:
            n_fb_b = -(-n_fb // FB_BUCKET) * FB_BUCKET + FB_BUCKET
        sticky["n_fb"] = n_fb_b
    return tg_easy, n_fb_b


def _materialize2(tlut: TiledLUT, frame_hw=None, sticky=None) -> MatLUT2:
    """Two-class build, fully device-resident.

    Host involvement is two scalar fetches (class counts) that pick the
    static shape bucket; all weight materialization, class packing, and
    fallback extraction run inside one jitted program (kills the ~40 MB of
    host round-trips of the round-1 build — VERDICT item 2).
    """
    del frame_hw  # kept for call-site compatibility; tlut.frame_hw is static
    n_easy, n_fb = (int(x) for x in _class_counts(tlut))
    tg_easy, n_fb_b = _sticky_classes(n_easy, n_fb, BUCKET, sticky)
    return _materialize2_jit(tlut, tg_easy, n_fb_b)


@partial(jax.jit, static_argnames=("tg_easy", "n_fb"))
def _materialize2_jit(tlut: TiledLUT, tg_easy: int, n_fb: int) -> MatLUT2:
    cam, is_a, _org, _band, _xl = _per_tile_fields(tlut)
    group_easy, _, _ = _easy_split(tlut, cam, is_a, tlut.sy[:, 0, :])
    # easy groups first; the bucketed remainder of easy groups runs as hard
    # (hard windows are valid for every non-fallback tile)
    order = jnp.argsort(~group_easy, stable=True).astype(jnp.int32)
    return _pack_classes(tlut, order[:tg_easy], order[tg_easy:], None,
                         n_fb, scratch=False)


def materialize2_used(tlut: TiledLUT, bucket: int = BUCKET,
                      sticky=None) -> MatLUT2:
    """Used-groups-only two-class build: groups with zero covered pixels are
    dropped from the kernel grid entirely (their output blocks stay whatever
    the caller initialized them to — composite_mat2_planar_pieces zero-fills).
    For sparse layouts (the multiband window LUTs, where the seam mask is
    folded into cam_idx) this roughly halves the launch grid. `bucket` sets
    the class-count compile-cache granularity (the default suits product-size
    LUTs; tests use a small bucket so compaction is visible on tiny grids)."""
    Tg = -(-tlut.sx.shape[0] // GROUP)
    n_easy_u, n_used, n_fb = (int(x) for x in _class_counts_used(tlut))
    tg_easy, n_fb_b = _sticky_classes(n_easy_u, n_fb, bucket, sticky)
    # bucket UP (pads write the scratch block), clamped so padding never
    # exceeds the real group count on tiny grids
    tg_hard = min(-(-max(n_used - tg_easy, 0) // bucket) * bucket, Tg)
    if sticky is not None:
        prevh = sticky.get("tg_hard")
        if prevh is not None and Tg >= prevh >= tg_hard:
            tg_hard = prevh
        elif tg_hard < Tg:
            tg_hard = min(tg_hard + bucket, Tg)   # slack for the next jitter
        sticky["tg_hard"] = tg_hard
    return _materialize2_used_jit(tlut, jnp.int32(n_used), tg_easy, tg_hard,
                                  n_fb_b)


@partial(jax.jit, static_argnames=("tg_easy", "tg_hard", "n_fb"))
def _materialize2_used_jit(tlut: TiledLUT, n_used, tg_easy: int, tg_hard: int,
                           n_fb: int) -> MatLUT2:
    cam, is_a, _org, _band, _xl = _per_tile_fields(tlut)
    group_easy, _, _ = _easy_split(tlut, cam, is_a, tlut.sy[:, 0, :])
    used = _group_used(tlut)
    Tg = used.shape[0]
    # used&easy first, then used&hard; unused groups sort last and are cut
    rank = jnp.where(used & group_easy, 0, jnp.where(used, 1, 2))
    order = jnp.argsort(rank, stable=True).astype(jnp.int32)
    # hard class: real entries order[tg_easy:n_used]; bucket-pad entries
    # recompute an arbitrary real group but write to the scratch block
    n_hard_real = n_used - tg_easy
    idx = jnp.arange(tg_hard, dtype=jnp.int32)
    meta_pos = jnp.where(idx < n_hard_real, tg_easy + idx, idx - n_hard_real)
    hard_meta = order[jnp.minimum(meta_pos, Tg - 1)]
    hard_gid = jnp.where(idx < n_hard_real, hard_meta, jnp.int32(Tg))
    return _pack_classes(tlut, order[:tg_easy], hard_meta, hard_gid,
                         n_fb, scratch=True)


@partial(jax.jit, static_argnames=("n_fb", "scratch"))
def _pack_classes(tlut: TiledLUT, easy_ids, hard_ids, hard_gid,
                  n_fb: int, scratch: bool) -> MatLUT2:
    T = tlut.sx.shape[0]
    Tg = -(-T // GROUP)
    Tpad = Tg * GROUP

    cam, is_a, org, band, xl = _per_tile_fields(tlut)
    sy = tlut.sy[:, 0, :]
    group_easy, oy_e0, oy_e1 = _easy_split(tlut, cam, is_a, sy)
    del group_easy

    def padT(a, fill=0):
        return jnp.pad(a, ((0, Tpad - T),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    org_pad = padT(org)
    band_pad = padT(band)
    cam_pad = padT(tlut.tile_cam.reshape(T, 2))
    org_easy = org_pad.at[:T, 0].set(oy_e0).at[:T, 2].set(oy_e1)
    sx_loc = padT(xl)
    sy_pad = padT(sy)
    isa_pad = padT(is_a, True)
    gc_all = padT((tlut.gain[:, 0, :] * (cam >= 0)).astype(jnp.float32))
    sel_all = padT(is_a.astype(jnp.float32), 1.0)

    def build_class(group_ids, win_h, orgs):
        TgC = group_ids.shape[0]
        if TgC == 0:
            return ClassLUT(
                vx=jnp.zeros((0, GROUP * VXW, P), jnp.int8),
                vy=jnp.zeros((0, GROUP * win_h, P), jnp.int8),
                gcs=jnp.zeros((0, GPAD, P), jnp.float32),
                tile_cam=jnp.zeros((0,), jnp.int32),
                tile_org=jnp.zeros((0,), jnp.int32),
                tile_band=jnp.zeros((0,), jnp.int32),
                gid=jnp.zeros((0,), jnp.int32))
        tidx = (group_ids[:, None] * GROUP +
                jnp.arange(GROUP, dtype=jnp.int32)[None, :]).reshape(-1)
        oy = jnp.where(isa_pad[tidx], orgs[tidx, 0:1],
                       orgs[tidx, 2:3]).astype(jnp.float32)
        yl = jnp.clip(sy_pad[tidx] - oy, 0.0, win_h - 1.0)
        xlc = sx_loc[tidx]

        nC = tidx.shape[0]
        CH = 128
        nCp = -(-nC // CH) * CH
        xlp = jnp.pad(xlc, ((0, nCp - nC), (0, 0)))
        ylp = jnp.pad(yl, ((0, nCp - nC), (0, 0)))
        # chunked weight build bounds live int32 temporaries
        vx, vy = jax.lax.map(
            lambda a: _mat_chunk_h(a[0], a[1], win_h),
            (xlp.reshape(-1, CH, P), ylp.reshape(-1, CH, P)))
        vx = vx.reshape(nCp, VXW, P)[:nC].reshape(TgC, GROUP * VXW, P)
        vy = vy.reshape(nCp, win_h, P)[:nC].reshape(TgC, GROUP * win_h, P)

        gcs = jnp.concatenate([gc_all[tidx].reshape(TgC, GROUP, P),
                               sel_all[tidx].reshape(TgC, GROUP, P)], axis=1)
        return ClassLUT(
            vx=vx, vy=vy, gcs=gcs,
            tile_cam=cam_pad[tidx].reshape(-1).astype(jnp.int32),
            tile_org=orgs[tidx].reshape(-1).astype(jnp.int32),
            tile_band=band_pad[tidx].reshape(-1).astype(jnp.int32),
            gid=group_ids)

    easy = build_class(easy_ids, WIN_HE, org_easy)
    hard = build_class(hard_ids, WIN_HH, org_pad)
    if hard_gid is not None:
        hard = hard.replace(gid=hard_gid)

    if n_fb:
        fb_order = jnp.argsort(~tlut.fallback, stable=True)[:n_fb] \
            .astype(jnp.int32)
        fb_valid = tlut.fallback[fb_order]
        fb_cam = tlut.cidx[fb_order, 0, :]
        fb_sx = tlut.sx[fb_order, 0, :]
        fb_sy = tlut.sy[fb_order, 0, :]
        fb_gain = tlut.gain[fb_order, 0, :]
    else:
        fb_order = jnp.zeros((0,), jnp.int32)
        fb_valid = jnp.zeros((0,), bool)
        fb_cam = jnp.zeros((0, P), jnp.int32)
        fb_sx = fb_sy = fb_gain = jnp.zeros((0, P), jnp.float32)

    return MatLUT2(easy=easy, hard=hard, n_fallback=tlut.n_fallback,
                   fb_tid=fb_order, fb_valid=fb_valid, fb_cam=fb_cam,
                   fb_sx=fb_sx, fb_sy=fb_sy, fb_gain=fb_gain,
                   grid_hw=tlut.grid_hw, pano_hw=tlut.pano_hw,
                   frame_hw=tlut.frame_hw, n_tiles=T,
                   tg_easy=easy_ids.shape[0], tg_hard=hard_ids.shape[0],
                   n_fb=n_fb, scratch_slot=scratch)


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


def _make_kernel(win_h: int, mm_int8: bool = True):
    """Kernel over shifted frame copies: the input is [N_SHIFTS=5, N, 3, H,
    W] int8 where copy k is the frame shifted left by k*BAND_STEP columns.
    The per-slot band offset (0/32/64/96/128) selects the COPY instead of a
    wider DMA window + in-kernel slice — window DMAs shrink from WIN_W=384
    to VXW=256 columns and the 5-way lax.switch disappears from the inner
    loop."""
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

        def dma(b, g, slot, tt, camv, oy, ox):
            oy = pl.multiple_of(oy, ALIGN_Y)
            ox = pl.multiple_of(ox, ALIGN_X)
            kk = tile_band_ref[2 * tt + slot] // BAND_STEP
            return pltpu.make_async_copy(
                frames_ref.at[kk, camv, :, pl.ds(oy, win_h), pl.ds(ox, VXW)],
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
                src = win[buf, g, slot].reshape(3 * win_h, VXW)
                vxg = vx_ref[0, g * VXW:(g + 1) * VXW, :]
                if mm_int8:
                    # int8 operands, i32 accumulation: exact (identical to
                    # the bf16->f32 path for these values) and ~2x the MXU
                    # issue rate — the measured wall of this pipeline
                    c_all = jax.lax.dot_general(
                        src, vxg, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32).astype(jnp.float32)
                else:
                    c_all = jax.lax.dot_general(
                        src.astype(jnp.bfloat16), vxg.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                vy = vy_ref[0, g * win_h:(g + 1) * win_h, :].astype(jnp.float32)
                vals = [jnp.sum(c_all[c * win_h:(c + 1) * win_h] * vy,
                                axis=0, keepdims=True) for c in range(3)]
                return jnp.concatenate(vals, axis=0) * (1.0 / (127.0 * 127.0))

            gc = gcs_ref[0, g, :][None, :]
            sel = gcs_ref[0, GROUP + g, :][None, :]
            dma(buf, g, 0, tt, cam_a, org(tt, 0), org(tt, 1)).wait()
            acc = slot_val(0) * sel

            @pl.when(two)
            def _():
                dma(buf, g, 1, tt, cam_b, org(tt, 2), org(tt, 3)).wait()

            res = jax.lax.cond(
                two, lambda g=g: acc + slot_val(1, g) * (1.0 - sel),
                lambda: acc)
            out_ref[:, 0, g, :] = (res + 128.0) * gc

    return _kernel


def _class_call(planar_i8, cl: ClassLUT, win_h: int, Tg_total: int,
                out_init=None, interpret: bool = False,
                mm_int8: bool = True):
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
            pltpu.VMEM((2, GROUP, 2, 3, win_h, VXW), jnp.int8),
            pltpu.SemaphoreType.DMA((2, GROUP, 2)),
        ],
    )
    kernel = _make_kernel(win_h, mm_int8)
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


def bilinear_taps(sx, sy, H: int, W: int):
    """Clamped bilinear tap indices + fractional weights — the one shared
    definition of the gather reference's edge rules (used by the exact
    fallback overlays here and in composite_feather; keep in sync with
    video/lut.composite_frame)."""
    x0f = jnp.floor(sx)
    y0f = jnp.floor(sy)
    fx = sx - x0f
    fy = sy - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    return x0, y0, x1, y1, fx, fy


def _fallback_values(planar_i8: jnp.ndarray, ml: MatLUT2) -> jnp.ndarray:
    """Exact bilinear gather for the fallback tiles only: [3, Fb, P] f32.

    Matches the XLA gather reference (video/lut.py composite_frame) bit for
    bit: frames are int8 (value-128) and the +128 restore commutes with the
    convex bilinear weights."""
    N, _, H, W = planar_i8.shape
    flat = planar_i8.reshape(-1).astype(jnp.float32) + 128.0
    cam = jnp.maximum(ml.fb_cam, 0)
    x0, y0, x1, y1, fx, fy = bilinear_taps(ml.fb_sx, ml.fb_sy, H, W)

    def chan(c):
        base = cam * (3 * H * W) + c * (H * W)

        def g(yi, xi):
            return jnp.take(flat, base + yi * W + xi, axis=0)

        return ((1 - fx) * (1 - fy) * g(y0, x0) + fx * (1 - fy) * g(y0, x1)
                + (1 - fx) * fy * g(y1, x0) + fx * fy * g(y1, x1))

    vals = jnp.stack([chan(c) for c in range(3)])       # [3, Fb, P]
    vals = vals * ml.fb_gain[None]
    return jnp.where((ml.fb_cam >= 0)[None], vals, 0.0)


N_SHIFTS = (WIN_W - VXW) // BAND_STEP + 1     # band offsets 0..128 step 32


@jax.jit
def shift_planar(planar_i8: jnp.ndarray) -> jnp.ndarray:
    """[N,3,H,W] int8 -> [K,N,3,H,W]: copy k shifted left by k*BAND_STEP
    columns (zero tail — never read: window builds guarantee
    ox + band + VXW <= W). Lets the kernel DMA VXW-wide windows whose source
    start is 128-aligned in the selected copy."""
    def sh(k):
        if k == 0:
            return planar_i8
        return jnp.pad(planar_i8[..., k * BAND_STEP:],
                       ((0, 0), (0, 0), (0, 0), (0, k * BAND_STEP)))
    return jnp.stack([sh(k) for k in range(N_SHIFTS)])


@partial(jax.jit, static_argnames=("interpret",))
def composite_mat2_planar(planar_i8: jnp.ndarray, ml: MatLUT2,
                          interpret: bool = False) -> jnp.ndarray:
    Tg = -(-ml.n_tiles // GROUP) + (1 if ml.scratch_slot else 0)
    frames_sh = shift_planar(planar_i8)
    if ml.tg_hard > 0:
        out = _class_call(frames_sh, ml.hard, WIN_HH, Tg, None, interpret)
        if ml.tg_easy > 0:
            out = _class_call(frames_sh, ml.easy, WIN_HE, Tg, out, interpret)
    else:
        out = _class_call(frames_sh, ml.easy, WIN_HE, Tg, None, interpret)

    nty, ntx = ml.grid_hw
    Hp, Wp = ml.pano_hw
    out = out[:, :, :GROUP, :].reshape(3, Tg * GROUP, P)
    if ml.n_fb:
        # overlay the exact-gather values onto the fallback tiles; fb_tid
        # rows are unique (argsort permutation prefix) so pad entries just
        # write their current value back — race-free
        vals = _fallback_values(planar_i8, ml)
        cur = out[:, ml.fb_tid, :]
        merged = jnp.where(ml.fb_valid[None, :, None], vals, cur)
        out = out.at[:, ml.fb_tid, :].set(merged)
    out = out[:, :ml.n_tiles]
    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    pano = out.reshape(3, nty, ntx, TILE_H, TILE_W) \
              .transpose(0, 1, 3, 2, 4) \
              .reshape(3, nty * TILE_H, ntx * TILE_W)[:, :Hp, :Wp]
    return pano


def _make_kernel_tile_batched(win_h: int, B: int, fused_dma: bool,
                              out_dtype=jnp.float32, quantize: bool = False,
                              vy_bf16: bool = False, mm_int8: bool = False):
    """Per-TILE grid kernel with the micro-batch stacked into the matmul M
    dimension: src for all B frames of a tile slot is one [B*win_h, VXW]
    operand, so the x-interp matmul runs at M = B*win_h instead of 3*win_h.

    Why: the measured MXU throughput on this chip is ~66 TFLOP/s at M=96
    (the single-frame easy class) vs ~313-398 TFLOP/s at M>=768 — the
    single-frame kernel wastes ~5/6 of the MXU on systolic fill, and a
    pinned-weight probe showed the hot loop is compute-bound, not weight-
    DMA-bound. Stacking B frames into M is the one restructuring that
    attacks the actual wall. Weight blocks are per-GROUP (index t//GROUP)
    so their HBM traffic also amortizes B-fold per frame.

    fused_dma: frames are [K, N, B, 3, H, W] (batch inside camera) and each
    tile slot issues ONE strided async copy covering all B frames' windows
    — 1 descriptor instead of B per slot, attacking the window-DMA issue
    rate the M-stacking left as the wall. fused_dma=False keeps the
    [B, K, N, 3, H, W] layout with per-frame copies (A/B reference)."""
    def _kernel(gid_ref, tile_cam_ref, tile_org_ref, tile_band_ref,
                vx_ref, vy_ref, gcs_ref, frames_ref, out_ref, win, sem):
        t = pl.program_id(0)
        TN = pl.num_programs(0)
        g = jax.lax.rem(t, GROUP)
        buf = jax.lax.rem(t, 2)
        nbuf = jax.lax.rem(t + 1, 2)

        def cams(tt):
            return tile_cam_ref[2 * tt], tile_cam_ref[2 * tt + 1]

        def org(tt, k):
            return tile_org_ref[4 * tt + k]

        def dma_fused(bslot, slot, tt, camv, oy, ox):
            oy = pl.multiple_of(oy, ALIGN_Y)
            ox = pl.multiple_of(ox, ALIGN_X)
            kk = tile_band_ref[2 * tt + slot] // BAND_STEP
            return pltpu.make_async_copy(
                frames_ref.at[kk, camv, :, :,
                              pl.ds(oy, win_h), pl.ds(ox, VXW)],
                win.at[bslot, slot], sem.at[bslot, slot])

        def dma_per_b(bslot, slot, b, tt, camv, oy, ox):
            oy = pl.multiple_of(oy, ALIGN_Y)
            ox = pl.multiple_of(ox, ALIGN_X)
            kk = tile_band_ref[2 * tt + slot] // BAND_STEP
            return pltpu.make_async_copy(
                frames_ref.at[b, kk, camv, :,
                              pl.ds(oy, win_h), pl.ds(ox, VXW)],
                win.at[bslot, slot, b], sem.at[bslot, slot, b])

        def start_slot(bslot, slot, tt, camv, oy, ox):
            if fused_dma:
                dma_fused(bslot, slot, tt, camv, oy, ox).start()
            else:
                for b in range(B):
                    dma_per_b(bslot, slot, b, tt, camv, oy, ox).start()

        def wait_slot(bslot, slot, tt, camv, oy, ox):
            if fused_dma:
                dma_fused(bslot, slot, tt, camv, oy, ox).wait()
            else:
                for b in range(B):
                    dma_per_b(bslot, slot, b, tt, camv, oy, ox).wait()

        def start_tile(tt, bslot):
            ca, cb = cams(tt)
            start_slot(bslot, 0, tt, ca, org(tt, 0), org(tt, 1))

            @pl.when(cb != ca)
            def _():
                start_slot(bslot, 1, tt, cb, org(tt, 2), org(tt, 3))

        @pl.when(t == 0)
        def _():
            start_tile(0, 0)

        @pl.when(t + 1 < TN)
        def _():
            start_tile(t + 1, nbuf)

        cam_a, cam_b = cams(t)
        two = cam_b != cam_a
        # slice the REFS (Mosaic lowers dynamic ref slices; dynamic_slice on
        # a loaded value is unimplemented)
        vy_t = jnp.bfloat16 if vy_bf16 else jnp.float32
        vy = vy_ref[0, pl.ds(pl.multiple_of(g * win_h, win_h), win_h), :] \
            .astype(vy_t)                                          # [wh, P]
        vxg = vx_ref[0, pl.ds(pl.multiple_of(g * VXW, VXW), VXW), :]
        if not mm_int8:
            vxg = vxg.astype(jnp.bfloat16)                         # [VXW, P]

        def slot_val(slot):
            # [3][B, P]: per channel one M=B*win_h matmul + the vy reduce
            outs = []
            for c in range(3):
                src = win[buf, slot, :, c].reshape(B * win_h, VXW)
                if mm_int8:
                    c_all = jax.lax.dot_general(
                        src, vxg, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                else:
                    c_all = jax.lax.dot_general(
                        src.astype(jnp.bfloat16), vxg,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                v = jnp.sum(c_all.reshape(B, win_h, P).astype(vy_t)
                            * vy[None], axis=1).astype(jnp.float32)  # [B, P]
                outs.append(v * (1.0 / (127.0 * 127.0)))
            return outs

        gc = gcs_ref[0, g, :][None, :]
        sel = gcs_ref[0, GROUP + g, :][None, :]
        wait_slot(buf, 0, t, cam_a, org(t, 0), org(t, 1))
        acc = [v * sel for v in slot_val(0)]

        @pl.when(two)
        def _():
            wait_slot(buf, 1, t, cam_b, org(t, 2), org(t, 3))

        res = jax.lax.cond(
            two,
            lambda: tuple(a + v * (1.0 - sel)
                          for a, v in zip(acc, slot_val(1))),
            lambda: tuple(acc))
        for c in range(3):
            v = (res[c] + 128.0) * gc
            if quantize:
                # quantize IN the kernel: same round-half-to-even of the
                # same f32 the untile pass applied; integers 0..255 are
                # EXACT in bf16 (8 mantissa bits), so results stay
                # bit-identical while the output-block HBM traffic halves
                # (Mosaic cannot cast f32->u8 in-kernel; bf16 is the
                # narrowest exact carrier). Raw lax ops: jnp.round/clip are
                # jit-wrapped and their closed_call breaks Mosaic lowering.
                v = jax.lax.clamp(
                    0.0, jax.lax.round(
                        v, jax.lax.RoundingMethod.TO_NEAREST_EVEN), 255.0)
            out_ref[c, 0, :, :] = v.astype(out_dtype)

    return _kernel


def _class_call_batched(planar_sh_b, cl: ClassLUT, win_h: int, Tg_total: int,
                        B: int, out_init=None, interpret: bool = False,
                        fused_dma: bool = True, out_dtype=jnp.float32,
                        quantize: bool = False, vy_bf16: bool = False,
                        mm_int8: bool = False):
    """Per-tile batched _class_call: planar_sh_b is [N_SHIFTS, N, B, 3, H, W]
    int8 when fused_dma (one window copy per tile slot spans all B frames),
    [B, N_SHIFTS, N, 3, H, W] otherwise; output [3, Tg_total*GROUP, B, P]
    out_dtype (tile-major, B as the sublane dim so each block write is a full
    (B, P) tile). out_dtype=bf16 halves the output-block HBM traffic at the
    cost of one pre-round bf16 rounding (<= +-1 u8 step) — the multiband
    window path's choice; the pano path stays f32 for bit-parity."""
    TgC = cl.vx.shape[0]
    T_alloc = Tg_total * GROUP

    def out_ix(t, gid, *_):
        return (0, gid[t // GROUP] * GROUP + t % GROUP, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(TgC * GROUP,),
        in_specs=[
            pl.BlockSpec((1, GROUP * VXW, P), lambda t, *_: (t // GROUP, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP * win_h, P),
                         lambda t, *_: (t // GROUP, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GPAD, P), lambda t, *_: (t // GROUP, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((3, 1, B, P), out_ix,
                           memory_space=pltpu.VMEM)] if out_init is not None
             else []) + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((3, 1, B, P), out_ix,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, B, 3, win_h, VXW), jnp.int8),
            (pltpu.SemaphoreType.DMA((2, 2)) if fused_dma
             else pltpu.SemaphoreType.DMA((2, 2, B))),
        ],
    )
    kernel = _make_kernel_tile_batched(win_h, B, fused_dma, out_dtype,
                                       quantize, vy_bf16, mm_int8)
    out_shape = jax.ShapeDtypeStruct((3, T_alloc, B, P), out_dtype)
    if out_init is not None:
        def wrapped(gid_ref, cam_ref, org_ref, band_ref,
                    vx_ref, vy_ref, gcs_ref, prev_ref, frames_ref,
                    out_ref, win, sem):
            del prev_ref  # aliased with out_ref; blocks not written persist
            kernel(gid_ref, cam_ref, org_ref, band_ref,
                   vx_ref, vy_ref, gcs_ref, frames_ref, out_ref, win, sem)
        args = (cl.gid, cl.tile_cam, cl.tile_org, cl.tile_band,
                cl.vx, cl.vy, cl.gcs, out_init, planar_sh_b)
        return pl.pallas_call(
            wrapped,
            out_shape=out_shape,
            grid_spec=grid_spec,
            input_output_aliases={7: 0},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(*args)
    args = (cl.gid, cl.tile_cam, cl.tile_org, cl.tile_band,
            cl.vx, cl.vy, cl.gcs, planar_sh_b)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*args)


MB_CHUNK = 8    # frames stacked per kernel pass (VMEM-bounded: the hard-
                # class window scratch is 2*2*B*3*80*256 int8 = 6.3 MB at 8)


@jax.jit
def _shift_planar_bn_xla(planar_b_i8: jnp.ndarray) -> jnp.ndarray:
    """XLA reference/fallback for shift_planar_bn (odd shapes, interpret)."""
    tb = planar_b_i8.transpose(1, 0, 2, 3, 4)   # [N, B, 3, H, W]

    def sh(k):
        if k == 0:
            return tb
        return jnp.pad(tb[..., k * BAND_STEP:],
                       ((0, 0),) * 4 + ((0, k * BAND_STEP),))
    return jnp.stack([sh(k) for k in range(N_SHIFTS)])


def _shift_chunk_rows(h: int) -> int:
    """Largest multiple-of-8 divisor of h with a <=~4 MB output block."""
    best = 8
    for hc in range(8, 137, 8):
        if h % hc == 0:
            best = hc
    return best


def _make_shift_kernel(hc: int):
    def _kernel(in_ref, out_ref):
        x = in_ref[0, 0]                       # [3, hc, W]
        out_ref[0, 0, 0] = x
        for k in range(1, N_SHIFTS):
            s = k * BAND_STEP
            out_ref[k, 0, 0] = jnp.concatenate(
                [x[..., s:], jnp.zeros(x.shape[:-1] + (s,), x.dtype)], -1)
    return _kernel


@partial(jax.jit, static_argnames=("interpret",))
def shift_planar_bn(planar_b_i8: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """[B,N,3,H,W] int8 -> [K,N,B,3,H,W]: batch INSIDE camera so one strided
    window copy per tile slot reaches every frame of the micro-batch.

    Pallas read-once-write-K kernel: the XLA pad+stack+transpose version
    measured 3.23 ms/frame at B=8 (~45% of the mat2 pipeline, ~69 GB/s
    effective); one pass over the bytes is the minimum traffic (read 1x,
    write K x) for the band-shifted copies Mosaic's 128-lane DMA alignment
    forces (scripts/test_misaligned_dma.py proves 32-aligned HBM window
    reads are rejected)."""
    B, N, C, H, W = planar_b_i8.shape
    if interpret or W % 128 or H % 8 or W <= N_SHIFTS * BAND_STEP:
        # interpret mode: the python-loop grid walk is far slower than the
        # (bit-identical) XLA formulation on CPU test shapes
        return _shift_planar_bn_xla(planar_b_i8)
    hc = _shift_chunk_rows(H)
    return pl.pallas_call(
        _make_shift_kernel(hc),
        grid=(N * B, H // hc),
        in_specs=[pl.BlockSpec(
            (1, 1, C, hc, W),
            lambda nb, h: (nb % B, nb // B, 0, h, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (N_SHIFTS, 1, 1, C, hc, W),
            lambda nb, h: (0, nb // B, nb % B, 0, h, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_SHIFTS, N, B, C, H, W),
                                       planar_b_i8.dtype),
        interpret=interpret,
    )(planar_b_i8)


@partial(jax.jit, static_argnames=("interpret", "fused_dma", "vy_bf16",
                                   "mm_int8"))
def composite_mat2_planar_batched(planar_b_i8: jnp.ndarray, ml: MatLUT2,
                                  interpret: bool = False,
                                  fused_dma: bool = True,
                                  vy_bf16: bool = False,
                                  mm_int8: bool = True) -> jnp.ndarray:
    """Micro-batched mat2 composite: [B, N, 3, H, W] int8 (value-128) ->
    [B, 3, Hp, Wp] uint8, bit-identical per frame to composite_mat2_planar.

    The serving-shape hot loop: B frames are stacked into the matmul M
    dimension (see _make_kernel_tile_batched), which both runs the MXU at
    ~3-5x the single-frame efficiency and amortizes the weight-stream HBM
    traffic B-fold; fused_dma batches each tile slot's B window copies into
    one descriptor. B is chunked to MB_CHUNK per kernel pass.

    vy_bf16 selects the (inexact) bf16 vy-reduce variant; parity gates
    require the f32 default. mm_int8=True (default) runs the x-interp
    matmuls with int8 operands accumulating in int32 — EXACT for the int8
    frame values and int8-quantized weights (every partial sum fits i32),
    bit-identical to the bf16->f32 path, and measured 147.8 -> 197.4 fps
    at B=16 (5.07 ms/frame) on the v5e: the batched pipeline's wall is MXU
    issue rate, and the int8 MXU path doubles it."""
    B = planar_b_i8.shape[0]
    if B > MB_CHUNK:
        pad = (-B) % MB_CHUNK
        pb = jnp.pad(planar_b_i8, ((0, pad),) + ((0, 0),) * 4)
        chunks = pb.reshape((B + pad) // MB_CHUNK, MB_CHUNK, *pb.shape[1:])
        out = jax.lax.map(
            lambda ch: composite_mat2_planar_batched(
                ch, ml, interpret=interpret, fused_dma=fused_dma,
                vy_bf16=vy_bf16, mm_int8=mm_int8),
            chunks)
        return out.reshape(B + pad, *out.shape[2:])[:B]

    Tg = -(-ml.n_tiles // GROUP) + (1 if ml.scratch_slot else 0)
    frames_sh = (shift_planar_bn(planar_b_i8, interpret=interpret)
                 if fused_dma else jax.vmap(shift_planar)(planar_b_i8))
    # NOTE: blocks stay f32 — a (B=MB_CHUNK, P) block is exactly full f32
    # (8,128) tiles; bf16-quantized blocks (half a (16,128) tile per write)
    # measured SLOWER (138 vs 147 fps) despite halving the bytes, because
    # every block write became a read-modify-write of the containing tile.
    if ml.tg_hard > 0:
        out = _class_call_batched(frames_sh, ml.hard, WIN_HH, Tg, B,
                                  None, interpret, fused_dma,
                                  vy_bf16=vy_bf16, mm_int8=mm_int8)
        if ml.tg_easy > 0:
            out = _class_call_batched(frames_sh, ml.easy, WIN_HE, Tg, B,
                                      out, interpret, fused_dma,
                                      vy_bf16=vy_bf16, mm_int8=mm_int8)
    else:
        out = _class_call_batched(frames_sh, ml.easy, WIN_HE, Tg, B,
                                  None, interpret, fused_dma,
                                  vy_bf16=vy_bf16, mm_int8=mm_int8)

    nty, ntx = ml.grid_hw
    Hp, Wp = ml.pano_hw
    # [3, T_alloc, B, P] -> [B, 3, T, P]
    out = out.transpose(2, 0, 1, 3)
    if ml.n_fb:
        vals = jax.vmap(_fallback_values, in_axes=(0, None))(planar_b_i8, ml)
        cur = out[:, :, ml.fb_tid, :]
        merged = jnp.where(ml.fb_valid[None, None, :, None], vals, cur)
        out = out.at[:, :, ml.fb_tid, :].set(merged)
    out = out[:, :, :ml.n_tiles]
    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out.reshape(B, 3, nty, ntx, TILE_H, TILE_W) \
              .transpose(0, 1, 2, 4, 3, 5) \
              .reshape(B, 3, nty * TILE_H, ntx * TILE_W)[:, :, :Hp, :Wp]


@partial(jax.jit, static_argnames=("pieces", "interpret"))
def composite_mat2_planar_pieces(planar_i8: jnp.ndarray, ml: MatLUT2,
                                 pieces: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """[N, 3, H, W] int8 frames (value-128) + a materialize2_used LUT over a
    concat_tiled_luts window stack -> [pieces, 3, Hb, Wb] bfloat16 warped
    windows (u8-quantized values, gain and the folded coverage mask applied;
    uncovered pixels are exactly 0).

    The multiband video path's warp stage: int8 window DMAs, short easy
    windows (vs the plain tiled kernel's bf16 frames + tall windows), and the
    used-groups compaction skip the (many) fully-uncovered window tiles. The
    output is zero-initialized so skipped groups read as uncovered."""
    Tg = -(-ml.n_tiles // GROUP) + (1 if ml.scratch_slot else 0)
    frames_sh = shift_planar(planar_i8)
    zeros = jnp.zeros((3, Tg, GPAD, P), jnp.float32)
    if ml.tg_hard > 0:
        out = _class_call(frames_sh, ml.hard, WIN_HH, Tg, zeros, interpret)
        if ml.tg_easy > 0:
            out = _class_call(frames_sh, ml.easy, WIN_HE, Tg, out, interpret)
    else:
        out = _class_call(frames_sh, ml.easy, WIN_HE, Tg, zeros, interpret)

    TgR = -(-ml.n_tiles // GROUP)     # drop the scratch block before untiling
    out = out[:, :TgR, :GROUP, :].reshape(3, TgR * GROUP, P)
    if ml.n_fb:
        # overflow tiles (strong local warp curvature): exact-gather overlay,
        # same as the pano path
        vals = _fallback_values(planar_i8, ml)
        cur = out[:, ml.fb_tid, :]
        merged = jnp.where(ml.fb_valid[None, :, None], vals, cur)
        out = out.at[:, ml.fb_tid, :].set(merged)
    out = out[:, :ml.n_tiles]
    nty_all, ntx = ml.grid_hw
    nty = nty_all // pieces
    res = out.reshape(3, pieces, nty, ntx, TILE_H, TILE_W) \
             .transpose(1, 0, 2, 4, 3, 5) \
             .reshape(pieces, 3, nty * TILE_H, ntx * TILE_W)
    # same u8 quantization as the gather reference (0..255 ints are exact in
    # bfloat16), kept bf16 for the downstream pyramid chain
    return jnp.clip(jnp.round(res), 0, 255).astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("pieces", "interpret", "fused_dma"))
def composite_mat2_planar_pieces_batched(planar_b_i8: jnp.ndarray,
                                         ml: MatLUT2, pieces: int,
                                         interpret: bool = False,
                                         fused_dma: bool = True
                                         ) -> jnp.ndarray:
    """Micro-batched composite_mat2_planar_pieces: [B, N, 3, H, W] int8 ->
    [B, pieces, 3, Hb, Wb] bf16, per frame bit-identical to the single-frame
    variant: the kernel quantizes (round-half-even + clamp to 0..255) BEFORE
    the bf16 block write, and integers 0..255 are exact in bf16, so the
    narrower output blocks lose nothing. B frames stack into the matmul M
    dimension exactly as in composite_mat2_planar_batched — the multiband
    video path's warp stage at serving batch sizes."""
    B = planar_b_i8.shape[0]
    if B > MB_CHUNK:
        pad = (-B) % MB_CHUNK
        pb = jnp.pad(planar_b_i8, ((0, pad),) + ((0, 0),) * 4)
        chunks = pb.reshape((B + pad) // MB_CHUNK, MB_CHUNK, *pb.shape[1:])
        out = jax.lax.map(
            lambda ch: composite_mat2_planar_pieces_batched(
                ch, ml, pieces, interpret=interpret, fused_dma=fused_dma),
            chunks)
        return out.reshape(B + pad, *out.shape[2:])[:B]

    Tg = -(-ml.n_tiles // GROUP) + (1 if ml.scratch_slot else 0)
    frames_sh = (shift_planar_bn(planar_b_i8, interpret=interpret)
                 if fused_dma else jax.vmap(shift_planar)(planar_b_i8))
    bf = jnp.bfloat16
    zeros = jnp.zeros((3, Tg * GROUP, B, P), bf)
    if ml.tg_hard > 0:
        out = _class_call_batched(frames_sh, ml.hard, WIN_HH, Tg, B,
                                  zeros, interpret, fused_dma, out_dtype=bf,
                                  quantize=True, mm_int8=True)
        if ml.tg_easy > 0:
            out = _class_call_batched(frames_sh, ml.easy, WIN_HE, Tg, B,
                                      out, interpret, fused_dma,
                                      out_dtype=bf, quantize=True,
                                      mm_int8=True)
    else:
        out = _class_call_batched(frames_sh, ml.easy, WIN_HE, Tg, B,
                                  zeros, interpret, fused_dma, out_dtype=bf,
                                  quantize=True, mm_int8=True)

    TgR = -(-ml.n_tiles // GROUP)
    # [3, T_alloc, B, P] -> [B, 3, T, P]; kernel blocks are already
    # quantized (exact 0..255 integers in bf16), so no post-round is needed
    out = out.transpose(2, 0, 1, 3)[:, :, :TgR * GROUP]
    if ml.n_fb:
        vals = jax.vmap(_fallback_values, in_axes=(0, None))(planar_b_i8, ml)
        # quantize fallback values the same way before the bf16 cast
        vals = jnp.clip(jnp.round(vals), 0, 255).astype(bf)
        cur = out[:, :, ml.fb_tid, :]
        merged = jnp.where(ml.fb_valid[None, None, :, None], vals, cur)
        out = out.at[:, :, ml.fb_tid, :].set(merged)
    out = out[:, :, :ml.n_tiles]
    nty_all, ntx = ml.grid_hw
    nty = nty_all // pieces
    return out.reshape(B, 3, pieces, nty, ntx, TILE_H, TILE_W) \
              .transpose(0, 2, 1, 3, 5, 4, 6) \
              .reshape(B, pieces, 3, nty * TILE_H, ntx * TILE_W)
