"""Multi-chip sharding of the mat2 (two-class) composite kernel.

The shipped default hot loop is `composite_mat2_planar` (easy/hard window
classes + exact-gather fallback overlay). This module row-band-shards it
over the 'canvas' mesh axis so the product multichip mode runs the FASTEST
kernel, fallback tiles included — no demotion to the slower 'mat' kernel and
no whole-canvas demotion when a LUT has fallback tiles (VERDICT r2 item 5).

How the banding works: tiles are canvas-row-major and tile GROUPs are
contiguous runs of tiles, so a horizontal band of the panorama is a
contiguous range of group ids; each band's rows are gathered from the
global class arrays by gid-range membership (the rows are NOT globally
gid-ascending — easy counts bucket down, pushing leftover easy groups in
front of the hard class — so membership, not run-slicing, is the rule).
Per-band class counts differ (top/bottom bands have more hard groups), so
each band's slice is padded to a uniform bucketed count with PAD groups:
a pad group duplicates a real group's row but its gid points at a dedicated
scratch output block (MatLUT2.scratch_slot) — its DMAs read valid frame
memory and its writes land in the throwaway block. Same scheme for the
fallback arrays (pad entries are fb_valid=False self-writes). The per-band
kernels are then shape-identical => one SPMD program under shard_map, zero
collectives in the hot loop (every output pixel is an independent gather;
SURVEY §2.3).
"""
from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas.composite import TILE_H
from ..ops.pallas.composite_mat2 import (FB_BUCKET, GROUP, ClassLUT, MatLUT2,
                                         composite_mat2_planar)

CLASS_BUCKET = 16   # per-band class-group-count granularity (compile cache)


@flax.struct.dataclass
class ShardedMat2:
    """Per-band MatLUT2 components stacked on a leading [ndev] axis (sharded
    over 'canvas'). Static meta describes ONE band's local LUT."""
    e_vx: jnp.ndarray       # [ndev, tgE, GROUP*VXW, P] int8
    e_vy: jnp.ndarray
    e_gcs: jnp.ndarray
    e_cam: jnp.ndarray      # [ndev, tgE, GROUP*2] int32
    e_org: jnp.ndarray      # [ndev, tgE, GROUP*4]
    e_band: jnp.ndarray     # [ndev, tgE, GROUP*2]
    e_gid: jnp.ndarray      # [ndev, tgE] local gid (tg_band = scratch)
    h_vx: jnp.ndarray
    h_vy: jnp.ndarray
    h_gcs: jnp.ndarray
    h_cam: jnp.ndarray
    h_org: jnp.ndarray
    h_band: jnp.ndarray
    h_gid: jnp.ndarray
    fb_tid: jnp.ndarray     # [ndev, fb_u] local tile ids
    fb_valid: jnp.ndarray
    fb_cam: jnp.ndarray     # [ndev, fb_u, P]
    fb_sx: jnp.ndarray
    fb_sy: jnp.ndarray
    fb_gain: jnp.ndarray
    grid_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    pano_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    frame_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    n_tiles: int = flax.struct.field(pytree_node=False)   # per band
    tg_easy: int = flax.struct.field(pytree_node=False)   # per band (uniform)
    tg_hard: int = flax.struct.field(pytree_node=False)
    n_fb: int = flax.struct.field(pytree_node=False)
    ndev: int = flax.struct.field(pytree_node=False)


def _uniform_count(gids: np.ndarray, ndev: int, per_band: int,
                   bucket: int, cap: int) -> int:
    """Smallest bucketed per-band row count covering every band."""
    if len(gids) == 0:
        return 0
    need = int(np.bincount(gids // per_band, minlength=ndev)[:ndev].max())
    if need == 0:
        return 0
    return min(-(-need // bucket) * bucket, cap)


def _band_slices(gids: np.ndarray, ndev: int, per_band: int, tgc_u: int):
    """[ndev, tgc_u] row indices into a class array + pad mask.

    Band b's rows are wherever gid // per_band == b — NO ordering assumption
    on gids: the hard class is [leftover-easy gids asc] ++ [hard gids asc]
    (easy counts bucket DOWN in _materialize2, composite_mat2.py:176), so
    class rows are NOT globally ascending and a contiguous-run slice here
    composed garbage bands. Pads duplicate the band's first row (or global
    row 0 for an empty band)."""
    bands = gids // per_band
    idx = np.zeros((ndev, tgc_u), np.int32)
    pad = np.ones((ndev, tgc_u), bool)
    for b in range(ndev):
        rows = np.flatnonzero(bands == b).astype(np.int32)
        c = len(rows)
        idx[b, :c] = rows
        idx[b, c:] = rows[0] if c else 0
        pad[b, :c] = False
    return idx, pad


def band_fallback(fb_tid_full, n_fb_real: int, ndev: int, band_tiles: int,
                  arrays, tails, bucket: int = FB_BUCKET):
    """Bucket per-tile fallback entries into ndev uniform-count row bands.

    Shared by the mat2 and feather sharded kernels — the banding rule
    (membership by tile id, pad entries as fb_valid=False self-writes) must
    stay identical between them. `arrays` are the per-entry payloads
    [n_fb_real(+), ...]; `tails` is a matching list of (tail_shape, dtype)
    used to build empty results. Returns
    (fb_u, fb_tid_local [ndev, fb_u] i32, fb_valid [ndev, fb_u] bool,
     banded arrays [ndev, fb_u, *tail])."""
    if n_fb_real:
        fb_tid = np.asarray(fb_tid_full)[:n_fb_real].astype(np.int64)
        fb_u = _uniform_count(fb_tid, ndev, band_tiles, bucket, band_tiles)
        fb_idx, fb_pad = _band_slices(fb_tid, ndev, band_tiles, fb_u)
        ffi = jnp.asarray(fb_idx.reshape(-1))
        taken = [jnp.take(a, ffi, axis=0).reshape((ndev, fb_u) + a.shape[1:])
                 for a in arrays]
        tid_band = (fb_tid[fb_idx]
                    - np.arange(ndev)[:, None] * band_tiles).astype(np.int32)
        # pad entries self-write (merged = cur), but the overlay scatter is
        # duplicate-index last-wins — a pad aimed at a REAL fallback tile
        # would restore that tile's stale pre-overlay value. Aim each band's
        # pads at a tile id the band's real entries don't use (one always
        # exists: a fully-fallback band has no pads).
        for b in range(ndev):
            if not fb_pad[b].any():
                continue
            used = set(tid_band[b, ~fb_pad[b]].tolist())
            free = next(t for t in range(band_tiles) if t not in used)
            tid_band[b, fb_pad[b]] = free
        return fb_u, jnp.asarray(tid_band), jnp.asarray(~fb_pad), taken
    zeros = [jnp.zeros((ndev, 0) + tuple(t), d) for t, d in tails]
    return (0, jnp.zeros((ndev, 0), jnp.int32),
            jnp.zeros((ndev, 0), bool), zeros)


def shard_mat2_lut(ml: MatLUT2, mesh: Mesh) -> ShardedMat2:
    """Split a global MatLUT2 into ndev shape-identical row-band LUTs and
    place them canvas-sharded. Requires the panorama rows padded so the tile
    grid splits into equal whole-GROUP bands (pad_lut_rows_for_shards)."""
    ndev = mesh.shape["canvas"]
    nty, ntx = ml.grid_hw
    if nty % ndev != 0:
        raise ValueError(f"nty={nty} not divisible by canvas={ndev}")
    ntyb = nty // ndev
    if (ntyb * ntx) % GROUP != 0:
        raise ValueError(f"band tiles {ntyb * ntx} not a GROUP multiple")
    T_b = ntyb * ntx                       # tiles per band
    tg_band = T_b // GROUP                 # groups per band
    Hp, Wp = ml.pano_hw
    if ml.n_tiles != nty * ntx:
        raise ValueError("sharding requires a grid-filling tile count "
                         f"({ml.n_tiles} vs {nty * ntx}) — pad the LUT rows")

    e_gid = np.asarray(ml.easy.gid).astype(np.int64)
    h_gid = np.asarray(ml.hard.gid).astype(np.int64)
    tgE = _uniform_count(e_gid, ndev, tg_band, CLASS_BUCKET, tg_band)
    tgH = _uniform_count(h_gid, ndev, tg_band, CLASS_BUCKET, tg_band)

    def split_class(cl: ClassLUT, gids: np.ndarray, tgc: int):
        ncl = int(cl.gid.shape[0])
        vx2 = cl.vx
        vy2 = cl.vy
        gcs2 = cl.gcs
        cam2 = cl.tile_cam.reshape(ncl, GROUP * 2)
        org2 = cl.tile_org.reshape(ncl, GROUP * 4)
        band2 = cl.tile_band.reshape(ncl, GROUP * 2)
        if tgc == 0:
            def z(a):
                return jnp.zeros((ndev, 0) + a.shape[1:], a.dtype)
            return (z(vx2), z(vy2), z(gcs2), z(cam2), z(org2), z(band2),
                    jnp.zeros((ndev, 0), jnp.int32))
        idx, pad = _band_slices(gids, ndev, tg_band, tgc)
        fidx = jnp.asarray(idx.reshape(-1))

        def take(a):
            return jnp.take(a, fidx, axis=0).reshape((ndev, tgc)
                                                     + a.shape[1:])

        gid_l = jnp.asarray(
            np.where(pad, tg_band,
                     gids[idx] - np.arange(ndev)[:, None] * tg_band)
            .astype(np.int32))
        return (take(vx2), take(vy2), take(gcs2), take(cam2), take(org2),
                take(band2), gid_l)

    e_vx, e_vy, e_gcs, e_cam, e_org, e_band, e_gid_l = \
        split_class(ml.easy, e_gid, tgE)
    h_vx, h_vy, h_gcs, h_cam, h_org, h_band, h_gid_l = \
        split_class(ml.hard, h_gid, tgH)

    # fallback tiles: banded by tile-id membership (shared helper)
    Ppix = ml.fb_cam.shape[1] if ml.fb_cam.size else TILE_H * 128
    fb_u, fb_tid_l, fb_valid_l, \
        (fb_cam_l, fb_sx_l, fb_sy_l, fb_gain_l) = band_fallback(
            ml.fb_tid, int(ml.n_fallback), ndev, T_b,
            (ml.fb_cam, ml.fb_sx, ml.fb_sy, ml.fb_gain),
            (((Ppix,), jnp.int32), ((Ppix,), jnp.float32),
             ((Ppix,), jnp.float32), ((Ppix,), jnp.float32)))

    def put(a):
        spec = P(*(("canvas",) + (None,) * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return ShardedMat2(
        e_vx=put(e_vx), e_vy=put(e_vy), e_gcs=put(e_gcs), e_cam=put(e_cam),
        e_org=put(e_org), e_band=put(e_band), e_gid=put(e_gid_l),
        h_vx=put(h_vx), h_vy=put(h_vy), h_gcs=put(h_gcs), h_cam=put(h_cam),
        h_org=put(h_org), h_band=put(h_band), h_gid=put(h_gid_l),
        fb_tid=put(fb_tid_l), fb_valid=put(fb_valid_l), fb_cam=put(fb_cam_l),
        fb_sx=put(fb_sx_l), fb_sy=put(fb_sy_l), fb_gain=put(fb_gain_l),
        grid_hw=(ntyb, ntx), pano_hw=(ntyb * TILE_H, Wp),
        frame_hw=ml.frame_hw, n_tiles=T_b, tg_easy=tgE, tg_hard=tgH,
        n_fb=fb_u, ndev=ndev)


MAT2_BAND_FIELDS = (
    "e_vx", "e_vy", "e_gcs", "e_cam", "e_org", "e_band", "e_gid",
    "h_vx", "h_vy", "h_gcs", "h_cam", "h_org", "h_band", "h_gid",
    "fb_tid", "fb_valid", "fb_cam", "fb_sx", "fb_sy", "fb_gain")


def mat2_band_meta(sm: ShardedMat2) -> dict:
    """Static meta describing one band's local MatLUT2."""
    return dict(grid_hw=sm.grid_hw, pano_hw=sm.pano_hw,
                frame_hw=sm.frame_hw, n_tiles=sm.n_tiles,
                tg_easy=sm.tg_easy, tg_hard=sm.tg_hard,
                n_fb=sm.n_fb, scratch_slot=True)


def local_mat2_lut(bandargs, meta: dict) -> MatLUT2:
    """Rebuild this shard's local MatLUT2 inside shard_map from the
    leading-axis-[1] banded arrays (MAT2_BAND_FIELDS order)."""
    (e_vx, e_vy, e_gcs, e_cam, e_org, e_band, e_gid,
     h_vx, h_vy, h_gcs, h_cam, h_org, h_band, h_gid,
     fb_tid, fb_valid, fb_cam, fb_sx, fb_sy, fb_gain) = \
        (a[0] for a in bandargs)
    easy = ClassLUT(vx=e_vx, vy=e_vy, gcs=e_gcs,
                    tile_cam=e_cam.reshape(-1),
                    tile_org=e_org.reshape(-1),
                    tile_band=e_band.reshape(-1),
                    gid=e_gid)
    hard = ClassLUT(vx=h_vx, vy=h_vy, gcs=h_gcs,
                    tile_cam=h_cam.reshape(-1),
                    tile_org=h_org.reshape(-1),
                    tile_band=h_band.reshape(-1),
                    gid=h_gid)
    return MatLUT2(easy=easy, hard=hard,
                   n_fallback=fb_valid.sum().astype(jnp.int32),
                   fb_tid=fb_tid, fb_valid=fb_valid, fb_cam=fb_cam,
                   fb_sx=fb_sx, fb_sy=fb_sy, fb_gain=fb_gain, **meta)


def sharded_composite_mat2_fn(mesh: Mesh, sm: ShardedMat2,
                              interpret: bool = False):
    """shard_map'd mat2 hot loop: frames replicated, panorama row-band
    sharded, per-tile fallback overlay band-local. Returns
    f(planar_i8 [N,3,H,W], ShardedMat2) -> [3, Hp_pad, Wp] uint8."""
    meta = mat2_band_meta(sm)

    def local(planar, *bandargs):
        # each per-band array arrives as [1, ...]: drop the shard axis
        lml = local_mat2_lut(bandargs, meta)
        return composite_mat2_planar(planar, lml, interpret=interpret)

    fields = MAT2_BAND_FIELDS
    specs = (P(),) + tuple(
        P(*(("canvas",) + (None,) * (getattr(sm, f).ndim - 1)))
        for f in fields)

    f = jax.shard_map(
        local, mesh=mesh, in_specs=specs,
        out_specs=P(None, "canvas", None),
        check_vma=False,   # pallas_call out_shapes carry no vma annotations
    )

    def run(planar_i8, s: ShardedMat2):
        return f(planar_i8, *(getattr(s, fd) for fd in fields))

    return jax.jit(run)
