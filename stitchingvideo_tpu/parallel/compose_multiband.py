"""Multi-chip sharding of the multiband video blend.

Sharding axis: the VIRTUAL-CAMERA (window piece) axis. The multiband frame
path (blend/multiband_video.py) stacks each camera's seam-owned footprint
into a window [CHb, Wb]; the warp LUT over the stacked windows is
tile-row-major with pieces as contiguous row bands, so piece-sharding IS
the row-band sharding compose_mat2.py already implements — each device
warps and pyramids only its own pieces. Unlike the seam-select and feather
hot loops (pure gathers, zero collectives) the multiband chain must SUM
per-piece contributions on shared band canvases: each device accumulates
its local partial canvases and a single psum over the 'canvas' mesh axis
(pytree of all band levels + the level-0 canvas, one collective phase per
frame riding ICI) produces the replicated canvases; the cheap collapse
runs replicated. Requires Nv % ndev == 0 — build_multiband_state pads with
empty pieces (pad_pieces_to=ndev).

Parity: local accumulation runs on align-padded [CHb, CWb] grids and is
cropped to the true [CHp>>l, CWp>>l] canvases BEFORE the psum/collapse, so
the collapse math is exactly the single-device path's.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..blend.multiband import WEIGHT_EPS
from ..blend.multiband_video import MultibandVideoState, _bblur_up
from ..ops import pyramid_planar as ppyr
from ..ops.pallas.composite_mat2 import composite_mat2_planar_pieces
from .compose_mat2 import (MAT2_BAND_FIELDS, local_mat2_lut, mat2_band_meta,
                           shard_mat2_lut)


@flax.struct.dataclass
class ShardedMultiband:
    """Piece-sharded multiband state: warp LUT row-banded per piece group,
    masks/pyramids on a leading [ndev] axis, canvas reciprocals replicated."""
    warp: object                 # ShardedMat2 over the window stack
    m0: jnp.ndarray              # [ndev, Pd, CHb, Wb] bf16
    gm: Tuple                    # per level [ndev, Pd, h, w]
    recip: Tuple                 # per level [hl, wl] f32, replicated
    piece_ax: jnp.ndarray        # [ndev, Pd] int32 window column origins
    canvas_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    buf_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    pad_w: int = flax.struct.field(pytree_node=False)   # CWb (>= CWp)
    out_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    bands: int = flax.struct.field(pytree_node=False)
    ndev: int = flax.struct.field(pytree_node=False)
    pd: int = flax.struct.field(pytree_node=False)


def shard_multiband_state(st: MultibandVideoState,
                          mesh: Mesh) -> ShardedMultiband:
    """Split a MultibandVideoState into per-device piece groups."""
    pad_w = st.pad_w
    if not pad_w:
        raise ValueError("state predates pad_w — rebuild it")
    ndev = mesh.shape["canvas"]
    Nv = len(st.piece_cam)
    if Nv % ndev != 0:
        raise ValueError(f"Nv={Nv} pieces not divisible by canvas={ndev} "
                         "(build_multiband_state(pad_pieces_to=ndev))")
    pd = Nv // ndev

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec))

    def band(a):
        return put(a.reshape((ndev, pd) + a.shape[1:]),
                   P(*(("canvas",) + (None,) * a.ndim)))

    import numpy as np
    return ShardedMultiband(
        warp=shard_mat2_lut(st.warp_lut, mesh),
        m0=band(st.m0),
        gm=tuple(band(g) for g in st.gm),
        recip=tuple(put(r, P()) for r in st.recip),
        piece_ax=put(jnp.asarray(
            np.asarray(st.piece_ax, np.int32).reshape(ndev, pd)),
            P("canvas", None)),
        canvas_hw=st.canvas_hw, buf_hw=st.buf_hw, pad_w=pad_w,
        out_hw=st.out_hw, bands=st.bands, ndev=ndev, pd=pd)


def _acc_add(acc: jnp.ndarray, val: jnp.ndarray, col: jnp.ndarray):
    """acc[..., :, col:col+wb] += val with a traced column start (the piece
    origins differ per device under SPMD). col <= acc_w - wb by
    construction, so the dynamic slice never clamps."""
    start = (0,) * (acc.ndim - 1) + (col,)
    cur = jax.lax.dynamic_slice(acc, start, val.shape)
    return jax.lax.dynamic_update_slice(acc, cur + val, start)


def sharded_multiband_fn(mesh: Mesh, smb: ShardedMultiband,
                         crop_yx: Tuple[int, int] = (0, 0),
                         interpret: bool = False):
    """shard_map'd multiband frame: frames replicated in, panorama
    replicated out, ONE psum phase of band canvases between. Returns
    f(planar_i8 [N,3,H,W], ShardedMultiband) -> [3, outH, outW] uint8."""
    meta = mat2_band_meta(smb.warp)
    CHp, CWp = smb.canvas_hw
    CHb, Wb = smb.buf_hw
    CWb = smb.pad_w
    bands_n = smb.bands
    pd = smb.pd
    oy, ox = crop_yx
    oh, ow = smb.out_hw

    def local(planar, m0, axs, gm, recip, *warp_args):
        m0, axs = m0[0], axs[0]
        gm = [g[0] for g in gm]        # 0-based by level, like st.gm
        lml = local_mat2_lut(warp_args, meta)
        x = composite_mat2_planar_pieces(planar, lml, pd,
                                         interpret=interpret)
        # [Pd, 3, CHb, Wb] bf16 — this device's windows only
        gp = ppyr.gaussian_pyramid_p(x.reshape(pd * 3, CHb, Wb), bands_n)
        norms = [None]
        for lvl in range(1, bands_n + 1):
            gi = gp[lvl].reshape(pd, 3, CHb >> lvl, Wb >> lvl)
            norms.append((gi / jnp.maximum(gm[lvl], WEIGHT_EPS)[:, None])
                         .astype(jnp.bfloat16))

        band = []
        for lvl in range(1, bands_n + 1):
            if lvl < bands_n:
                up = _bblur_up(norms[lvl + 1].reshape(
                    pd * 3, CHb >> (lvl + 1), Wb >> (lvl + 1))) \
                    .reshape(pd, 3, CHb >> lvl, Wb >> lvl)
                lap = norms[lvl].astype(jnp.float32) - up
            else:
                lap = norms[bands_n].astype(jnp.float32)
            contrib = lap * gm[lvl][:, None]
            acc = jnp.zeros((3, CHb >> lvl, CWb >> lvl), jnp.float32)
            for p in range(pd):
                acc = _acc_add(acc, contrib[p], axs[p] >> lvl)
            # crop to the TRUE canvas before the psum: collapse math below
            # then equals the single-device path exactly
            band.append(acc[:, :CHp >> lvl, :CWp >> lvl])

        u_all = _bblur_up(norms[1].reshape(pd * 3, CHb >> 1, Wb >> 1)) \
            .reshape(pd, 3, CHb, Wb) * m0[:, None].astype(jnp.float32)
        d_all = x.astype(jnp.float32) - u_all
        B0 = jnp.zeros((3, CHb, CWb), jnp.float32)
        for p in range(pd):
            B0 = _acc_add(B0, d_all[p], axs[p])
        B0 = B0[:, :CHp, :CWp]

        # ---- the one collective phase: sum partial canvases over pieces
        band, B0 = jax.lax.psum((band, B0), "canvas")

        # ---- replicated collapse (identical to multiband_video_frame)
        C = band[-1] * recip[bands_n][None]
        for lvl in range(bands_n - 1, 0, -1):
            C = ppyr.pyr_up_p(C) + band[lvl - 1] * recip[lvl][None]
        pano = B0 * recip[0][None] + ppyr.pyr_up_p(C)
        out = jax.lax.dynamic_slice(pano, (jnp.int32(0), oy, ox),
                                    (3, oh, ow))
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    n_gm = len(smb.gm)
    n_recip = len(smb.recip)
    warp_specs = tuple(
        P(*(("canvas",) + (None,) * (getattr(smb.warp, f).ndim - 1)))
        for f in MAT2_BAND_FIELDS)
    specs = (P(),                                    # planar (replicated)
             P("canvas", None, None, None),          # m0
             P("canvas", None),                      # piece_ax
             ) + (P("canvas", None, None, None),) * n_gm \
        + (P(),) * n_recip + warp_specs

    def wrapped(planar, m0, axs, *rest):
        gm = rest[:n_gm]
        recip = list(rest[n_gm:n_gm + n_recip])
        warp_args = rest[n_gm + n_recip:]
        return local(planar, m0, axs, gm, recip, *warp_args)

    f = jax.shard_map(wrapped, mesh=mesh, in_specs=specs,
                      out_specs=P(), check_vma=False)

    def run(planar_i8, s: ShardedMultiband):
        return f(planar_i8, s.m0, s.piece_ax, *s.gm,
                 *s.recip, *(getattr(s.warp, fd) for fd in MAT2_BAND_FIELDS))

    return jax.jit(run)
