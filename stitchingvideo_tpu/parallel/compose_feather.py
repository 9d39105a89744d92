"""Multi-chip sharding of the feather-blend hot-loop kernel.

FeatherMatLUT is tile-group-major with output blocks placed by grid
position (composite_feather.py), so canvas row bands are plain contiguous
slices of every array — a leading [ndev] axis sharded over 'canvas' with no
pad-group indirection. Only the fallback arrays need per-band bucketing to
a uniform count (pad entries are fb_valid=False self-writes), exactly like
parallel/compose_mat2.py. Zero collectives in the hot loop.
"""
from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas.composite import TILE_H
from ..ops.pallas.composite_feather import (GROUP, FeatherMatLUT,
                                            composite_feather_planar)
from .compose_mat2 import band_fallback


@flax.struct.dataclass
class ShardedFeather:
    """Per-band FeatherMatLUT components on a leading [ndev] axis."""
    vx: jnp.ndarray
    vy: jnp.ndarray
    gws: jnp.ndarray
    tile_cam: jnp.ndarray
    tile_org: jnp.ndarray
    tile_band: jnp.ndarray
    fb_tid: jnp.ndarray
    fb_valid: jnp.ndarray
    fb_cam: jnp.ndarray
    fb_sx: jnp.ndarray
    fb_sy: jnp.ndarray
    fb_gw: jnp.ndarray
    grid_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    pano_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    frame_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    n_tiles: int = flax.struct.field(pytree_node=False)
    n_fb: int = flax.struct.field(pytree_node=False)
    ndev: int = flax.struct.field(pytree_node=False)


def pad_blend_rows_for_shards(blut, n_shards: int,
                              tile_h: int = TILE_H, tile_w: int = 128,
                              group: int = GROUP):
    """Pad the blend LUT with inactive rows (cam=-1, gw=0) so the tile grid
    splits into n_shards equal row bands of whole GROUPs."""
    H, W = blut.shape
    ntx = -(-W // tile_w)
    k = -(-(-(-H // tile_h)) // n_shards)
    while (k * ntx) % group != 0:
        k += 1
    Hp = k * n_shards * tile_h
    if Hp == H:
        return blut
    pad = ((0, Hp - H), (0, 0))

    def padf(a, fill):
        return jnp.pad(a, pad, constant_values=fill)

    import dataclasses as _dc
    return _dc.replace(
        blut,
        cam_a=padf(blut.cam_a, -1), sx_a=padf(blut.sx_a, 0.0),
        sy_a=padf(blut.sy_a, 0.0), gw_a=padf(blut.gw_a, 0.0),
        cam_b=padf(blut.cam_b, -1), sx_b=padf(blut.sx_b, 0.0),
        sy_b=padf(blut.sy_b, 0.0), gw_b=padf(blut.gw_b, 0.0))


def shard_feather_lut(ml: FeatherMatLUT, mesh: Mesh) -> ShardedFeather:
    """Split a FeatherMatLUT into ndev equal row bands, canvas-sharded."""
    ndev = mesh.shape["canvas"]
    nty, ntx = ml.grid_hw
    if nty % ndev != 0:
        raise ValueError(f"nty={nty} not divisible by canvas={ndev}")
    ntyb = nty // ndev
    T_b = ntyb * ntx
    if T_b % GROUP != 0:
        raise ValueError(f"band tiles {T_b} not a GROUP multiple")
    if ml.n_tiles != nty * ntx:
        raise ValueError("pad the blend LUT rows first "
                         f"({ml.n_tiles} vs {nty * ntx})")
    Tg = ml.vx.shape[0]
    Tgb = Tg // ndev
    Hp, Wp = ml.pano_hw

    def bands(a, per_group: int):
        # flat per-tile arrays [Tg*GROUP*k] -> [ndev, Tgb*GROUP*k]
        return a.reshape(ndev, Tgb * GROUP * per_group)

    Ppix = ml.fb_cam.shape[-1] if ml.fb_cam.size else TILE_H * 128
    fb_u, fb_tid_l, fb_valid_l, \
        (fb_cam_l, fb_sx_l, fb_sy_l, fb_gw_l) = band_fallback(
            ml.fb_tid, int(ml.n_fallback), ndev, T_b,
            (ml.fb_cam, ml.fb_sx, ml.fb_sy, ml.fb_gw),
            (((2, Ppix), jnp.int32), ((2, Ppix), jnp.float32),
             ((2, Ppix), jnp.float32), ((2, Ppix), jnp.float32)))

    def put(a):
        spec = P(*(("canvas",) + (None,) * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return ShardedFeather(
        vx=put(ml.vx.reshape((ndev, Tgb) + ml.vx.shape[1:])),
        vy=put(ml.vy.reshape((ndev, Tgb) + ml.vy.shape[1:])),
        gws=put(ml.gws.reshape((ndev, Tgb) + ml.gws.shape[1:])),
        tile_cam=put(bands(ml.tile_cam, 2)),
        tile_org=put(bands(ml.tile_org, 4)),
        tile_band=put(bands(ml.tile_band, 2)),
        fb_tid=put(fb_tid_l), fb_valid=put(fb_valid_l), fb_cam=put(fb_cam_l),
        fb_sx=put(fb_sx_l), fb_sy=put(fb_sy_l), fb_gw=put(fb_gw_l),
        grid_hw=(ntyb, ntx), pano_hw=(ntyb * TILE_H, Wp),
        frame_hw=ml.frame_hw, n_tiles=T_b, n_fb=fb_u, ndev=ndev)


def sharded_composite_feather_fn(mesh: Mesh, sf: ShardedFeather,
                                 interpret: bool = False):
    """shard_map'd feather hot loop: frames replicated, panorama row-band
    sharded. Returns f(planar_i8, ShardedFeather) -> [3, Hp_pad, Wp] u8."""
    meta = dict(grid_hw=sf.grid_hw, pano_hw=sf.pano_hw, frame_hw=sf.frame_hw,
                n_tiles=sf.n_tiles, n_fb=sf.n_fb)

    def local(planar, *bandargs):
        (vx, vy, gws, tcam, torg, tband,
         fb_tid, fb_valid, fb_cam, fb_sx, fb_sy, fb_gw) = \
            (a[0] for a in bandargs)
        lml = FeatherMatLUT(
            vx=vx, vy=vy, gws=gws, tile_cam=tcam.reshape(-1),
            tile_org=torg.reshape(-1), tile_band=tband.reshape(-1),
            n_fallback=fb_valid.sum().astype(jnp.int32),
            fb_tid=fb_tid, fb_valid=fb_valid, fb_cam=fb_cam,
            fb_sx=fb_sx, fb_sy=fb_sy, fb_gw=fb_gw, **meta)
        return composite_feather_planar(planar, lml, interpret=interpret)

    fields = ("vx", "vy", "gws", "tile_cam", "tile_org", "tile_band",
              "fb_tid", "fb_valid", "fb_cam", "fb_sx", "fb_sy", "fb_gw")
    specs = (P(),) + tuple(
        P(*(("canvas",) + (None,) * (getattr(sf, f).ndim - 1)))
        for f in fields)

    f = jax.shard_map(local, mesh=mesh, in_specs=specs,
                      out_specs=P(None, "canvas", None), check_vma=False)

    def run(planar_i8, s: ShardedFeather):
        return f(planar_i8, *(getattr(s, fd) for fd in fields))

    return jax.jit(run)
