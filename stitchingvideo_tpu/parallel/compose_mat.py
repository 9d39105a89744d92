"""Multi-chip sharding of the materialized composite kernel.

The MatLUT is tile-group-major and tiles are canvas-row-major, so sharding
the group axis across the 'canvas' mesh axis gives each chip a horizontal
band of the panorama: its weight stream, window DMAs, matmuls, and un-tiling
are all band-local — ZERO collectives in the hot loop (SURVEY §2.3: every
output pixel is an independent gather; frames replicate, strips concatenate
logically in HBM).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas.composite_mat import MatLUT, composite_mat_planar


def shard_mat_lut(mlut: MatLUT, mesh: Mesh) -> MatLUT:
    """Place MatLUT arrays group-sharded over the canvas axis.

    Requires Tg (and the flat scalar arrays) divisible by the canvas axis
    size — pad the panorama height accordingly (TILE_H * GROUP rows per
    group-row; in practice pad Tg to a multiple of n_devices at build).
    """
    g1 = NamedSharding(mesh, P("canvas"))
    g3 = NamedSharding(mesh, P("canvas", None, None))
    return MatLUT(
        vx=jax.device_put(mlut.vx, g3),
        vy=jax.device_put(mlut.vy, g3),
        gcs=jax.device_put(mlut.gcs, g3),
        tile_cam=jax.device_put(mlut.tile_cam, g1),
        tile_org=jax.device_put(mlut.tile_org, g1),
        tile_band=jax.device_put(mlut.tile_band, g1),
        n_fallback=jax.device_put(mlut.n_fallback, NamedSharding(mesh, P())),
        grid_hw=mlut.grid_hw, pano_hw=mlut.pano_hw, frame_hw=mlut.frame_hw,
        n_tiles=mlut.n_tiles)


def sharded_composite_mat_fn(mesh: Mesh, mlut: MatLUT, interpret: bool = False):
    """shard_map'd hot loop: frames replicated, panorama row-band sharded.

    Returns f(planar_i8 [N,3,H,W], sharded_mlut) -> [3, Hp_pad, Wp] uint8
    with rows sharded over 'canvas'. Each shard runs the full Pallas kernel
    on its tile-group slice; no communication.
    """
    ndev = mesh.shape["canvas"]
    Tg = mlut.vx.shape[0]
    if Tg % ndev != 0:
        raise ValueError(f"Tg={Tg} not divisible by canvas={ndev}")
    nty, ntx = mlut.grid_hw

    def local(planar, vx, vy, gcs, tcam, torg, tband, nfb):
        from ..ops.pallas.composite_mat import GROUP, TILE_H
        lml = MatLUT(vx=vx, vy=vy, gcs=gcs, tile_cam=tcam, tile_org=torg,
                     tile_band=tband, n_fallback=nfb,
                     grid_hw=(nty // ndev, ntx),
                     pano_hw=(nty // ndev * TILE_H, mlut.pano_hw[1]),
                     frame_hw=mlut.frame_hw,
                     n_tiles=Tg // ndev * GROUP)
        return composite_mat_planar(planar, lml, interpret=interpret)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("canvas", None, None), P("canvas", None, None),
                  P("canvas", None, None), P("canvas"), P("canvas"),
                  P("canvas"), P()),
        out_specs=P(None, "canvas", None),
        # pallas_call out_shapes don't carry vma annotations yet
        check_vma=False,
    )

    def run(planar_i8, sharded):
        return f(planar_i8, sharded.vx, sharded.vy, sharded.gcs,
                 sharded.tile_cam, sharded.tile_org, sharded.tile_band,
                 sharded.n_fallback)

    return jax.jit(run)
