"""Sharded compose + registration collectives.

Hot path (SURVEY §2.3, §5.7-8): LUT columns and the output panorama shard over
the 'canvas' mesh axis; camera frames replicate (small: N x 1080p). Every
output pixel is an independent gather, so the hot loop runs with ZERO
collectives — strips ride their own chip and concatenate logically in HBM.

Registration fan-out: per-camera compute shards over the 'camera' axis with a
psum for the cross-camera gain statistics — the only ICI traffic, exactly
where the reference had its one cross-thread reduction (exposure feed).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..video.lut import CompositeLUT, composite_frame_u8


def shard_lut(lut: CompositeLUT, mesh: Mesh) -> CompositeLUT:
    """Place LUT arrays column-sharded over the canvas axis."""
    s2 = NamedSharding(mesh, P(None, "canvas"))
    return CompositeLUT(
        cam_idx=jax.device_put(lut.cam_idx, s2),
        src_x=jax.device_put(lut.src_x, s2),
        src_y=jax.device_put(lut.src_y, s2),
        gain=jax.device_put(lut.gain, s2),
    )


def sharded_composite_fn(mesh: Mesh):
    """jit'd hot loop with canvas-column output sharding.

    frames: [N, H, W, 3] replicated; lut: column-sharded; out: column-sharded.
    """
    repl = NamedSharding(mesh, P())
    col2 = NamedSharding(mesh, P(None, "canvas"))
    col3 = NamedSharding(mesh, P(None, "canvas", None))
    lut_sh = CompositeLUT(cam_idx=col2, src_x=col2, src_y=col2, gain=col2)
    return jax.jit(composite_frame_u8,
                   in_shardings=(repl, lut_sh),
                   out_shardings=col3)


@partial(jax.jit, static_argnames=("mesh_axis",))
def _psum_gain_stats(lum_masked, mask, mesh_axis):
    """Per-shard partial gain statistics reduced over ICI (shard_map body)."""
    Npart = jax.lax.dot_general(mask, mask, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    Ipart = jax.lax.dot_general(lum_masked, mask, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return (jax.lax.psum(Npart, mesh_axis), jax.lax.psum(Ipart, mesh_axis))


def gain_stats_sharded(mesh: Mesh, lum: jnp.ndarray, mask: jnp.ndarray):
    """Cross-camera overlap statistics with canvas pixels sharded over chips.

    lum/mask: [N, P] (P = canvas pixels). Each chip reduces its pixel strip;
    one psum over 'canvas' yields the global N(i,j)/Isum(i,j) matrices.
    """
    f = jax.shard_map(
        lambda l, m: _psum_gain_stats(l, m, "canvas"),
        mesh=mesh,
        in_specs=(P(None, "canvas"), P(None, "canvas")),
        out_specs=(P(), P()),
    )
    return f(lum * mask, mask)
