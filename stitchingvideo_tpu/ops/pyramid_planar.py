"""Planar ([C, H, W]) float pyramids built from shifted adds.

Same math as ops/pyramid.py (OpenCV 5-tap kernel, BORDER_REFLECT_101,
even sizes) in a TPU-fast formulation: ops/pyramid.py lowers the separable
filter to a depthwise conv with C=3 channels minor — a shape the TPU
backend executes at a tiny fraction of peak (measured ~3 s/frame of the
multiband video path). Here the channel axis is MAJOR, W is minor
(128-lane friendly), and each 5-tap pass is five strided-slice
multiply-adds on the VPU; the x2 zero-stuff upsample is two stack+reshape
interleaves (no scatter).
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _conv5_axis(x: jnp.ndarray, axis: int, scale: float = 1.0) -> jnp.ndarray:
    """VALID 5-tap filter along `axis` of [C, H+4?, W+4?] via shifted adds."""
    n = x.shape[axis] - 4
    sl = [slice(None)] * x.ndim

    def s(off):
        sl2 = list(sl)
        sl2[axis] = slice(off, off + n)
        return x[tuple(sl2)]

    k = _K5 * scale
    return (k[0] * s(0) + k[1] * s(1) + k[2] * s(2) + k[3] * s(3)
            + k[4] * s(4))


def _blur(x: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Separable 5-tap blur of [C, H, W], BORDER_REFLECT_101."""
    p = jnp.pad(x, ((0, 0), (2, 2), (2, 2)), mode="reflect")
    return _conv5_axis(_conv5_axis(p, 1, scale), 2, scale)


def pyr_down_p(x: jnp.ndarray) -> jnp.ndarray:
    """[C, H, W] -> [C, H//2, W//2] (H, W even)."""
    return _blur(x)[:, ::2, ::2]


def pyr_up_p(x: jnp.ndarray) -> jnp.ndarray:
    """[C, H, W] -> [C, 2H, 2W]: zero-stuff interleave + blur with 4*k."""
    C, H, W = x.shape
    z = jnp.zeros_like(x)
    a = jnp.stack([x, z], axis=3).reshape(C, H, 2 * W)
    up = jnp.stack([a, jnp.zeros_like(a)], axis=2).reshape(C, 2 * H, 2 * W)
    return _blur(up, 2.0)


def gaussian_pyramid_p(x: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    pyr = [x]
    for _ in range(levels):
        pyr.append(pyr_down_p(pyr[-1]))
    return pyr


def collapse_laplacian_p(pyr: List[jnp.ndarray]) -> jnp.ndarray:
    img = pyr[-1]
    for lvl in reversed(pyr[:-1]):
        img = pyr_up_p(img) + lvl
    return img
