"""Fixed-point (CV_16S) image pyramids, bit-compatible with cv::pyrDown/pyrUp.

Parity target: the integer pyramid path used by MultiBandBlender's CV_16S
weight mode (reference src/blenders.cpp:189-377, createLaplacePyr :435-489,
restoreImageFromLaplacePyr :520-530). OpenCV's pyrDown/pyrUp on integer types
compute the separable [1 4 6 4 1] kernel in integer arithmetic and cast with
FixPtCast: pyrDown rounds with (acc + 128) >> 8 (2-D kernel sum 256), pyrUp
with (acc + 32) >> 6 (zero-stuffed conv, 2-D contribution sum 64). Borders are
BORDER_REFLECT_101. All shapes here are even (the blender pads every ROI to a
multiple of 2^num_bands) so each level is exactly half/double the previous.

Everything is int32 JAX so the same code is exact on CPU and TPU.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def _reflect_pad(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 pad of the two leading (H, W) axes by r."""
    pad = [(r, r), (r, r)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad, mode="reflect")


def _conv5(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """VALID conv with integer taps [1, 4, 6, 4, 1] along `axis`."""
    n = x.shape[axis] - 4

    def sl(o):
        return jax.lax.slice_in_dim(x, o, o + n, axis=axis)

    return sl(0) + 4 * sl(1) + 6 * sl(2) + 4 * sl(3) + sl(4)


def pyr_down_i16(img: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrDown on CV_16S data (values kept in int32). H, W even."""
    x = _reflect_pad(img.astype(jnp.int32), 2)
    x = _conv5(_conv5(x, 0), 1)[::2, ::2]
    return (x + 128) >> 8        # FixPtCast<int, short, 8>


def pyr_up_i16(img: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrUp on CV_16S data: zero-stuffed x2 upsample + [1 4 6 4 1] conv,
    rounded with (acc + 32) >> 6. Output is exactly 2H x 2W.

    Border quirk (verified bit-level against cv2.pyrUp): the top/left border
    is BORDER_REFLECT_101 but the bottom/right border replicates the last
    row/column (the last dst row equals the last src row exactly)."""
    x = img.astype(jnp.int32)
    pad_lo = [(1, 0), (1, 0)] + [(0, 0)] * (x.ndim - 2)
    pad_hi = [(0, 1), (0, 1)] + [(0, 0)] * (x.ndim - 2)
    x = jnp.pad(jnp.pad(x, pad_lo, mode="reflect"), pad_hi, mode="edge")
    shp = list(x.shape)
    H2 = [shp[0] * 2, shp[1] * 2]
    up = jnp.zeros(H2 + shp[2:], jnp.int32)
    up = up.at[::2, ::2].set(x)                      # up[2k] = src[k-1]
    # dst(y) = sum_i k[i]*up_global(y+i-2); up_global index -2 maps to up[0]
    out = _conv5(_conv5(up, 0), 1)
    return (out + 32) >> 6       # FixPtCast<int, short, 6>


def create_laplace_pyr_i16(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """createLaplacePyr for CV_16S input (blenders.cpp:435-489, else-branch):
    gaussian pyrDown chain, then pyr[i] -= pyrUp(pyr[i+1])."""
    g = [img.astype(jnp.int32)]
    for _ in range(levels):
        g.append(pyr_down_i16(g[-1]))
    out = [g[i] - pyr_up_i16(g[i + 1]) for i in range(levels)]
    out.append(g[levels])
    return out


def restore_laplace_i16(pyr: List[jnp.ndarray]) -> jnp.ndarray:
    """restoreImageFromLaplacePyr (blenders.cpp:520-530)."""
    img = pyr[-1]
    for lvl in reversed(pyr[:-1]):
        img = pyr_up_i16(img) + lvl
    return img


def weight_pyr_i16(weight: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """Gaussian pyramid of a CV_16S weight map (feed, blenders.cpp:285-300)."""
    g = [weight.astype(jnp.int32)]
    for _ in range(levels):
        g.append(pyr_down_i16(g[-1]))
    return g
