"""Gaussian/Laplacian pyramids with OpenCV 5-tap kernel parity.

Parity target: cv::pyrDown/pyrUp as used by MultiBandBlender
(reference src/blenders.cpp:189-377, createLaplacePyr :435-489,
restoreImageFromLaplacePyr :520-530). Kernel = [1 4 6 4 1]/16 separable,
BORDER_REFLECT_101 edges; pyrUp uses the same kernel scaled by 4 over a
zero-stuffed upsample. Sizes are kept even (the blender pads its ROI to a
multiple of 2^num_bands) so shapes stay static and exact.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .filters import sep_filter2d

_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Blur + decimate by 2. img [H,W(,C)] with H, W even."""
    blurred = sep_filter2d(img, _K5, _K5)
    return blurred[::2, ::2]


def pyr_up(img: jnp.ndarray) -> jnp.ndarray:
    """Zero-stuff upsample x2 + blur with 4*kernel."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    up = jnp.zeros((H * 2, W * 2, C), img.dtype)
    up = up.at[::2, ::2].set(img)
    out = sep_filter2d(up, _K5 * 2.0, _K5 * 2.0)
    return out[..., 0] if squeeze else out


def gaussian_pyramid(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """[img, down1, ..., down_levels] (levels+1 entries)."""
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def laplacian_pyramid(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """Laplacian pyramid: levels band-pass images + final low-pass.

    Parity: createLaplacePyr (blenders.cpp:435-489).
    """
    pyr = gaussian_pyramid(img, levels)
    out = []
    for i in range(levels):
        out.append(pyr[i] - pyr_up(pyr[i + 1]))
    out.append(pyr[levels])
    return out


def collapse_laplacian(pyr: List[jnp.ndarray]) -> jnp.ndarray:
    """Inverse of laplacian_pyramid (restoreImageFromLaplacePyr)."""
    img = pyr[-1]
    for lvl in reversed(pyr[:-1]):
        img = pyr_up(img) + lvl
    return img
