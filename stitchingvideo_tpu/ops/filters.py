"""Separable filtering / morphology primitives (XLA conv-based).

TPU replacements for the cv:: filtering calls the reference leans on:
sepFilter2D (exposure_compensate.cpp:224-235), Sobel (seam_finders.cpp DP/
graph-cut gradient costs), dilate (CLI driver :726), pyrDown/pyrUp 5-tap
(blenders.cpp:435-530 — see ops/pyramid.py).

All filters use 'reflect101' edge handling (OpenCV's BORDER_DEFAULT) unless
stated, and run as depthwise convs so XLA fuses them.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pad2d(x: jnp.ndarray, ph: int, pw: int, mode: str = "reflect101") -> jnp.ndarray:
    if ph == 0 and pw == 0:
        return x
    jmode = {"reflect101": "reflect", "reflect": "symmetric", "edge": "edge",
             "constant": "constant"}[mode]
    pad = [(ph, ph), (pw, pw)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad, mode=jmode)


def sep_filter2d(img: jnp.ndarray, kx: np.ndarray, ky: np.ndarray,
                 border: str = "reflect101") -> jnp.ndarray:
    """Separable filter; img [H,W] or [H,W,C], float compute."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    kx = jnp.asarray(kx, jnp.float32).reshape(-1)
    ky = jnp.asarray(ky, jnp.float32).reshape(-1)
    rx, ry = (kx.shape[0] - 1) // 2, (ky.shape[0] - 1) // 2
    x = _pad2d(img.astype(jnp.float32), ry, rx, border)
    # NHWC depthwise conv via feature_group_count
    x = x[None]  # [1,H+2ry,W+2rx,C]
    wy = jnp.tile(ky.reshape(-1, 1, 1, 1), (1, 1, 1, C))  # HWIO depthwise
    x = jax.lax.conv_general_dilated(
        x, wy, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    wx = jnp.tile(kx.reshape(1, -1, 1, 1), (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, wx, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    out = x[0]
    return out[..., 0] if squeeze else out


def gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8  # OpenCV convention
    r = (ksize - 1) / 2
    x = np.arange(ksize) - r
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    k = gaussian_kernel(ksize, sigma)
    return sep_filter2d(img, k, k)


def sobel(img: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """3x3 Sobel derivative (cv::Sobel ksize=3 parity)."""
    smooth = np.array([1, 2, 1], np.float32)
    deriv = np.array([-1, 0, 1], np.float32)
    kx = deriv if dx else smooth
    ky = deriv if dy else smooth
    return sep_filter2d(img, kx, ky)


def box_filter(img: jnp.ndarray, ksize: int, normalize: bool = True) -> jnp.ndarray:
    k = np.ones(ksize, np.float32)
    if normalize:
        k /= ksize
    return sep_filter2d(img, k, k if not normalize else k)


@partial(jax.jit, static_argnames=("ksize", "iterations"))
def dilate(mask: jnp.ndarray, ksize: int = 3, iterations: int = 1) -> jnp.ndarray:
    """Binary/gray dilation with a ksize x ksize rect kernel (cv::dilate)."""
    x = mask.astype(jnp.float32)
    r = ksize // 2
    for _ in range(iterations):
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(ksize, ksize) + (1,) * (x.ndim - 2),
            window_strides=(1,) * x.ndim,
            padding=[(r, r), (r, r)] + [(0, 0)] * (x.ndim - 2))
    return x.astype(mask.dtype)


@partial(jax.jit, static_argnames=("ksize",))
def erode(mask: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    x = mask.astype(jnp.float32)
    r = ksize // 2
    x = jax.lax.reduce_window(
        x, jnp.inf, jax.lax.min,
        window_dimensions=(ksize, ksize) + (1,) * (x.ndim - 2),
        window_strides=(1,) * x.ndim,
        padding=[(r, r), (r, r)] + [(0, 0)] * (x.ndim - 2))
    return x.astype(mask.dtype)
