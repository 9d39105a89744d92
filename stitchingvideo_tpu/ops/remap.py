"""Generic remap (arbitrary backward-map resampling) on TPU via XLA gather.

Parity target: cv::remap as used by the reference's warpers
(reference warpers_inl.hpp:63-99: INTER_LINEAR + BORDER_REFLECT for images,
INTER_NEAREST + BORDER_CONSTANT for masks) and the RT driver's cached-LUT
hot loop (64-bit driver stitching_detailed.cpp:150-177).

Implementation notes (TPU-first):
  * The four bilinear taps are gathered from a flattened [H*W, C] image with
    jnp.take — XLA lowers this to a dynamic-gather; static shapes throughout.
  * Border handling is done by index remapping (reflect/replicate/wrap) or by
    zero-masking tap weights (constant), never by data-dependent branching.
  * For the per-frame composite hot loop there is a fused multi-camera variant
    in ops/pallas/composite.py; this module is the reference implementation
    and the registration-time path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BORDER_CONSTANT = "constant"
BORDER_REPLICATE = "replicate"
BORDER_REFLECT = "reflect"        # fedcba|abcdefgh|hgfedcb  (cv::BORDER_REFLECT)
BORDER_REFLECT101 = "reflect101"  # gfedcb|abcdefgh|gfedcba  (cv::BORDER_REFLECT_101)
BORDER_WRAP = "wrap"


def _map_index(idx: jnp.ndarray, size: int, border: str) -> jnp.ndarray:
    """Map possibly out-of-range integer indices into [0, size) per border mode."""
    if border == BORDER_CONSTANT:
        # caller masks weights; clamp only for memory safety
        return jnp.clip(idx, 0, size - 1)
    if border == BORDER_REPLICATE:
        return jnp.clip(idx, 0, size - 1)
    if border == BORDER_REFLECT:
        # period 2*size: ... 1 0 | 0 1 .. s-1 | s-1 s-2 ...
        m = jnp.mod(idx, 2 * size)
        return jnp.where(m < size, m, 2 * size - 1 - m)
    if border == BORDER_REFLECT101:
        if size == 1:
            return jnp.zeros_like(idx)
        m = jnp.mod(idx, 2 * (size - 1))
        return jnp.where(m < size, m, 2 * (size - 1) - m)
    if border == BORDER_WRAP:
        return jnp.mod(idx, size)
    raise ValueError(f"unknown border mode {border}")


@partial(jax.jit, static_argnames=("interp", "border"))
def remap(image: jnp.ndarray, xmap: jnp.ndarray, ymap: jnp.ndarray,
          interp: str = "linear", border: str = BORDER_CONSTANT,
          cval: float = 0.0) -> jnp.ndarray:
    """Sample `image` at float coordinates (xmap, ymap).

    image: [H, W] or [H, W, C]; xmap/ymap: [...out] float32.
    Returns [...out] or [...out, C] with image dtype preserved for float inputs
    (uint8 inputs are computed in float32 then rounded back).
    """
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    H, W, C = image.shape
    in_dtype = image.dtype
    img = image.astype(jnp.float32).reshape(H * W, C)

    x = jnp.asarray(xmap, jnp.float32)
    y = jnp.asarray(ymap, jnp.float32)
    out_shape = x.shape

    if interp == "nearest":
        # cv::INTER_NEAREST rounds half up on positive coords
        xi = jnp.floor(x + 0.5).astype(jnp.int32)
        yi = jnp.floor(y + 0.5).astype(jnp.int32)
        if border == BORDER_CONSTANT:
            inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            vals = jnp.take(img, flat.reshape(-1), axis=0).reshape(*out_shape, C)
            out = jnp.where(inside[..., None], vals, cval)
        else:
            flat = _map_index(yi, H, border) * W + _map_index(xi, W, border)
            out = jnp.take(img, flat.reshape(-1), axis=0).reshape(*out_shape, C)
    elif interp == "linear":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        acc = jnp.zeros((*out_shape, C), jnp.float32)
        wsum = jnp.zeros(out_shape, jnp.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = (fx if dx else (1.0 - fx)) * (fy if dy else (1.0 - fy))
                xi = x0i + dx
                yi = y0i + dy
                if border == BORDER_CONSTANT:
                    inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                    wgt = jnp.where(inside, wgt, 0.0)
                    flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
                else:
                    flat = _map_index(yi, H, border) * W + _map_index(xi, W, border)
                vals = jnp.take(img, flat.reshape(-1), axis=0).reshape(*out_shape, C)
                acc = acc + wgt[..., None] * vals
                wsum = wsum + wgt
        if border == BORDER_CONSTANT:
            out = acc + (1.0 - wsum)[..., None] * cval
        else:
            out = acc
    else:
        raise ValueError(f"unknown interp {interp}")

    if jnp.issubdtype(in_dtype, jnp.integer):
        info = jnp.iinfo(in_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max).astype(in_dtype)
    else:
        out = out.astype(in_dtype)
    if squeeze:
        out = out[..., 0]
    return out
