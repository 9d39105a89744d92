"""Tiled Pallas remap for single images: the registration-time warp path.

Reuses the composite kernel (composite.py) with a one-camera LUT — any smooth
backward map (rotation warps, undistortion, map compositions) runs at MXU
speed instead of XLA gather. Non-smooth or out-of-window maps fall back to
ops/remap.py automatically (build returns fallback tiles > 0).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .composite import build_tiled_lut, composite_tiled


def remap_tiled(image: jnp.ndarray, xmap: jnp.ndarray, ymap: jnp.ndarray,
                valid: Optional[jnp.ndarray] = None,
                interpret: bool = False) -> Optional[jnp.ndarray]:
    """Bilinear remap of one [H, W, 3] uint8 image via the MXU kernel.

    Returns None when the map is not tile-representable (caller should use
    ops.remap.remap). Out-of-source or invalid pixels come back as 0
    (border-constant semantics).
    """
    from ...video.lut import CompositeLUT

    H, W = image.shape[:2]
    x = jnp.asarray(xmap, jnp.float32)
    y = jnp.asarray(ymap, jnp.float32)
    inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    if valid is not None:
        inb = inb & valid
    cam = jnp.where(inb, 0, -1).astype(jnp.int32)
    lut = CompositeLUT(cam_idx=cam,
                       src_x=jnp.where(inb, x, 0.0),
                       src_y=jnp.where(inb, y, 0.0),
                       gain=jnp.ones_like(x))
    try:
        tlut = build_tiled_lut(lut, (H, W))
    except ValueError:
        return None
    if int(tlut.n_fallback) != 0:
        return None
    return composite_tiled(image[None], tlut, interpret=interpret)
