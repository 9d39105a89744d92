"""Lens undistortion map building (radial-tangential / fisheye).

Parity target: the RT drivers' fisheye undistortion — hard-coded intrinsics +
4 distortion coefficients, `initUndistortRectifyMap` LUT built once per
camera, applied by remap on every ingested frame (reference 64-bit driver
stitching_detailed.cpp:201-238 `RunTestEyeFishMap`; calibration data format
.../camera-mp4.yml). Unlike the reference, the LUT here is *composed* into
the warp map at registration time (video/lut.py) so the hot loop does one
gather instead of the reference's two chained remaps.

Model: OpenCV radial-tangential (k1, k2, p1, p2):
  x' = x(1 + k1 r^2 + k2 r^4) + 2 p1 x y + p2 (r^2 + 2 x^2)
  y' = y(1 + k1 r^2 + k2 r^4) + p1 (r^2 + 2 y^2) + 2 p2 x y
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import UndistortConfig


def distort_normalized(x, y, dist: Tuple[float, float, float, float]):
    """Apply the distortion model to normalized coords (ideal -> distorted)."""
    k1, k2, p1, p2 = dist
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return xd, yd


@partial(jax.jit, static_argnames=("out_hw",))
def build_undistort_map(fx, fy, cx, cy, dist, out_hw: Tuple[int, int],
                        new_fx=None, new_fy=None, new_cx=None, new_cy=None):
    """(xmap, ymap): for each undistorted output pixel, the distorted source
    pixel to sample (initUndistortRectifyMap semantics with newK=K default)."""
    H, W = out_hw
    new_fx = fx if new_fx is None else new_fx
    new_fy = fy if new_fy is None else new_fy
    new_cx = cx if new_cx is None else new_cx
    new_cy = cy if new_cy is None else new_cy
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = (u - new_cx) / new_fx
    y = (v - new_cy) / new_fy
    x = jnp.broadcast_to(x, (H, W))
    y = jnp.broadcast_to(y, (H, W))
    xd, yd = distort_normalized(x, y, tuple(dist))
    return xd * fx + cx, yd * fy + cy


def undistort_map_from_config(cfg: UndistortConfig, out_hw: Tuple[int, int]):
    return build_undistort_map(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist, out_hw)


def compose_maps(outer_x, outer_y, inner_x, inner_y):
    """Compose two backward maps: result(p) = inner(outer(p)).

    outer: warp-ROI pixel -> undistorted-frame coords;
    inner: undistorted-frame pixel -> raw-frame coords (the undistort LUT).
    Replaces the reference's chained remap(fisheye LUT) + remap(warp LUT)
    (64-bit driver :741, :752) with a single fused map.
    """
    from ..ops.remap import remap
    cx = remap(inner_x, outer_x, outer_y, interp="linear", border="replicate")
    cy = remap(inner_y, outer_x, outer_y, interp="linear", border="replicate")
    return cx, cy
