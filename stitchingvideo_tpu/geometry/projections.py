"""Rotation-warper projection family: forward/backward maps, pure jnp.

Parity target: the 15 projection types of the reference's rotation warpers
(reference include/opencv2/stitching/detail/warpers.hpp:122-501,
warpers_inl.hpp:207-765, src/warpers.cpp:50-78). The math here was derived from
the standard Brown–Lowe rotation-camera model and validated numerically against
cv2.PyRotationWarper (tests/test_projections.py), NOT transcribed from the
reference source.

Conventions (validated against OpenCV):
  setCameraParams: r_kinv = R @ K^-1, k_rinv = K @ R^T   (warpers.cpp:50-78)
  forward:  (x, y) source px -> ray = r_kinv @ (x, y, 1) -> (u, v) = scale * P(ray)
  backward: (u, v) -> ray = P^-1(u/scale, v/scale) -> p = k_rinv @ ray;
            (x, y) = (p.x/p.z, p.y/p.z) if p.z > 0 else (-1, -1)

Ray parameterization used by the curved projections: lon = atan2(x_, z_)
(angle about the vertical +y axis), and w = y_/|ray| = sin(lat) with +lat
pointing down (image +y). All functions are shape-polymorphic over x/y and
differentiable; vmap over a camera axis for batched use.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

PROJECTION_KINDS = (
    "plane", "cylindrical", "spherical", "fisheye", "stereographic",
    "compressedPlaneA2B1", "compressedPlaneA1.5B1",
    "compressedPlanePortraitA2B1", "compressedPlanePortraitA1.5B1",
    "paniniA2B1", "paniniA1.5B1", "paniniPortraitA2B1", "paniniPortraitA1.5B1",
    "mercator", "transverseMercator",
)

_AB = {
    "compressedPlaneA2B1": (2.0, 1.0),
    "compressedPlaneA1.5B1": (1.5, 1.0),
    "compressedPlanePortraitA2B1": (2.0, 1.0),
    "compressedPlanePortraitA1.5B1": (1.5, 1.0),
    "paniniA2B1": (2.0, 1.0),
    "paniniA1.5B1": (1.5, 1.0),
    "paniniPortraitA2B1": (2.0, 1.0),
    "paniniPortraitA1.5B1": (1.5, 1.0),
}

_EPS = 1e-12


def camera_maps(K: jnp.ndarray, R: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(r_kinv, k_rinv) for one or a batch of cameras.

    K: [...,3,3], R: [...,3,3] -> r_kinv = R @ K^-1, k_rinv = K @ R^T.
    """
    K = jnp.asarray(K, jnp.float32)
    R = jnp.asarray(R, jnp.float32)
    Kinv = jnp.linalg.inv(K)
    r_kinv = R @ Kinv
    k_rinv = K @ jnp.swapaxes(R, -1, -2)
    return r_kinv, k_rinv


def _apply33(M: jnp.ndarray, x, y, z):
    """Apply a 3x3 to homogeneous coords; broadcasts over point shape."""
    X = M[..., 0, 0] * x + M[..., 0, 1] * y + M[..., 0, 2] * z
    Y = M[..., 1, 0] * x + M[..., 1, 1] * y + M[..., 1, 2] * z
    Z = M[..., 2, 0] * x + M[..., 2, 1] * y + M[..., 2, 2] * z
    return X, Y, Z


def _lonw(x_, y_, z_):
    lon = jnp.arctan2(x_, z_)
    norm = jnp.sqrt(x_ * x_ + y_ * y_ + z_ * z_)
    w = jnp.clip(y_ / jnp.maximum(norm, _EPS), -1.0, 1.0)
    return lon, w


# ---------------------------------------------------------------------------
# Per-kind ray -> (u, v) in unscaled units, and inverse (u, v) -> ray.
# ---------------------------------------------------------------------------

def _fwd(kind: str, x_, y_, z_):
    if kind == "plane":
        zz = jnp.where(jnp.abs(z_) < _EPS, _EPS, z_)
        return x_ / zz, y_ / zz
    lon, w = _lonw(x_, y_, z_)
    if kind == "spherical":
        return lon, jnp.pi - jnp.arccos(w)
    if kind == "cylindrical":
        rh = jnp.sqrt(jnp.maximum(x_ * x_ + z_ * z_, _EPS))
        return lon, y_ / rh
    if kind == "fisheye":
        r = jnp.pi - jnp.arccos(w)
        return r * jnp.cos(lon), r * jnp.sin(lon)
    if kind == "stereographic":
        theta = jnp.arccos(w)          # angle from +y axis
        r = jnp.tan(theta * 0.5)       # == sin(v_)/(1-cos(v_)) with v_ = pi - theta
        return r * jnp.cos(lon), r * jnp.sin(lon)
    if kind == "mercator":
        wc = jnp.clip(w, -1.0 + 1e-7, 1.0 - 1e-7)
        return lon, jnp.arctanh(wc)
    if kind == "transverseMercator":
        lat = jnp.arcsin(w)
        B = jnp.clip(jnp.cos(lat) * jnp.sin(lon), -1.0 + 1e-7, 1.0 - 1e-7)
        return jnp.arctanh(B), jnp.arctan2(jnp.tan(lat), jnp.cos(lon))
    if kind.startswith("compressedPlanePortrait") or kind.startswith("paniniPortrait"):
        # Portrait: axes swapped, then u negated (validated vs cv2.PyRotationWarper).
        base = "compressedPlane" if kind.startswith("compressedPlane") else "panini"
        a, b = _AB[kind]
        U, V = _fwd_ab(base, a, b, y_, x_, z_)
        return -U, V
    if kind.startswith("compressedPlane") or kind.startswith("panini"):
        base = "compressedPlane" if kind.startswith("compressedPlane") else "panini"
        a, b = _AB[kind]
        return _fwd_ab(base, a, b, x_, y_, z_)
    raise ValueError(f"unknown projection kind: {kind}")


def _fwd_ab(base: str, a: float, b: float, x_, y_, z_):
    lon, w = _lonw(x_, y_, z_)
    lat = jnp.arcsin(w)
    if base == "compressedPlane":
        u = a * jnp.tan(lon / a)
        v = b * jnp.tan(lat / b) / jnp.cos(lon)
        return u, v
    if base == "panini":
        tg = a * jnp.tan(lon / a)
        sinu = jnp.sin(lon)
        small = jnp.abs(sinu) < 1e-7
        # lim tg/sin(lon) as lon->0 is 1, so v -> b*tan(lat/b)
        ratio = jnp.where(small, 1.0, tg / jnp.where(small, 1.0, sinu))
        v = b * jnp.tan(lat / b) * ratio
        return tg, v
    raise ValueError(base)


def _bwd(kind: str, u, v):
    """(u, v) unscaled -> ray (x_, y_, z_). May return non-unit rays."""
    if kind == "plane":
        return u, v, jnp.ones_like(u)
    if kind == "spherical":
        sinv = jnp.sin(jnp.pi - v)
        return sinv * jnp.sin(u), jnp.cos(jnp.pi - v), sinv * jnp.cos(u)
    if kind == "cylindrical":
        return jnp.sin(u), v, jnp.cos(u)
    if kind == "fisheye":
        r = jnp.sqrt(u * u + v * v)
        lon = jnp.arctan2(v, u)
        # forward: r = pi - theta (theta from +y); so theta = pi - r
        theta = jnp.pi - r
        st = jnp.sin(theta)
        return st * jnp.sin(lon), jnp.cos(theta), st * jnp.cos(lon)
    if kind == "stereographic":
        r = jnp.sqrt(u * u + v * v)
        lon = jnp.arctan2(v, u)
        theta = 2.0 * jnp.arctan(r)
        st = jnp.sin(theta)
        return st * jnp.sin(lon), jnp.cos(theta), st * jnp.cos(lon)
    if kind == "mercator":
        lat = jnp.arcsin(jnp.tanh(v))
        return _ray_lonlat(u, lat)
    if kind == "transverseMercator":
        lon = jnp.arctan2(jnp.sinh(u), jnp.cos(v))
        lat = jnp.arcsin(jnp.clip(jnp.sin(v) / jnp.cosh(u), -1.0, 1.0))
        return _ray_lonlat(lon, lat)
    if kind.startswith("compressedPlanePortrait") or kind.startswith("paniniPortrait"):
        base = "compressedPlane" if kind.startswith("compressedPlane") else "panini"
        a, b = _AB[kind]
        y_, x_, z_ = _bwd_ab(base, a, b, -u, v)
        return x_, y_, z_
    if kind.startswith("compressedPlane") or kind.startswith("panini"):
        base = "compressedPlane" if kind.startswith("compressedPlane") else "panini"
        a, b = _AB[kind]
        return _bwd_ab(base, a, b, u, v)
    raise ValueError(f"unknown projection kind: {kind}")


def _ray_lonlat(lon, lat):
    cl = jnp.cos(lat)
    return cl * jnp.sin(lon), jnp.sin(lat), cl * jnp.cos(lon)


def _bwd_ab(base: str, a: float, b: float, u, v):
    if base == "compressedPlane":
        lon = a * jnp.arctan(u / a)
        lat = b * jnp.arctan(v * jnp.cos(lon) / b)
        return _ray_lonlat(lon, lat)
    if base == "panini":
        lon = a * jnp.arctan(u / a)
        sinu = jnp.sin(lon)
        small = jnp.abs(sinu) < 1e-7
        tg = u
        ratio = jnp.where(small, 1.0, jnp.where(small, 1.0, sinu) / jnp.where(jnp.abs(tg) < _EPS, _EPS, tg))
        ratio = jnp.where(small, 1.0, ratio)
        lat = b * jnp.arctan(v * ratio / b)
        return _ray_lonlat(lon, lat)
    raise ValueError(base)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def map_forward(kind: str, scale, r_kinv: jnp.ndarray, x, y, t=None):
    """Source pixel (x, y) -> panorama plane (u, v).

    Parity: RotationWarperBase<P>::warpPoint / P::mapForward
    (reference warpers_inl.hpp:63-99, :207-300).
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    one = jnp.ones_like(x)
    x_, y_, z_ = _apply33(r_kinv, x, y, one)
    if kind == "plane" and t is not None:
        zz = jnp.where(jnp.abs(z_) < _EPS, _EPS, z_)
        u = t[0] + x_ / zz * (1 - t[2])
        v = t[1] + y_ / zz * (1 - t[2])
        return scale * u, scale * v
    u, v = _fwd(kind, x_, y_, z_)
    return scale * u, scale * v


def map_backward(kind: str, scale, k_rinv: jnp.ndarray, u, v, t=None):
    """Panorama (u, v) -> source pixel (x, y); invalid (behind camera) -> (-1, -1).

    Parity: P::mapBackward (reference warpers_inl.hpp:222-300).
    """
    u = jnp.asarray(u, jnp.float32) / scale
    v = jnp.asarray(v, jnp.float32) / scale
    if kind == "plane" and t is not None:
        u = (u - t[0]) / (1 - t[2])
        v = (v - t[1]) / (1 - t[2])
    x_, y_, z_ = _bwd(kind, u, v)
    px, py, pz = _apply33(k_rinv, x_, y_, z_)
    valid = pz > 0
    pz_safe = jnp.where(jnp.abs(pz) < _EPS, _EPS, pz)
    x = jnp.where(valid, px / pz_safe, -1.0)
    y = jnp.where(valid, py / pz_safe, -1.0)
    return x, y, valid


def uv_range(kind: str) -> Tuple[Tuple[float, float], Tuple[float, float]]:
    """Natural (unscaled) (u, v) bounds of the projection where bounded.

    Used by ROI detection for pole handling (spherical v in [0, pi]).
    """
    if kind == "spherical":
        return (-math.pi, math.pi), (0.0, math.pi)
    if kind == "cylindrical":
        return (-math.pi, math.pi), (-math.inf, math.inf)
    if kind == "mercator":
        return (-math.pi, math.pi), (-math.inf, math.inf)
    return (-math.inf, math.inf), (-math.inf, math.inf)
