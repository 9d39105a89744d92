"""Rotation warping: ROI detection, backward-map rasterization, image warping.

Parity target: RotationWarperBase<P>::buildMaps/warp/warpRoi/detectResultRoi
(reference warpers_inl.hpp:63-203) and SphericalWarper's pole-aware ROI
(reference src/warpers.cpp:171-212).

Host/device split: ROI detection runs on host (numpy) at registration time so
all downstream shapes are static; map rasterization and remap run on device.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import remap as remap_mod
from . import projections as proj


@partial(jax.jit, static_argnames=("kind", "w", "h"))
def _roi_scan(kind: str, scale, r_kinv, w: int, h: int):
    """Full-grid forward extrema in ONE compiled dispatch (an eager scan
    issues ~20 device round-trips per camera)."""
    gx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    gy = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
    u, v = proj.map_forward(kind, scale, r_kinv, gx.reshape(-1), gy.reshape(-1))
    return jnp.stack([u.min(), u.max(), v.min(), v.max()])


def _extend_for_poles(kind: str, scale: float, k_rinv: np.ndarray,
                      w: int, h: int, tl_v: float, br_v: float):
    """Spherical pole visibility: pano-frame pole rays (0, ±1, 0) projected
    through k_rinv; if inside the source image, extend v to the projection's
    natural bounds [0, scale*pi] (src/warpers.cpp:171-212)."""
    if kind != "spherical":
        return tl_v, br_v
    for pole_dir, extend_to in (((0.0, -1.0, 0.0), 0.0),
                                ((0.0, 1.0, 0.0), float(np.pi) * scale)):
        p = k_rinv @ np.asarray(pole_dir, np.float32)
        if p[2] > 0:
            px, py = p[0] / p[2], p[1] / p[2]
            if 0 <= px < w and 0 <= py < h:
                tl_v = min(tl_v, extend_to)
                br_v = max(br_v, extend_to)
    return tl_v, br_v


def detect_result_roi(kind: str, scale: float, K: np.ndarray, R: np.ndarray,
                      src_size: Tuple[int, int],
                      grid_step: int = 1) -> Tuple[int, int, int, int]:
    """(tl_x, tl_y, br_x, br_y) of the warped image footprint (inclusive br
    convention matches the reference's +1 sizing: width = br_x - tl_x + 1).

    Generic path scans the full source grid like
    RotationWarperBase::detectResultRoi (warpers_inl.hpp:144-163); spherical
    additionally extends for visible poles (src/warpers.cpp:171-212).
    """
    del grid_step  # full-grid scan is one fused device reduction
    w, h = src_size
    r_kinv, k_rinv = proj.camera_maps(np.asarray(K, np.float32), np.asarray(R, np.float32))
    ext = np.asarray(_roi_scan(kind, float(scale), jnp.asarray(r_kinv), w, h))
    tl_u, br_u, tl_v, br_v = float(ext[0]), float(ext[1]), float(ext[2]), float(ext[3])
    tl_v, br_v = _extend_for_poles(kind, scale, np.asarray(k_rinv), w, h,
                                   tl_v, br_v)
    # C-style static_cast<int> truncation toward zero on all four bounds —
    # exact detectResultRoi parity (warpers_inl.hpp:158-162); the +1 sizing
    # downstream covers the truncated fraction.
    return (int(tl_u), int(tl_v), int(br_u), int(br_v))


@partial(jax.jit, static_argnames=("kind", "w", "h"))
def _roi_scan_batch(kind: str, scale, r_kinvs, w: int, h: int):
    """[n, 3, 3] -> [n, 4] forward extrema, one dispatch for all cameras."""
    return jax.vmap(lambda rk: _roi_scan(kind, scale, rk, w, h))(r_kinvs)


def _np_camera_maps(Ks, Rs):
    """Host 3x3 camera matrices (numpy): (r_kinv, k_rinv) stacks. Matches
    proj.camera_maps without a device dispatch per camera — registration
    calls this 2n times per pass, which on the remote relay costs a round
    trip each (the reason detect_result_roi_batch exists)."""
    Ks = np.asarray(Ks, np.float32)
    Rs = np.asarray(Rs, np.float32)
    Kinv = np.linalg.inv(Ks)
    return Rs @ Kinv, Ks @ np.swapaxes(Rs, -1, -2)


def detect_result_roi_batch(kind: str, scale: float, Ks, Rs, src_sizes):
    """detect_result_roi for n cameras with ONE device dispatch + ONE fetch
    (vs n of each): src_sizes is a list of (w, h). Falls back to per-camera
    scans when source sizes differ (the batched grid needs one static
    shape). Returns a list of (tl_x, tl_y, br_x, br_y)."""
    if len(set(src_sizes)) != 1:
        return [detect_result_roi(kind, scale, K, R, s)
                for K, R, s in zip(Ks, Rs, src_sizes)]
    w, h = src_sizes[0]
    r_kinvs, k_rinvs = _np_camera_maps(np.stack(Ks), np.stack(Rs))
    ext = np.asarray(_roi_scan_batch(kind, float(scale),
                                     jnp.asarray(r_kinvs), w, h))
    rois = []
    for i in range(len(src_sizes)):
        tl_u, br_u, tl_v, br_v = (float(ext[i, 0]), float(ext[i, 1]),
                                  float(ext[i, 2]), float(ext[i, 3]))
        tl_v, br_v = _extend_for_poles(kind, scale, k_rinvs[i], w, h,
                                       tl_v, br_v)
        rois.append((int(tl_u), int(tl_v), int(br_u), int(br_v)))
    return rois


@partial(jax.jit, static_argnames=("kind", "shape"))
def rasterize_backward_map(kind: str, scale, k_rinv: jnp.ndarray,
                           corner_xy: jnp.ndarray, shape: Tuple[int, int]):
    """Backward map (xmap, ymap) over a dst window of static `shape` (h, w)
    whose top-left panorama coordinate is `corner_xy` (may be traced).

    Parity: RotationWarperBase::buildMaps (warpers_inl.hpp:63-85).
    """
    h, w = shape
    v = jnp.arange(h, dtype=jnp.float32)[:, None] + corner_xy[1]
    u = jnp.arange(w, dtype=jnp.float32)[None, :] + corner_xy[0]
    uu = jnp.broadcast_to(u, (h, w))
    vv = jnp.broadcast_to(v, (h, w))
    x, y, valid = proj.map_backward(kind, scale, k_rinv, uu, vv)
    return x, y, valid


def build_maps(kind: str, scale: float, K, R, src_size: Tuple[int, int],
               pad_to: Tuple[int, int] | None = None):
    """ROI + backward maps for one camera.

    Returns (corner=(tl_x, tl_y), (xmap, ymap, valid)) where maps have shape
    (br_y-tl_y+1, br_x-tl_x+1), optionally zero-padded to `pad_to` (static
    shape across re-registrations; SURVEY §7.3 'Dynamic output ROI').
    """
    tl_x, tl_y, br_x, br_y = detect_result_roi(kind, scale, np.asarray(K), np.asarray(R), src_size)
    h = br_y - tl_y + 1
    w = br_x - tl_x + 1
    if pad_to is not None:
        h, w = max(h, pad_to[0]), max(w, pad_to[1])
        if (h, w) != pad_to:
            raise ValueError(f"ROI {h}x{w} exceeds pad_to {pad_to}")
        h, w = pad_to
    _, k_rinv = proj.camera_maps(np.asarray(K, np.float32), np.asarray(R, np.float32))
    xmap, ymap, valid = rasterize_backward_map(
        kind, scale, jnp.asarray(k_rinv), jnp.asarray([tl_x, tl_y], jnp.float32), (h, w))
    return (tl_x, tl_y), (xmap, ymap, valid)


def warp_image(image, kind: str, scale: float, K, R,
               interp: str = "linear", border: str = "reflect",
               pad_to: Tuple[int, int] | None = None):
    """Warp a full image; returns (corner, warped).

    Parity: RotationWarperBase::warp (warpers_inl.hpp:88-99) — builds maps then
    remaps. Border modes as the reference compositing loop uses them
    (CLI driver :710-716): images LINEAR/REFLECT, masks NEAREST/CONSTANT.
    """
    H, W = image.shape[:2]
    corner, (xmap, ymap, valid) = build_maps(kind, scale, K, R, (W, H), pad_to=pad_to)
    out = remap_mod.remap(jnp.asarray(image), xmap, ymap, interp=interp, border=border)
    if border == "constant":
        # invalid (behind-camera) pixels are already sentinel (-1,-1) -> cval=0
        pass
    return corner, out


def warp_point(kind: str, scale: float, K, R, x: float, y: float):
    r_kinv, _ = proj.camera_maps(np.asarray(K, np.float32), np.asarray(R, np.float32))
    u, v = proj.map_forward(kind, scale, jnp.asarray(r_kinv), np.float32(x), np.float32(y))
    return float(u), float(v)


def warp_roi(kind: str, scale: float, K, R, src_size: Tuple[int, int]):
    """Rect (x, y, w, h) of the warped footprint (warpers_inl.hpp:131-141)."""
    tl_x, tl_y, br_x, br_y = detect_result_roi(kind, scale, np.asarray(K), np.asarray(R), src_size)
    return tl_x, tl_y, br_x - tl_x + 1, br_y - tl_y + 1
