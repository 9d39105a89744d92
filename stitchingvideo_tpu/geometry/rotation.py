"""Rotation utilities: Rodrigues vector <-> matrix, numerically safe under jit.

Replaces the reference's uses of `cv::Rodrigues` (e.g. bundle adjustment
parameterization, reference src/motion_estimators.cpp:445-581). Small-angle
branches are handled with Taylor-safe `where` masking, not control flow, so the
functions are differentiable and jittable.
"""
from __future__ import annotations

import jax.numpy as jnp


def rodrigues_to_matrix(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3]."""
    rvec = jnp.asarray(rvec)
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)  # [...,1]
    small = theta[..., 0] < 1e-8
    # Safe normalized axis.
    axis = rvec / jnp.where(theta < 1e-8, 1.0, theta)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)  # [...,3,3]
    th = theta[..., None]  # [...,1,1]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    R = eye + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K)
    # Small-angle: R ≈ I + skew(rvec)
    rx, ry, rz = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    Ksmall = jnp.stack([
        jnp.stack([zero, -rz, ry], axis=-1),
        jnp.stack([rz, zero, -rx], axis=-1),
        jnp.stack([-ry, rx, zero], axis=-1),
    ], axis=-2)
    return jnp.where(small[..., None, None], eye + Ksmall, R)


def matrix_to_rodrigues(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3]."""
    R = jnp.asarray(R)
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Off-diagonal antisymmetric part.
    v = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)  # = 2 sin(theta) * axis
    sin_theta = jnp.sin(theta)
    generic = v * (theta / jnp.where(jnp.abs(sin_theta) < 1e-7, 1.0, 2.0 * sin_theta))[..., None]
    small = theta < 1e-6
    near_pi = theta > jnp.pi - 1e-3
    # Near pi: axis from diagonal of (R + I)/2 = aa^T style extraction.
    A = (R + jnp.eye(3, dtype=R.dtype)) * 0.5
    diag = jnp.clip(jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1), 0.0, 1.0)
    axis_abs = jnp.sqrt(diag)
    # Fix signs using largest component as positive anchor.
    k = jnp.argmax(axis_abs, axis=-1)
    def signed_axis(axis_abs, A, k):
        idx = k[..., None]
        row = jnp.take_along_axis(A, idx[..., None] * jnp.ones((1, 3), jnp.int32), axis=-2)[..., 0, :]
        anchor = jnp.take_along_axis(axis_abs, idx, axis=-1)
        sgn = jnp.sign(jnp.where(jnp.abs(row) < 1e-12, 1e-12, row))
        ax = axis_abs * sgn
        # ensure anchor component positive
        anchor_sign = jnp.take_along_axis(sgn, idx, axis=-1)
        return ax * anchor_sign
    axis_pi = signed_axis(axis_abs, A, k)
    axis_pi = axis_pi / jnp.maximum(jnp.linalg.norm(axis_pi, axis=-1, keepdims=True), 1e-12)
    out = jnp.where(small[..., None], v * 0.5,
                    jnp.where(near_pi[..., None], axis_pi * theta[..., None], generic))
    return out
