"""Homography estimation: normalized weighted DLT + transfer error.

Replaces cv::findHomography's LMeDS/RANSAC kernel as used by the reference
matcher (src/matchers.cpp:603-651). The DLT solve uses eigh of the 9x9 normal
matrix (TPU-friendly: tiny, batched) instead of an SVD of the 2M x 9 system.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalization(pts: jnp.ndarray, w: jnp.ndarray):
    """Hartley normalization transform for weighted points [M,2], w [M]."""
    wsum = jnp.maximum(w.sum(), 1e-12)
    c = (pts * w[:, None]).sum(0) / wsum
    d = jnp.sqrt(((pts - c) ** 2).sum(-1))
    mean_d = (d * w).sum() / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-12)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * c[0]).at[1, 2].set(-s * c[1])
    return T


def _normalized_pair(pts1: jnp.ndarray, pts2: jnp.ndarray, w: jnp.ndarray):
    """Apply Hartley normalization to both point sets: (p1, p2, T1, T2)."""
    T1 = _normalization(pts1, w)
    T2 = _normalization(pts2, w)
    p1 = pts1 * T1[0, 0] + T1[:2, 2][None, :]
    p2 = pts2 * T2[0, 0] + T2[:2, 2][None, :]
    return p1, p2, T1, T2


def _denormalize(Hn: jnp.ndarray, T1: jnp.ndarray, T2: jnp.ndarray):
    """p2 = T2^-1 Hn T1 p1, rescaled to H[2,2] = 1 (guarded)."""
    T2inv = jnp.array([[1.0 / T2[0, 0], 0.0, -T2[0, 2] / T2[0, 0]],
                       [0.0, 1.0 / T2[1, 1], -T2[1, 2] / T2[1, 1]],
                       [0.0, 0.0, 1.0]])
    H = T2inv @ Hn @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def _h33_rows(p1: jnp.ndarray, p2: jnp.ndarray):
    """(A [2M,8], b [2M]) of the h33=1 system A h = b
    (cv2.getPerspectiveTransform's formulation)."""
    x, y = p1[:, 0], p1[:, 1]
    xp, yp = p2[:, 0], p2[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -x * xp, -y * xp], -1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -x * yp, -y * yp], -1)
    return (jnp.concatenate([r1, r2], axis=0),
            jnp.concatenate([xp, yp], axis=0))


def dlt_homography(pts1: jnp.ndarray, pts2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted normalized DLT. pts: [M,2], w: [M] >= 0. Returns H (p2 ~ H p1)."""
    p1, p2, T1, T2 = _normalized_pair(pts1, pts2, w)
    x, y = p1[:, 0], p1[:, 1]
    xp, yp = p2[:, 0], p2[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero, x * xp, y * xp, xp], -1)
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one, x * yp, y * yp, yp], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # [2M,9]
    # full f32 accumulation: TPU's default matmul precision (bf16 passes)
    # visibly degrades the homography conditioning
    AtA = jnp.matmul(A.T, A, precision=jax.lax.Precision.HIGHEST)
    _, vecs = jnp.linalg.eigh(AtA)
    return _denormalize(vecs[:, 0].reshape(3, 3), T1, T2)


def perspective_4pt(pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """Exact 4-point homography via the 8x8 linear system with h33=1,
    Hartley-normalized.

    This is the RANSAC HYPOTHESIS solver: jnp.linalg.solve on [8,8] lowers
    to a tiny LU — the 9x9 eigh DLT used here previously made the batched
    hypothesis stage compile in ~2 minutes per shape variant (the dominant
    cold-start cost); LU compiles in seconds. Degenerate samples yield a
    garbage H that simply scores zero inliers (the h33=0 family that DLT
    could represent is measure-zero among random 4-point samples).
    """
    p1, p2, T1, T2 = _normalized_pair(pts1, pts2, jnp.ones((4,), jnp.float32))
    A, b = _h33_rows(p1, p2)                         # [8, 8], [8]
    h = jnp.linalg.solve(A, b)
    Hn = jnp.concatenate([h, jnp.ones((1,), h.dtype)]).reshape(3, 3)
    return _denormalize(Hn, T1, T2)


def weighted_refit_8pt(pts1: jnp.ndarray, pts2: jnp.ndarray,
                       w: jnp.ndarray) -> jnp.ndarray:
    """Weighted inlier refit via the h33=1 normal equations (8x8 LU solve).

    Same algebraic formulation as perspective_4pt but overdetermined: rows
    for every correspondence, weighted by w, collapsed to an 8x8 system
    A^T W A h = A^T W b. Replaces the eigh-based DLT on the RANSAC refit
    path — jnp.linalg.eigh's QDWH lowering was a multi-minute XLA compile
    (the refit runs per pair inside the one-dispatch match program). A tiny
    ridge keeps degenerate weight sets solvable; the caller's inlier-count
    gate discards any garbage refit.
    """
    p1, p2, T1, T2 = _normalized_pair(pts1, pts2, w)
    A, b = _h33_rows(p1, p2)                         # [2M, 8], [2M]
    ww = jnp.concatenate([w, w], axis=0)
    Aw = A * ww[:, None]
    G = jnp.matmul(Aw.T, A, precision=jax.lax.Precision.HIGHEST) \
        + 1e-8 * jnp.eye(8)
    h = jnp.linalg.solve(G, Aw.T @ b)
    Hn = jnp.concatenate([h, jnp.ones((1,), h.dtype)]).reshape(3, 3)
    return _denormalize(Hn, T1, T2)


def transfer_error2(H: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """Squared forward transfer error per correspondence (findHomography's
    inlier criterion)."""
    x, y = pts1[:, 0], pts1[:, 1]
    d = H[2, 0] * x + H[2, 1] * y + H[2, 2]
    d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    px = (H[0, 0] * x + H[0, 1] * y + H[0, 2]) / d
    py = (H[1, 0] * x + H[1, 1] * y + H[1, 2]) / d
    return (px - pts2[:, 0]) ** 2 + (py - pts2[:, 1]) ** 2
