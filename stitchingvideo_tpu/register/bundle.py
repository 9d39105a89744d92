"""Bundle adjustment (Ray and Reproj cost models) as a jitted LM loop.

Parity target: BundleAdjusterBase/Ray/Reproj (reference
src/motion_estimators.cpp:172-581). The reference runs CvLevMarq with numeric
Jacobians (step 1e-3/1e-4) on the host; here the whole LM loop is one compiled
XLA program with forward-mode autodiff Jacobians — fixed iteration count,
accept/reject via masking (SURVEY §7.3 'RANSAC + LM on TPU').

Cost models:
  ray    (4 params/cam: f, rvec) — unit-ray distance scaled by sqrt(f_i f_j)
         (motion_estimators.cpp:445-581, the RT drivers' default)
  reproj (7 params/cam: f, ppx, ppy, aspect, rvec) — 2D reprojection error
         (motion_estimators.cpp:264-440)

Edge data is fixed-capacity: E edges x M correspondences with 0/1 weights.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry.rotation import matrix_to_rodrigues, rodrigues_to_matrix


def _rays(f, R, pts):
    """Unit rays for correspondences. f scalar, R [3,3], pts [M,2] centered."""
    x = pts[:, 0] / f
    y = pts[:, 1] / f
    ones = jnp.ones_like(x)
    v = jnp.stack([x, y, ones], axis=-1) @ R.T  # [M,3] = R @ K^-1 p
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, 1e-12)


def _residual_ray(params, edge_i, edge_j, pts1, pts2, w):
    """params [N,4] (f, rvec). Returns flattened residuals [E*M*3]."""
    f = params[:, 0]
    R = rodrigues_to_matrix(params[:, 1:4])

    def per_edge(ei, ej, p1, p2, we):
        r1 = _rays(f[ei], R[ei], p1)
        r2 = _rays(f[ej], R[ej], p2)
        mult = jnp.sqrt(jnp.maximum(f[ei] * f[ej], 1e-6))
        return (mult * (r1 - r2)) * we[:, None]

    res = jax.vmap(per_edge)(edge_i, edge_j, pts1, pts2, w)  # [E,M,3]
    return res.reshape(-1)


def _residual_reproj(params, edge_i, edge_j, pts1, pts2, w):
    """params [N,7] (f, ppx, ppy, aspect, rvec). Residuals [E*M*2]."""
    f, ppx, ppy, asp = params[:, 0], params[:, 1], params[:, 2], params[:, 3]
    R = rodrigues_to_matrix(params[:, 4:7])

    def K(i):
        return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]) \
            .at[0, 0].set(f[i]).at[0, 2].set(ppx[i]) \
            .at[1, 1].set(f[i] * asp[i]).at[1, 2].set(ppy[i])

    def Kinv(i):
        fy = f[i] * asp[i]
        return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]) \
            .at[0, 0].set(1.0 / f[i]).at[0, 2].set(-ppx[i] / f[i]) \
            .at[1, 1].set(1.0 / fy).at[1, 2].set(-ppy[i] / fy)

    def per_edge(ei, ej, p1, p2, we):
        H = K(ej) @ R[ej] @ R[ei].T @ Kinv(ei)  # i -> j
        ones = jnp.ones_like(p1[:, :1])
        q = jnp.concatenate([p1, ones], axis=-1) @ H.T
        z = jnp.where(jnp.abs(q[:, 2:3]) < 1e-12, 1e-12, q[:, 2:3])
        proj = q[:, :2] / z
        return (proj - p2) * we[:, None]

    res = jax.vmap(per_edge)(edge_i, edge_j, pts1, pts2, w)  # [E,M,2]
    return res.reshape(-1)


@partial(jax.jit, static_argnames=("kind", "iters", "refine_focal",
                                   "refine_ppx", "refine_ppy", "refine_aspect"))
def bundle_adjust(focals0: jnp.ndarray, Rs0: jnp.ndarray,
                  edge_i: jnp.ndarray, edge_j: jnp.ndarray,
                  pts1: jnp.ndarray, pts2: jnp.ndarray, w: jnp.ndarray,
                  kind: str = "ray", iters: int = 50,
                  refine_focal: bool = True,
                  refine_ppx: bool = False,
                  refine_ppy: bool = False,
                  refine_aspect: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LM bundle adjustment.

    Returns (focals [N], Rs [N,3,3], pp_aspect [N,3] = (ppx, ppy, aspect),
    final_cost). pts1/pts2: [E, M, 2] centered keypoint coords for each edge's
    correspondences; w: [E, M] 0/1 inlier weights.

    Refinement flags mirror the reference's 5-char ba_refine_mask gating of
    Jacobian columns (motion_estimators.cpp:389-438: (0,0)=fx, (0,2)=ppx,
    (1,2)=ppy, (1,1)=aspect; rotations always refined). The skew flag (0,1)
    is accepted by the reference CLI but read by NEITHER adjuster — skew is
    not a parameter of the 7-param Reproj model — so it has no effect here
    either. The Ray model only honors fx (motion_estimators.cpp:509-513).
    """
    n = focals0.shape[0]
    rvecs0 = matrix_to_rodrigues(Rs0)
    if kind == "ray":
        x0 = jnp.concatenate([focals0[:, None], rvecs0], axis=1)  # [N,4]
        residual = _residual_ray
        free = jnp.array([refine_focal, True, True, True])
    elif kind == "reproj":
        zeros = jnp.zeros((n, 1))
        ones = jnp.ones((n, 1))
        x0 = jnp.concatenate([focals0[:, None], zeros, zeros, ones, rvecs0], axis=1)
        residual = _residual_reproj
        free = jnp.array([refine_focal, refine_ppx, refine_ppy,
                          refine_aspect, True, True, True])
    else:
        raise ValueError(kind)

    shape = x0.shape
    mask = jnp.broadcast_to(free[None, :], shape).reshape(-1).astype(jnp.float32)

    def res_flat(xf):
        return residual(xf.reshape(shape), edge_i, edge_j, pts1, pts2, w)

    x = x0.reshape(-1)
    r0 = res_flat(x)
    cost0 = jnp.sum(r0 * r0)

    def step(carry, _):
        x, lam, cost = carry
        r = res_flat(x)
        J = jax.jacfwd(res_flat)(x)  # [R, P]
        J = J * mask[None, :]
        # LM normal equations need full f32 accumulation on TPU
        JtJ = jnp.matmul(J.T, J, precision=jax.lax.Precision.HIGHEST)
        Jtr = jnp.matmul(J.T, r, precision=jax.lax.Precision.HIGHEST)
        d = jnp.diag(JtJ)
        A = JtJ + lam * jnp.diag(jnp.maximum(d, 1e-8)) + 1e-8 * jnp.eye(JtJ.shape[0])
        delta = jnp.linalg.solve(A, -Jtr) * mask
        x_new = x + delta
        r_new = res_flat(x_new)
        cost_new = jnp.sum(r_new * r_new)
        accept = cost_new < cost
        x = jnp.where(accept, x_new, x)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-7),
                        jnp.minimum(lam * 4.0, 1e7))
        cost = jnp.where(accept, cost_new, cost)
        return (x, lam, cost), cost

    (x, _lam, cost), _ = jax.lax.scan(step, (x, jnp.float32(1e-3), cost0),
                                      None, length=iters)
    xp = x.reshape(shape)
    focals = xp[:, 0]
    if kind == "ray":
        Rs = rodrigues_to_matrix(xp[:, 1:4])
        pp_aspect = jnp.concatenate(
            [jnp.zeros((n, 2)), jnp.ones((n, 1))], axis=1)
    else:
        Rs = rodrigues_to_matrix(xp[:, 4:7])
        pp_aspect = xp[:, 1:4]            # (ppx, ppy, aspect), centered pp
    return focals, Rs, pp_aspect, cost
