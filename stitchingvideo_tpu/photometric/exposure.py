"""Exposure compensation: pairwise gain solve + block-gain maps.

Parity target: GainCompensator (reference src/exposure_compensate.cpp:73-153)
and BlocksGainCompensator (:165-246, include/.../exposure_compensate.hpp:89-105)
— the RT driver keeps a persistent copy of the latter (64-bit driver
BlockFeed/BlockApply :246-341) so gain maps survive across frames.

TPU-first design: images live on a common canvas; all pairwise overlap
statistics (N(i,j), I(i,j)) reduce to masked matmuls over [N, H*W] — one MXU
contraction instead of O(N^2) per-pixel loops. The N x N (or B x B for blocks)
linear system solves on-device.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.filters import sep_filter2d

_ALPHA = 0.01   # error variance weight (exposure_compensate.cpp:108)
_BETA = 100.0   # gain prior weight


def _intensity(images: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel L2 norm over channels (OpenCV uses norm(Vec3) of BGR)."""
    return jnp.sqrt(jnp.sum(images.astype(jnp.float32) ** 2, axis=-1))


def _solve_gains(N: jnp.ndarray, I: jnp.ndarray) -> jnp.ndarray:
    """Solve the Brown-Lowe gain system.

    N: [K, K] overlap pixel counts (symmetric); I: [K, K] mean intensity of
    block/image k over its overlap with l. Returns gains [K].
    Parity: GainCompensator::feed's system assembly (exposure_compensate.cpp:
    110-145): A(i,i) += beta*N(i,j) + 2*alpha*I(i,j)^2*N(i,j);
    A(i,j) -= 2*alpha*I(i,j)*I(j,i)*N(i,j); b(i) += beta*N(i,j).
    """
    K = N.shape[0]
    b = _BETA * N.sum(axis=1)
    diag = _BETA * N.sum(axis=1) + 2.0 * _ALPHA * jnp.sum(I * I * N, axis=1)
    A = -2.0 * _ALPHA * I * I.T * N
    A = A - jnp.diag(jnp.diag(A)) + jnp.diag(diag)
    # guard empty rows (blocks with no overlap anywhere): gain = 1
    empty = N.sum(axis=1) <= 0
    A = jnp.where(empty[:, None] | empty[None, :], 0.0, A)
    A = A + jnp.diag(jnp.where(empty, 1.0, 0.0))
    b = jnp.where(empty, 1.0, b)
    return jnp.linalg.solve(A, b)


@jax.jit
def gain_compensator(images: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Single gain per image.

    images: [N, H, W, 3] on a common canvas; masks: [N, H, W] bool.
    Returns gains [N].
    """
    n = images.shape[0]
    lum = _intensity(images).reshape(n, -1)          # [N, P]
    m = masks.reshape(n, -1).astype(jnp.float32)     # [N, P]
    Nmat = jax.lax.dot_general(m, m, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    Isum = jax.lax.dot_general(lum * m, m, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    Nmat = Nmat * (1.0 - jnp.eye(n))
    Imean = Isum / jnp.maximum(Nmat, 1.0)
    return _solve_gains(Nmat, Imean)


@partial(jax.jit, static_argnames=("block_size",))
def blocks_gain_maps(images: jnp.ndarray, masks: jnp.ndarray,
                     block_size: int = 32) -> jnp.ndarray:
    """Per-image smooth gain maps at block resolution.

    images: [N, H, W, 3] canvas-placed; masks: [N, H, W] bool.
    Returns [N, ceil(H/bs), ceil(W/bs)] gains (bilinear-upsample to apply).

    Design: every (image, block) is one unknown of the same gain system, with
    cross-image overlap statistics accumulated per block pair that shares
    canvas pixels — equivalent to BlocksGainCompensator running the pairwise
    solve over block sub-images (exposure_compensate.cpp:167-199), followed by
    the double [0.25 0.5 0.25] separable smoothing (:224-235).
    """
    n, H, W = masks.shape
    bs = block_size
    nby = -(-H // bs)
    nbx = -(-W // bs)
    B = nby * nbx
    Hp, Wp = nby * bs, nbx * bs

    lum = _intensity(images)
    m = masks.astype(jnp.float32)
    if (Hp, Wp) != (H, W):
        lum = jnp.pad(lum, ((0, 0), (0, Hp - H), (0, Wp - W)))
        m = jnp.pad(m, ((0, 0), (0, Hp - H), (0, Wp - W)))

    def block_pool(x):
        """[..., Hp, Wp] -> [..., B] sums over aligned bs x bs tiles."""
        s = x.shape[:-2]
        x = x.reshape(*s, nby, bs, nbx, bs).sum(axis=(-3, -1))
        return x.reshape(*s, B)

    # Because the block grid is canvas-aligned, block b of image i only ever
    # overlaps block b of image j — the pairwise block statistics reduce to
    # block-pooled elementwise products (no [B, P] membership matrix needed).
    mm = m[:, None] * m[None, :]                      # [n, n, Hp, Wp]
    Nb = block_pool(mm)                               # [n, n, B]
    Ib = block_pool(lum[:, None] * mm)
    Nb = jnp.moveaxis(Nb, -1, 0)                      # [B, n, n]
    Ib = jnp.moveaxis(Ib, -1, 0)
    eye = jnp.eye(n)[None]
    Nb = Nb * (1.0 - eye)
    Imean = Ib / jnp.maximum(Nb, 1.0)

    gains = jax.vmap(_solve_gains)(Nb, Imean)        # [B, n]
    gmaps = gains.T.reshape(n, nby, nbx)

    # blocks with no own coverage: fill with 1 before smoothing
    cover = block_pool(m).reshape(n, nby, nbx)
    gmaps = jnp.where(cover > 0, gmaps, 1.0)

    k = jnp.array([0.25, 0.5, 0.25], jnp.float32)
    for _ in range(2):
        gmaps = jax.vmap(lambda g: sep_filter2d(g, k, k))(gmaps)
    return gmaps


def upsample_gain(gmap: jnp.ndarray, out_hw: Tuple[int, int],
                  block_size: int = 32) -> jnp.ndarray:
    """Bilinear-upsample a block gain map to pixel resolution (apply step,
    exposure_compensate.cpp:237-246)."""
    return jax.image.resize(gmap, out_hw, method="linear")


def apply_gain(image: jnp.ndarray, gain) -> jnp.ndarray:
    """Multiply (scalar or per-pixel map), preserving dtype."""
    out = image.astype(jnp.float32) * (gain if jnp.ndim(gain) == 0 else gain[..., None])
    if jnp.issubdtype(image.dtype, jnp.integer):
        info = jnp.iinfo(image.dtype)
        return jnp.clip(jnp.round(out), info.min, info.max).astype(image.dtype)
    return out.astype(image.dtype)
