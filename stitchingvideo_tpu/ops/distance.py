"""Exact L1 (city-block) distance transform, TPU-native.

Parity target: cv::distanceTransform(CV_DIST_L1, 3) as used by
FeatherBlender::createWeightMap (reference src/blenders.cpp:427-432) and
VoronoiSeamFinder (src/seam_finders.cpp:88-159).

L1 DT is separable: a vertical min-plus pass then a horizontal one, each a
forward+backward running-min — implemented as lax.scan over one axis,
vectorized over the other (H sequential steps of W-wide VPU ops).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _minplus_1d(src: jnp.ndarray) -> jnp.ndarray:
    """d[i] = min_j (src[j] + |i-j|) along axis 0, vectorized over axis 1."""
    def fwd(carry, row):
        carry = jnp.minimum(carry + 1.0, row)
        return carry, carry

    init = jnp.full(src.shape[1:], jnp.inf, src.dtype)
    _, down = jax.lax.scan(fwd, init, src)
    _, up = jax.lax.scan(fwd, init, src[::-1])
    return jnp.minimum(down, up[::-1])


@jax.jit
def distance_transform_l1(mask: jnp.ndarray) -> jnp.ndarray:
    """Distance of each True pixel to the nearest False pixel (L1 metric).

    mask: [H, W] bool. All-True input returns large finite values.
    """
    H, W = mask.shape
    big = jnp.float32(H + W + 1)
    src = jnp.where(mask, big, 0.0)
    d = _minplus_1d(src)
    d = _minplus_1d(d.T).T
    return jnp.minimum(d, big)
