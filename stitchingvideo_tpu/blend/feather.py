"""Feather (distance-transform weighted) blending.

Parity target: FeatherBlender (reference src/blenders.cpp:115-186,
createWeightMap :427-432): weight = min(L1-distance-transform(mask) *
sharpness, 1), weighted accumulate, normalize by total weight.

Canvas formulation: all images pre-placed on the output canvas
[N, H, W, 3] with masks [N, H, W]; one jitted reduction produces the pano.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.distance import distance_transform_l1

WEIGHT_EPS = 1e-5  # blenders.cpp WEIGHT_EPS


def feather_weights(masks: jnp.ndarray, sharpness: float = 0.02) -> jnp.ndarray:
    """[N, H, W] float weights from boolean masks."""
    def one(m):
        return jnp.minimum(distance_transform_l1(m) * sharpness, 1.0) * m
    return jax.vmap(one)(masks)


@jax.jit
def feather_blend(images: jnp.ndarray, weights: jnp.ndarray):
    """(pano [H, W, 3] float32, mask [H, W] bool) from canvas-placed images."""
    acc = jnp.einsum("nhwc,nhw->hwc", images.astype(jnp.float32), weights)
    wsum = weights.sum(axis=0)
    pano = acc / (wsum[..., None] + WEIGHT_EPS)
    return pano, wsum > WEIGHT_EPS
