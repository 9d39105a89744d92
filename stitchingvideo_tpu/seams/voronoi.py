"""Voronoi seam finder (TPU-native).

Parity target: VoronoiSeamFinder (reference src/seam_finders.cpp:88-159):
within each overlapping pair, each pixel goes to the image whose *unique*
region (pixels covered only by it) is nearer in L1 distance. Pairs are
processed sequentially like PairwiseSeamFinder::run so later pairs see the
updated masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.distance import distance_transform_l1


@jax.jit
def voronoi_seams(masks: jnp.ndarray) -> jnp.ndarray:
    """masks: [N, H, W] bool canvas-placed coverage -> seam masks (disjoint
    in overlap regions)."""
    n = masks.shape[0]
    ms = [masks[i] for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            mi, mj = ms[i], ms[j]
            overlap = mi & mj
            unique_i = mi & ~mj
            unique_j = mj & ~mi
            # distance to own unique region (0 inside it)
            d_i = distance_transform_l1(~unique_i)
            d_j = distance_transform_l1(~unique_j)
            keep_i = d_i <= d_j
            ms[i] = mi & (~overlap | keep_i)
            ms[j] = mj & (~overlap | ~keep_i)
    return jnp.stack(ms)
