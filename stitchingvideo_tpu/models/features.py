"""Fixed-capacity feature/match pytrees (static shapes for jit).

Parity targets: cv::detail::ImageFeatures (reference include/.../detail/
matchers.hpp:59-65) and cv::detail::MatchesInfo (matchers.hpp:133-144) —
re-designed as batched struct-of-arrays with validity masks so the whole
match graph lives in a handful of device arrays.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class ImageFeatures:
    """Keypoints + descriptors for N images, K keypoint slots each.

    xy:       [N, K, 2] float32  keypoint coords in work-scale pixels
    response: [N, K]    float32  detector score (used for ranking)
    angle:    [N, K]    float32  orientation (radians)
    valid:    [N, K]    bool
    desc:     [N, K, D] uint8    binary descriptor, one bit per byte (0/1)
    img_wh:   [N, 2]    int32    source (width, height) at work scale
    """
    xy: jnp.ndarray
    response: jnp.ndarray
    angle: jnp.ndarray
    valid: jnp.ndarray
    desc: jnp.ndarray
    img_wh: jnp.ndarray

    @property
    def n_images(self) -> int:
        return self.xy.shape[0]

    @property
    def capacity(self) -> int:
        return self.xy.shape[1]


@flax.struct.dataclass
class PairwiseMatches:
    """Match state for all ordered image pairs (i != j), flattened to P rows.

    pair_src/pair_dst: [P] int32   image indices (row p is pair src->dst)
    src_idx/dst_idx:   [P, M] int32  keypoint slot indices
    match_valid:       [P, M] bool   ratio-test survivors
    inlier_mask:       [P, M] bool   RANSAC inliers
    H:                 [P, 3, 3] float32  homography src->dst (centered coords)
    num_inliers:       [P] int32
    confidence:        [P] float32   inliers/(8 + 0.3*matches)  (matchers.cpp:622)
    """
    pair_src: jnp.ndarray
    pair_dst: jnp.ndarray
    src_idx: jnp.ndarray
    dst_idx: jnp.ndarray
    match_valid: jnp.ndarray
    inlier_mask: jnp.ndarray
    H: jnp.ndarray
    num_inliers: jnp.ndarray
    confidence: jnp.ndarray

    @property
    def n_pairs(self) -> int:
        return self.pair_src.shape[0]

    def pair_index(self, n_images: int, i: int, j: int) -> int:
        """Row index for ordered pair (i, j) in the canonical enumeration."""
        # enumeration: all (i, j), i != j, row = i * (n-1) + (j if j < i else j - 1)
        return i * (n_images - 1) + (j if j < i else j - 1)
