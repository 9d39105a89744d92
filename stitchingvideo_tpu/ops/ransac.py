"""Batched-hypothesis RANSAC homography, fully jittable.

Parity target: cv::findHomography(CV_RANSAC) + inlier refit as driven by
BestOf2NearestMatcher (reference src/matchers.cpp:603-651). TPU-first design
(SURVEY §7.3 'RANSAC + LM on TPU'): a fixed batch of hypotheses evaluated in
parallel (vmapped 4-point DLT + masked inlier count) replaces the sequential
adaptive loop; two masked least-squares refits on the winning inlier set
replace the final refine.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .homography import perspective_4pt, transfer_error2, weighted_refit_8pt


@partial(jax.jit, static_argnames=("iters",))
def ransac_homography(key, pts1: jnp.ndarray, pts2: jnp.ndarray,
                      valid: jnp.ndarray, thresh: float = 3.0,
                      iters: int = 512):
    """RANSAC H: pts1 -> pts2.

    pts1/pts2: [M, 2] float32, valid: [M] bool.
    Returns dict(H [3,3], inliers [M] bool, num_inliers i32, ok bool).
    """
    M = pts1.shape[0]
    n_valid = valid.sum()

    # [iters, 4] sample indices, uniform over valid correspondences, via
    # inverse-CDF on the validity cumsum. jax.random.categorical here drew
    # an [iters, 4, M] gumbel field (~1M transcendentals) and compiled to
    # ~0.5 MB of TPU code; cold-start cost on the remote relay scales with
    # executable bytes. searchsorted(cumsum(valid), u * n_valid) is the
    # same uniform-over-valid draw with a [iters, 4] uniform and a binary
    # search.
    cdf = jnp.cumsum(valid.astype(jnp.float32))
    u = jax.random.uniform(key, (iters, 4))
    targets = jnp.floor(u * jnp.maximum(n_valid.astype(jnp.float32), 1.0))
    samples = jnp.clip(jnp.searchsorted(cdf, targets + 0.5), 0, M - 1)

    def distinct(s):
        a = s[:, None] == s[None, :]
        return (a.sum() == 4)

    sample_ok = jax.vmap(distinct)(samples) & (n_valid >= 4)

    def fit(sample):
        # closed-form 8x8 solve: the eigh-based DLT here cost ~2 min of XLA
        # compile for the batched hypothesis stage (see perspective_4pt)
        return perspective_4pt(pts1[sample], pts2[sample])

    Hs = jax.vmap(fit)(samples)  # [iters,3,3]

    def score(H):
        err2 = transfer_error2(H, pts1, pts2)
        inl = (err2 < thresh * thresh) & valid
        return inl.sum(), inl

    counts, inls = jax.vmap(score)(Hs)
    counts = jnp.where(sample_ok, counts, -1)
    best = jnp.argmax(counts)
    best_inl = inls[best]

    # Two refinement rounds of masked least-squares on the inlier set.
    H = Hs[best]
    for _ in range(2):
        w = best_inl.astype(jnp.float32)
        # 8x8 LU refit — the eigh DLT here was a compile bomb (homography.py)
        H_ref = weighted_refit_8pt(pts1, pts2, w)
        err2 = transfer_error2(H_ref, pts1, pts2)
        new_inl = (err2 < thresh * thresh) & valid
        better = new_inl.sum() >= best_inl.sum()
        H = jnp.where(better, H_ref, H)
        best_inl = jnp.where(better, new_inl, best_inl)

    num = best_inl.sum().astype(jnp.int32)
    ok = (num >= 4) & (counts[best] > 0)
    H = jnp.where(ok, H, jnp.eye(3))
    return {"H": H, "inliers": best_inl & ok, "num_inliers": jnp.where(ok, num, 0),
            "ok": ok}
