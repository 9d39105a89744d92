"""Graph-cut seam finder over the native BK max-flow.

Parity target: GraphCutSeamFinder COST_COLOR / COST_COLOR_GRAD (reference
src/seam_finders.cpp:1052-1305 + gcgraph.hpp): per overlapping pair, build a
grid graph over the overlap ROI (+10 px gap), terminal weight 10000 where a
mask owns a pixel, edge weight = color-difference L2 (optionally divided by
Sobel gradient magnitude) + 1000 penalty at mask borders; BK min-cut assigns
each overlap pixel to one image.

Host-side stage (registration slow path), exactly where the reference runs it
(SURVEY §7.3 'Graph-cut seams'): the cut itself is pointer-chasing-sequential,
so it runs in native C++ at seam scale while everything around it stays on
device.
"""
from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from ..native import build as native_build

TERMINAL_COST = 10000.0
BAD_REGION_PENALTY = 1000.0
WEIGHT_EPS = 1.0
GAP = 10


def _cptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def _grad_mag(img: np.ndarray) -> np.ndarray:
    """Mean |Sobel| over channels (COST_COLOR_GRAD helper)."""
    gy, gx = np.gradient(img.mean(axis=-1))
    return np.abs(gx) + np.abs(gy)


def _pair_cut(img1: np.ndarray, img2: np.ndarray,
              mask1: np.ndarray, mask2: np.ndarray,
              cost_type: str) -> Tuple[np.ndarray, np.ndarray]:
    """Resolve the overlap of one image pair; returns updated (mask1, mask2)."""
    overlap = mask1 & mask2
    if not overlap.any():
        return mask1, mask2
    ys, xs = np.nonzero(overlap)
    y0 = max(int(ys.min()) - GAP, 0)
    y1 = min(int(ys.max()) + GAP + 1, mask1.shape[0])
    x0 = max(int(xs.min()) - GAP, 0)
    x1 = min(int(xs.max()) + GAP + 1, mask1.shape[1])

    m1 = mask1[y0:y1, x0:x1]
    m2 = mask2[y0:y1, x0:x1]
    i1 = img1[y0:y1, x0:x1].astype(np.float32)
    i2 = img2[y0:y1, x0:x1].astype(np.float32)
    h, w = m1.shape

    term_src = np.where(m1 & ~m2, TERMINAL_COST, 0.0).astype(np.float32)
    term_snk = np.where(m2 & ~m1, TERMINAL_COST, 0.0).astype(np.float32)

    diff = np.sqrt(((i1 - i2) ** 2).sum(axis=-1))  # [h,w] color distance
    both = m1 & m2

    def edge_w(a_sl, b_sl):
        wgt = diff[a_sl] + diff[b_sl] + WEIGHT_EPS
        if cost_type == "colorgrad":
            g1 = _grad_mag(i1)
            g2 = _grad_mag(i2)
            grad = g1[a_sl] + g2[a_sl] + g1[b_sl] + g2[b_sl] + WEIGHT_EPS
            wgt = wgt / grad + WEIGHT_EPS
        bad = ~(both[a_sl] & both[b_sl])
        return (wgt + bad * BAD_REGION_PENALTY).astype(np.float32)

    cap_right = edge_w((slice(None), slice(0, w - 1)), (slice(None), slice(1, w)))
    cap_down = edge_w((slice(0, h - 1), slice(None)), (slice(1, h), slice(None)))

    labels = np.zeros(h * w, np.uint8)
    lib = native_build.load()
    lib.grid_maxflow(h, w,
                     _cptr(np.ascontiguousarray(term_src.ravel()), ctypes.c_float),
                     _cptr(np.ascontiguousarray(term_snk.ravel()), ctypes.c_float),
                     _cptr(np.ascontiguousarray(cap_right.ravel()), ctypes.c_float),
                     _cptr(np.ascontiguousarray(cap_down.ravel()), ctypes.c_float),
                     _cptr(labels, ctypes.c_uint8))
    to_first = labels.reshape(h, w).astype(bool)

    new_m1 = mask1.copy()
    new_m2 = mask2.copy()
    ov = both
    new_m1[y0:y1, x0:x1] = m1 & (~ov | to_first)
    new_m2[y0:y1, x0:x1] = m2 & (~ov | ~to_first)
    return new_m1, new_m2


def graphcut_seams(images: np.ndarray, masks: np.ndarray,
                   cost_type: str = "color") -> np.ndarray:
    """images: [N, H, W, 3] float canvas-placed (seam scale);
    masks: [N, H, W] bool. Returns seam masks (overlaps resolved)."""
    n = masks.shape[0]
    ms = [np.asarray(m).astype(bool).copy() for m in masks]
    imgs = [np.asarray(im) for im in images]
    for i in range(n):
        for j in range(i + 1, n):
            ms[i], ms[j] = _pair_cut(imgs[i], imgs[j], ms[i], ms[j], cost_type)
    return np.stack(ms)


def _bucket(x: int, q: int) -> int:
    return -(-x // q) * q


def _overlap_meta_jit():
    import jax

    from functools import partial

    @partial(jax.jit, static_argnames=("pairs",))
    def meta(masks, pairs):
        import jax.numpy as jnp
        H, W = masks.shape[1:]
        ii = jnp.asarray([p[0] for p in pairs])
        jj = jnp.asarray([p[1] for p in pairs])
        ov = masks[ii] & masks[jj]
        ys = ov.any(axis=2)
        xs = ov.any(axis=1)
        yi = jnp.arange(H)[None]
        xi = jnp.arange(W)[None]
        return jnp.stack([
            ov.any(axis=(1, 2)).astype(jnp.int32),
            jnp.min(jnp.where(ys, yi, H), axis=1),
            jnp.max(jnp.where(ys, yi, -1), axis=1),
            jnp.min(jnp.where(xs, xi, W), axis=1),
            jnp.max(jnp.where(xs, xi, -1), axis=1)], axis=1)

    return meta


def _crop_bands_jit():
    import jax

    from functools import partial

    @partial(jax.jit, static_argnames=("bh", "bw"))
    def crop_bands(canvas_imgs, idx, org, bh, bw):
        def crop(pair_idx, o):
            return jax.vmap(lambda c: jax.lax.dynamic_slice(
                canvas_imgs[c], (o[0], o[1], 0), (bh, bw, 3)))(pair_idx)
        return jax.vmap(crop)(idx, org)

    return crop_bands


_OVERLAP_META = None
_CROP_BANDS = None
_L_BUCKET = 4       # live-pair-count bucket (stable jit signatures)
_B_BUCKET = 64      # band-shape bucket


def graphcut_seams_banded(canvas_imgs, canvas_masks,
                          cost_type: str = "color") -> np.ndarray:
    """Device-aware variant: canvas_imgs/canvas_masks are jax device arrays.

    Only the pairwise-overlap BANDS of the image canvas are fetched to host
    (one batched transfer) — the full 6-camera seam canvas is ~45 MB over the
    remote TPU relay, while the overlap bands are a few MB. Band shape and
    pair count are bucketed so re-registrations reuse the compiled crop
    program. The sequential BK cuts (reference pair order,
    seam_finders.cpp:1122-1135) run on the host masks exactly as
    `graphcut_seams` does, so results are identical GIVEN IDENTICAL INPUTS.
    Note the product stitcher feeds this path u8-quantized canvases (4x
    smaller relay fetch) while the legacy float path saw float32 values —
    seam placement can differ by rounding between the two entry points; the
    cut-cost parity gates hold for both.
    """
    import jax.numpy as jnp

    global _OVERLAP_META, _CROP_BANDS
    if _OVERLAP_META is None:
        _OVERLAP_META = _overlap_meta_jit()
        _CROP_BANDS = _crop_bands_jit()

    N, H, W = canvas_masks.shape
    ii, jj = np.triu_indices(N, 1)
    pairs = tuple((int(a), int(b)) for a, b in zip(ii, jj))
    meta = np.asarray(_OVERLAP_META(canvas_masks, pairs))
    masks = np.asarray(canvas_masks).astype(bool).copy()
    live = [k for k in range(len(pairs)) if meta[k, 0]]
    if not live:
        return masks

    bh = min(H, _bucket(max(int(meta[k, 2] - meta[k, 1]) + 1 for k in live)
                        + 2 * GAP, _B_BUCKET))
    bw = min(W, _bucket(max(int(meta[k, 4] - meta[k, 3]) + 1 for k in live)
                        + 2 * GAP, _B_BUCKET))
    origins = [(int(np.clip(meta[k, 1] - GAP, 0, H - bh)),
                int(np.clip(meta[k, 3] - GAP, 0, W - bw)))
               for k in live]
    # one batched fetch of the image bands for every live pair; the pair
    # list is padded to a bucket so the crop program signature is stable
    Lp = _bucket(len(live), _L_BUCKET)
    idx_np = np.array([[ii[k], jj[k]] for k in live]
                      + [[ii[live[0]], jj[live[0]]]] * (Lp - len(live)))
    org_np = np.array(origins + [origins[0]] * (Lp - len(live)))
    bands = np.asarray(_CROP_BANDS(canvas_imgs, jnp.asarray(idx_np),
                                   jnp.asarray(org_np), bh, bw),
                       dtype=np.float32)

    for t, k in enumerate(live):
        oy, ox = origins[t]
        i, j = int(ii[k]), int(jj[k])
        sl = (slice(oy, oy + bh), slice(ox, ox + bw))
        m1, m2 = _pair_cut(bands[t, 0], bands[t, 1],
                           masks[i][sl], masks[j][sl], cost_type)
        masks[i][sl] = m1
        masks[j][sl] = m2
    return masks
