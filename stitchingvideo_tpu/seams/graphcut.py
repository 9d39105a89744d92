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
