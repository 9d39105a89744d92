"""Dynamic-programming seam finder.

Parity class: DpSeamFinder COLOR / COLOR_GRAD (reference
src/seam_finders.cpp:162-1049). The reference's 900-line implementation does
component analysis plus a DP over the overlap; this TPU-era redesign keeps the
essential semantics — a minimum-cost seam through the pairwise overlap where
cost is the color difference (optionally gradient-normalized) — as a single
vectorized DP sweep per pair (host numpy at seam scale; the slow path).
"""
from __future__ import annotations

import numpy as np


def _pair_costs(i1: np.ndarray, i2: np.ndarray, cost_type: str) -> np.ndarray:
    diff = np.sqrt(((i1.astype(np.float32) - i2.astype(np.float32)) ** 2).sum(-1))
    if cost_type == "colorgrad":
        def grad(img):
            gy, gx = np.gradient(img.mean(-1))
            return np.abs(gx) + np.abs(gy)
        diff = diff / (grad(i1) + grad(i2) + 1.0)
    return diff


def _dp_seam(cost: np.ndarray) -> np.ndarray:
    """Min-cost top-to-bottom seam. cost [h, w] (inf where disallowed).
    Returns seam x-position per row."""
    h, w = cost.shape
    cum = cost.copy()
    back = np.zeros((h, w), np.int8)
    for y in range(1, h):
        prev = cum[y - 1]
        left = np.concatenate([[np.inf], prev[:-1]])
        right = np.concatenate([prev[1:], [np.inf]])
        stacked = np.stack([left, prev, right])
        choice = np.argmin(stacked, axis=0)
        cum[y] += stacked[choice, np.arange(w)]
        back[y] = choice - 1  # -1, 0, +1
    xs = np.zeros(h, np.int32)
    xs[-1] = int(np.argmin(cum[-1]))
    for y in range(h - 2, -1, -1):
        xs[y] = xs[y + 1] + back[y + 1, xs[y + 1]]
    return xs


def _resolve_pair(img1, img2, m1, m2, cost_type):
    overlap = m1 & m2
    if not overlap.any():
        return m1, m2
    ys, xs = np.nonzero(overlap)
    y0, y1 = int(ys.min()), int(ys.max()) + 1
    x0, x1 = int(xs.min()), int(xs.max()) + 1
    ov = overlap[y0:y1, x0:x1]
    c = _pair_costs(img1[y0:y1, x0:x1], img2[y0:y1, x0:x1], cost_type)
    c = np.where(ov, c, 1e6)

    h, w = ov.shape
    transpose = w > h  # run the DP along the longer axis
    if transpose:
        c = c.T
        ov_t = ov.T
    else:
        ov_t = ov
    seam = _dp_seam(c)

    # decide sides: image 1 keeps the side nearer its unique region
    u1 = (m1 & ~m2)[y0:y1, x0:x1]
    u2 = (m2 & ~m1)[y0:y1, x0:x1]
    axis_coord = np.nonzero(u1.T if transpose else u1)[1]
    c1 = axis_coord.mean() if axis_coord.size else 0.0
    axis_coord2 = np.nonzero(u2.T if transpose else u2)[1]
    c2 = axis_coord2.mean() if axis_coord2.size else ov_t.shape[1] - 1.0
    first_left = c1 <= c2

    cols = np.arange(ov_t.shape[1])[None, :]
    left_side = cols <= seam[:, None]
    keep1_t = left_side if first_left else ~left_side
    keep1 = keep1_t.T if transpose else keep1_t

    new1 = m1.copy()
    new2 = m2.copy()
    new1[y0:y1, x0:x1] = m1[y0:y1, x0:x1] & (~ov | keep1)
    new2[y0:y1, x0:x1] = m2[y0:y1, x0:x1] & (~ov | ~keep1)
    return new1, new2


def dp_seams(images: np.ndarray, masks: np.ndarray,
             cost_type: str = "color") -> np.ndarray:
    """images: [N, H, W, 3] seam-scale canvas; masks: [N, H, W] bool."""
    n = masks.shape[0]
    ms = [np.asarray(m).astype(bool).copy() for m in masks]
    imgs = [np.asarray(im) for im in images]
    for i in range(n):
        for j in range(i + 1, n):
            ms[i], ms[j] = _resolve_pair(imgs[i], imgs[j], ms[i], ms[j], cost_type)
    return np.stack(ms)
