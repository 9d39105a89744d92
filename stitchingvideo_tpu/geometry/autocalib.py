"""Focal auto-calibration from pairwise homographies.

Parity target: focalsFromHomography / estimateFocal (reference
src/autocalib.cpp:67-143) — the Brown–Lowe closed-form focal estimates from a
rotation-only homography between two images with centered principal points.
Host-side (numpy): runs once over O(N^2) tiny matrices.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def focals_from_homography(H: np.ndarray) -> Tuple[Optional[float], Optional[float]]:
    """(f0, f1) focal estimates for the source (f0) and destination (f1)
    cameras of H (dst ~ H src, centered coords). None where not estimable."""
    h = np.asarray(H, np.float64).ravel()

    f1 = None
    d1 = h[6] * h[7]
    d2 = (h[7] - h[6]) * (h[7] + h[6])
    v1 = -(h[0] * h[1] + h[3] * h[4]) / d1 if d1 != 0 else np.nan
    v2 = (h[0] * h[0] + h[3] * h[3] - h[1] * h[1] - h[4] * h[4]) / d2 if d2 != 0 else np.nan
    if np.isfinite(v1) and np.isfinite(v2) and v1 < v2:
        v1, v2 = v2, v1
        d1, d2 = d2, d1
    if np.isfinite(v1) and v1 > 0 and np.isfinite(v2) and v2 > 0:
        f1 = float(np.sqrt(v1 if abs(d1) > abs(d2) else v2))
    elif np.isfinite(v1) and v1 > 0:
        f1 = float(np.sqrt(v1))

    f0 = None
    d1 = h[0] * h[3] + h[1] * h[4]
    d2 = h[0] * h[0] + h[1] * h[1] - h[3] * h[3] - h[4] * h[4]
    v1 = -h[2] * h[5] / d1 if d1 != 0 else np.nan
    v2 = (h[5] * h[5] - h[2] * h[2]) / d2 if d2 != 0 else np.nan
    if np.isfinite(v1) and np.isfinite(v2) and v1 < v2:
        v1, v2 = v2, v1
        d1, d2 = d2, d1
    if np.isfinite(v1) and v1 > 0 and np.isfinite(v2) and v2 > 0:
        f0 = float(np.sqrt(v1 if abs(d1) > abs(d2) else v2))
    elif np.isfinite(v1) and v1 > 0:
        f0 = float(np.sqrt(v1))
    return f0, f1


def estimate_focal(img_sizes: List[Tuple[int, int]],
                   pair_list: List[Tuple[int, int, np.ndarray, int]]) -> float:
    """Median focal across pair estimates; fallback = mean(w + h).

    img_sizes: [(w, h)] per image; pair_list: (i, j, H, num_inliers) entries.
    Parity: estimateFocal (autocalib.cpp:98-143).
    """
    all_focals = []
    for _i, _j, H, ni in pair_list:
        if H is None or ni <= 0:
            continue
        f0, f1 = focals_from_homography(H)
        if f0 is not None and f1 is not None:
            all_focals.append(float(np.sqrt(f0 * f1)))
    if all_focals:
        return float(np.median(all_focals))
    return float(np.mean([w + h for (w, h) in img_sizes]))
