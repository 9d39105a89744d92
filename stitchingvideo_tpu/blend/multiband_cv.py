"""OpenCV-faithful MultiBandBlender (CV_16S fixed-point weight path).

Parity target: cv::detail::MultiBandBlender — prepare/feed/blend semantics of
reference src/blenders.cpp:189-377 with the CV_16S weight type (the cv2
default). Every convention that shapes the output bits is reproduced:

- prepare: num_bands cropped to ceil(log2(max(W, H))), dst ROI padded to a
  multiple of 2^bands (blenders.cpp:204-233).
- feed: per-image sub-ROI = image rect grown by gap = 3*2^bands, clamped to
  the dst ROI, top-left aligned down to a 2^bands grid, size padded up to a
  2^bands multiple, shifted back inside the ROI (:250-270); image bordered
  with BORDER_REFLECT, mask with BORDER_CONSTANT (:277-300); weights are the
  mask as CV_16S plus 1 where nonzero (so 255 -> 256); Laplacian bands
  accumulate as (value * weight) >> 8 (:343-370).
- blend: per-band (value << 8) / (weight + 1) with C trunc division
  (normalizeUsingWeightMap :407-424), pyramid collapse, crop to the final
  ROI, mask = weight > 0 (:360-377).

The per-image band computation runs on device (jit per bordered-ROI shape);
ROI bookkeeping and accumulation are host-side numpy — this is the still
(slow-path) blender; the video hot loop uses the fused Pallas composite.
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pyramid_int import (create_laplace_pyr_i16, pyr_up_i16,
                               weight_pyr_i16)


@partial(jax.jit, static_argnames=("bands",))
def _feed_bands(img16: jnp.ndarray, w16: jnp.ndarray, bands: int):
    """Per-image weighted Laplacian bands + weight pyramid (int32)."""
    src = create_laplace_pyr_i16(img16, bands)
    wp = weight_pyr_i16(w16, bands)
    acc = [(s * w[..., None]) >> 8 for s, w in zip(src, wp)]
    return acc, wp


@jax.jit
def _normalize_band(band: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(v << 8) / (w + 1) with C-style truncation toward zero."""
    num = band * 256
    den = (w + 1)[..., None]
    return jnp.where(num >= 0, num // den, -((-num) // den))


class MultiBandBlenderCV:
    """Drop-in analogue of cv2.detail_MultiBandBlender (CV_16S weights)."""

    def __init__(self, num_bands: int = 5):
        self.actual_num_bands = num_bands
        self.num_bands = num_bands

    # ------------------------------------------------------------------
    def prepare(self, dst_roi: Tuple[int, int, int, int]) -> None:
        """dst_roi = (x, y, width, height) in panorama coordinates."""
        x, y, w, h = dst_roi
        self.final_roi = (x, y, w, h)
        max_len = float(max(w, h))
        self.num_bands = min(self.actual_num_bands,
                             int(np.ceil(np.log(max_len) / np.log(2.0))))
        q = 1 << self.num_bands
        w += (q - w % q) % q
        h += (q - h % q) % q
        self.roi = (x, y, w, h)
        nb = self.num_bands
        self.dst_laplace: List[np.ndarray] = []
        self.dst_weights: List[np.ndarray] = []
        hh, ww = h, w
        for _ in range(nb + 1):
            self.dst_laplace.append(np.zeros((hh, ww, 3), np.int32))
            self.dst_weights.append(np.zeros((hh, ww), np.int32))
            hh, ww = (hh + 1) // 2, (ww + 1) // 2

    # ------------------------------------------------------------------
    def feed(self, img: np.ndarray, mask: np.ndarray,
             tl: Tuple[int, int]) -> None:
        """img: [h, w, 3] int16-valued (CV_16S), mask: [h, w] uint8,
        tl: (x, y) panorama coordinates of the image rect."""
        nb = self.num_bands
        rx, ry, rw, rh = self.roi
        brx_roi, bry_roi = rx + rw, ry + rh
        h, w = img.shape[:2]
        gap = 3 * (1 << nb)

        tlx = max(rx, tl[0] - gap)
        tly = max(ry, tl[1] - gap)
        brx = min(brx_roi, tl[0] + w + gap)
        bry = min(bry_roi, tl[1] + h + gap)

        tlx = rx + (((tlx - rx) >> nb) << nb)
        tly = ry + (((tly - ry) >> nb) << nb)
        width = brx - tlx
        height = bry - tly
        width += ((1 << nb) - width % (1 << nb)) % (1 << nb)
        height += ((1 << nb) - height % (1 << nb)) % (1 << nb)
        brx = tlx + width
        bry = tly + height
        dx = max(brx - brx_roi, 0)
        dy = max(bry - bry_roi, 0)
        tlx -= dx; brx -= dx
        tly -= dy; bry -= dy

        top = tl[1] - tly
        left = tl[0] - tlx
        bottom = bry - tl[1] - h
        right = brx - tl[0] - w

        img_b = np.pad(img.astype(np.int32),
                       ((top, bottom), (left, right), (0, 0)),
                       mode="symmetric")          # BORDER_REFLECT
        weight = mask.astype(np.int32)
        weight[mask != 0] += 1                     # 255 -> 256
        w_b = np.pad(weight, ((top, bottom), (left, right)),
                     mode="constant")

        acc, wp = _feed_bands(jnp.asarray(img_b), jnp.asarray(w_b), nb)

        y_tl, y_br = tly - ry, bry - ry
        x_tl, x_br = tlx - rx, brx - rx
        for i in range(nb + 1):
            hh, ww = y_br - y_tl, x_br - x_tl
            self.dst_laplace[i][y_tl:y_br, x_tl:x_br] += \
                np.asarray(acc[i])[:hh, :ww]
            self.dst_weights[i][y_tl:y_br, x_tl:x_br] += \
                np.asarray(wp[i])[:hh, :ww]
            y_tl //= 2; y_br //= 2
            x_tl //= 2; x_br //= 2

    # ------------------------------------------------------------------
    def blend(self) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (panorama int16-valued int32 [H, W, 3], mask bool)."""
        nb = self.num_bands
        norm = [np.asarray(_normalize_band(jnp.asarray(b), jnp.asarray(w)))
                for b, w in zip(self.dst_laplace, self.dst_weights)]
        img = jnp.asarray(norm[-1])
        for lvl in reversed(norm[:-1]):
            img = pyr_up_i16(img) + jnp.asarray(lvl)
        pano = np.array(img)
        _, _, fw, fh = self.final_roi
        pano = pano[:fh, :fw]
        mask = self.dst_weights[0][:fh, :fw] > 0
        pano[~mask] = 0                            # Blender::blend zero-fill
        return pano, mask
