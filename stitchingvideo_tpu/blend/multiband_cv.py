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


@partial(jax.jit, static_argnames=("bands",), donate_argnums=(0, 1))
def _feed_accum(dst_l, dst_w, img_b16, w_b16, offs, bands):
    """Compute one image's bands and accumulate into the device-resident
    pyramids in place (donated). offs[i] = (y_tl >> i, x_tl >> i) — the
    per-level sub-ROI origin; sizes are static per image shape. Keeping the
    accumulators in HBM removes the ~300 MB/image of pyramid round trips the
    host-numpy accumulation paid over the TPU relay."""
    acc, wp = _feed_bands(img_b16.astype(jnp.int32), w_b16.astype(jnp.int32),
                          bands)
    new_l, new_w = [], []
    for i in range(bands + 1):
        oy, ox = offs[i, 0], offs[i, 1]
        hh, ww = acc[i].shape[:2]
        cur = jax.lax.dynamic_slice(dst_l[i], (oy, ox, jnp.int32(0)),
                                    (hh, ww, 3))
        new_l.append(jax.lax.dynamic_update_slice(
            dst_l[i], cur + acc[i], (oy, ox, jnp.int32(0))))
        curw = jax.lax.dynamic_slice(dst_w[i], (oy, ox), (hh, ww))
        new_w.append(jax.lax.dynamic_update_slice(
            dst_w[i], curw + wp[i], (oy, ox)))
    return tuple(new_l), tuple(new_w)


@partial(jax.jit, static_argnames=("fh", "fw"))
def _blend_final(dst_l, dst_w, fh, fw):
    """Normalize all bands, collapse the pyramid, crop, zero-fill — one
    device program, one int16 fetch."""
    norm = [_normalize_band(b, w) for b, w in zip(dst_l, dst_w)]
    img = norm[-1]
    for lvl in reversed(norm[:-1]):
        img = pyr_up_i16(img) + lvl
    pano = img[:fh, :fw]
    mask = dst_w[0][:fh, :fw] > 0
    pano = jnp.where(mask[..., None], pano, 0)
    return pano.astype(jnp.int16), mask


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
        # device-resident accumulators (see _feed_accum)
        self.dst_laplace: List[jnp.ndarray] = []
        self.dst_weights: List[jnp.ndarray] = []
        hh, ww = h, w
        for _ in range(nb + 1):
            self.dst_laplace.append(jnp.zeros((hh, ww, 3), jnp.int32))
            self.dst_weights.append(jnp.zeros((hh, ww), jnp.int32))
            hh, ww = (hh + 1) // 2, (ww + 1) // 2

    # ------------------------------------------------------------------
    def _sub_roi(self, tl: Tuple[int, int], h: int, w: int):
        """feed's sub-ROI bookkeeping (blenders.cpp:250-270): border pads +
        per-level accumulator origins for an image rect at tl of size h x w."""
        nb = self.num_bands
        rx, ry, rw, rh = self.roi
        brx_roi, bry_roi = rx + rw, ry + rh
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

        pads = (tl[1] - tly, tl[0] - tlx, bry - tl[1] - h, brx - tl[0] - w)
        offs = np.array([[(tly - ry) >> i, (tlx - rx) >> i]
                         for i in range(nb + 1)], np.int32)
        return pads, offs

    def feed(self, img: np.ndarray, mask: np.ndarray,
             tl: Tuple[int, int]) -> None:
        """img: [h, w, 3] int16-valued (CV_16S), mask: [h, w] uint8,
        tl: (x, y) panorama coordinates of the image rect."""
        h, w = img.shape[:2]
        (top, left, bottom, right), offs = self._sub_roi(tl, h, w)
        img_b = np.pad(img.astype(np.int16),
                       ((top, bottom), (left, right), (0, 0)),
                       mode="symmetric")          # BORDER_REFLECT
        weight = mask.astype(np.int16)
        weight[mask != 0] += 1                     # 255 -> 256
        w_b = np.pad(weight, ((top, bottom), (left, right)),
                     mode="constant")
        self.dst_laplace, self.dst_weights = [
            list(t) for t in _feed_accum(
                tuple(self.dst_laplace), tuple(self.dst_weights),
                jnp.asarray(img_b), jnp.asarray(w_b), jnp.asarray(offs),
                self.num_bands)]

    def feed_dev(self, img_dev, mask_dev, tl: Tuple[int, int]) -> None:
        """Device-resident feed: img [h,w,3] int16 and mask [h,w] uint8 are
        jax arrays in HBM — border pads, weighting, pyramids, and
        accumulation all run on device (zero per-image host transfers)."""
        h, w = img_dev.shape[:2]
        (top, left, bottom, right), offs = self._sub_roi(tl, h, w)
        img_b = jnp.pad(img_dev.astype(jnp.int16),
                        ((top, bottom), (left, right), (0, 0)),
                        mode="symmetric")
        weight = mask_dev.astype(jnp.int16)
        weight = jnp.where(mask_dev != 0, weight + 1, weight)
        w_b = jnp.pad(weight, ((top, bottom), (left, right)),
                      mode="constant")
        self.dst_laplace, self.dst_weights = [
            list(t) for t in _feed_accum(
                tuple(self.dst_laplace), tuple(self.dst_weights),
                img_b, w_b, jnp.asarray(offs), self.num_bands)]

    # ------------------------------------------------------------------
    def blend(self) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (panorama int16-valued [H, W, 3], mask bool)."""
        _, _, fw, fh = self.final_roi
        pano, mask = _blend_final(tuple(self.dst_laplace),
                                  tuple(self.dst_weights), fh, fw)
        return np.asarray(pano).astype(np.int32), np.asarray(mask)
