"""Multi-band (Laplacian pyramid) blending.

Parity target: MultiBandBlender (reference src/blenders.cpp:189-377) with
`num_bands = ceil(log2(blend_width)) - 1` chosen by the caller exactly as the
reference CLI does (stitching_detailed.cpp:731-750).

TPU-first deviation (documented): instead of per-image padded-ROI pyramids
accumulated at offsets, each image's pyramid is built over the full canvas
with *normalized convolution* (pyr(img*m)/pyr(m)) so masked-out black pixels
never bleed into coarse bands — same blend character, no halo artifacts, and
every stage is a static-shape conv stack XLA can fuse.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pyramid as pyr

WEIGHT_EPS = 1e-5


def num_bands_for(dst_area_px: float, blend_strength: float = 5.0) -> int:
    """Reference band-count rule (CLI :731-750)."""
    blend_width = float(np.sqrt(dst_area_px) * blend_strength / 100.0)
    if blend_width < 1.0:
        return 0
    return max(int(np.ceil(np.log2(blend_width))) - 1, 0)


def pad_for_bands(h: int, w: int, bands: int) -> Tuple[int, int]:
    """Canvas size rounded up to a multiple of 2^bands (blenders.cpp:250-260)."""
    q = 1 << bands
    return -(-h // q) * q, -(-w // q) * q


@partial(jax.jit, static_argnames=("bands",))
def multiband_blend(images: jnp.ndarray, masks: jnp.ndarray, bands: int):
    """(pano [H, W, 3] float32, mask [H, W] bool).

    images: [N, H, W, 3] canvas-placed (H, W multiples of 2^bands);
    masks: [N, H, W] bool.
    """
    if bands == 0:
        w = masks.astype(jnp.float32)
        acc = jnp.einsum("nhwc,nhw->hwc", images.astype(jnp.float32), w)
        ws = w.sum(0)
        return acc / (ws[..., None] + WEIGHT_EPS), ws > WEIGHT_EPS

    n = images.shape[0]

    def accumulate(carry, idx):
        band_acc, wsum_acc = carry
        img = images[idx].astype(jnp.float32)
        m = masks[idx].astype(jnp.float32)
        # normalized gaussian pyramid of the image under its mask
        gp_m = pyr.gaussian_pyramid(m, bands)
        gp_im = pyr.gaussian_pyramid(img * m[..., None], bands)
        gp_norm = [gm / jnp.maximum(g, WEIGHT_EPS)[..., None]
                   for gm, g in zip(gp_im, gp_m)]
        # laplacian bands of the normalized image
        laps = [gp_norm[l] - pyr.pyr_up(gp_norm[l + 1]) for l in range(bands)]
        laps.append(gp_norm[bands])
        band_acc = [ba + lap * g[..., None]
                    for ba, lap, g in zip(band_acc, laps, gp_m)]
        wsum_acc = [wa + g for wa, g in zip(wsum_acc, gp_m)]
        return (band_acc, wsum_acc), None

    H, W = images.shape[1:3]
    band_acc = [jnp.zeros((H >> l, W >> l, 3), jnp.float32) for l in range(bands + 1)]
    wsum_acc = [jnp.zeros((H >> l, W >> l), jnp.float32) for l in range(bands + 1)]
    carry = (band_acc, wsum_acc)
    # Python loop over images: N is small and static; XLA fuses per-image work.
    for idx in range(n):
        carry, _ = accumulate(carry, idx)
    band_acc, wsum_acc = carry

    norm = [b / (w[..., None] + WEIGHT_EPS) for b, w in zip(band_acc, wsum_acc)]
    pano = pyr.collapse_laplacian(norm)
    return pano, wsum_acc[0] > WEIGHT_EPS
