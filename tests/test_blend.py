"""Pyramids vs cv2.pyrDown/pyrUp; blenders vs cv2.detail blenders."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from stitchingvideo_tpu.blend.feather import feather_blend, feather_weights  # noqa: E402
from stitchingvideo_tpu.blend.multiband import (  # noqa: E402
    multiband_blend, num_bands_for, pad_for_bands,
)
from stitchingvideo_tpu.ops import pyramid  # noqa: E402


def _psnr(a, b, mask=None):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if mask is not None:
        a = a[mask]
        b = b[mask]
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))


def test_pyr_down_matches_cv2(rng):
    img = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)
    ref = cv2.pyrDown(img)
    ours = np.asarray(pyramid.pyr_down(jnp.asarray(img)))
    np.testing.assert_allclose(ours, ref, atol=0.5)


def test_pyr_up_matches_cv2(rng):
    img = rng.uniform(0, 255, (32, 48, 3)).astype(np.float32)
    ref = cv2.pyrUp(img)
    ours = np.asarray(pyramid.pyr_up(jnp.asarray(img)))
    # interiors match; cv2 handles the border rows slightly differently
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=0.5)


def test_laplacian_roundtrip(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 64, 3)).astype(np.float32))
    pyr = pyramid.laplacian_pyramid(img, 3)
    rec = pyramid.collapse_laplacian(pyr)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(img), atol=1e-2)


def _two_view_canvas(rng, H=128, W=192, ov=64):
    base = rng.integers(30, 220, (H, W, 3)).astype(np.float32)
    base = cv2.GaussianBlur(base, (5, 5), 1.5)
    img1 = base[:, :W - ov]
    img2 = base[:, W - 2 * ov:]
    canvas = np.zeros((2, H, W, 3), np.float32)
    masks = np.zeros((2, H, W), bool)
    canvas[0, :, :W - ov] = img1
    masks[0, :, :W - ov] = True
    canvas[1, :, W - 2 * ov:] = img2
    masks[1, :, W - 2 * ov:] = True
    return canvas, masks, img1, img2, (0, 0), (W - 2 * ov, 0)


def test_feather_blend_matches_cv2(rng):
    canvas, masks, img1, img2, c1, c2 = _two_view_canvas(rng)
    H, W = canvas.shape[1:3]
    fb = cv2.detail_FeatherBlender(0.02)
    fb.prepare((0, 0, W, H))
    fb.feed(img1.astype(np.int16), 255 * np.ones(img1.shape[:2], np.uint8), c1)
    fb.feed(img2.astype(np.int16), 255 * np.ones(img2.shape[:2], np.uint8), c2)
    ref, ref_mask = fb.blend(None, None)
    w = feather_weights(jnp.asarray(masks), 0.02)
    ours, omask = feather_blend(jnp.asarray(canvas), w)
    m = np.asarray(ref_mask) > 0
    p = _psnr(np.clip(np.asarray(ours), 0, 255), np.asarray(ref, np.float32), m)
    assert p > 35.0, p


def test_multiband_blend_matches_cv2(rng):
    canvas, masks, img1, img2, c1, c2 = _two_view_canvas(rng)
    H, W = canvas.shape[1:3]
    bands = 3
    mb = cv2.detail_MultiBandBlender(0, bands, cv2.CV_32F)
    mb.prepare((0, 0, W, H))
    mb.feed(img1.astype(np.int16), 255 * np.ones(img1.shape[:2], np.uint8), c1)
    mb.feed(img2.astype(np.int16), 255 * np.ones(img2.shape[:2], np.uint8), c2)
    ref, ref_mask = mb.blend(None, None)
    ours, omask = multiband_blend(jnp.asarray(canvas), jnp.asarray(masks), bands)
    m = np.asarray(ref_mask) > 0
    # compare interior (band edges differ slightly by construction)
    m[:4] = m[-4:] = False
    m[:, :4] = m[:, -4:] = False
    p = _psnr(np.clip(np.asarray(ours), 0, 255), np.asarray(ref, np.float32), m)
    assert p > 30.0, p


def test_num_bands_rule():
    # reference: num_bands = ceil(log2(blend_width)) - 1, CLI :731-750
    assert num_bands_for(1000 * 1000, 5.0) == 5  # width 50 -> ceil(log2 50)=6 -> 5
    assert num_bands_for(100, 0.0) == 0
    assert pad_for_bands(100, 130, 3) == (104, 136)
