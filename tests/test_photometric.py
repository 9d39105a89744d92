"""Exposure compensation vs cv2.detail golden."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from stitchingvideo_tpu.photometric.exposure import (  # noqa: E402
    apply_gain, blocks_gain_maps, gain_compensator,
)


def _scene(rng, shift=60):
    """Two overlapping views of the same scene with a brightness offset."""
    base = rng.integers(40, 200, (100, 180, 3)).astype(np.float32)
    img1 = base[:, :120]
    img2 = np.clip(base[:, shift:shift + 120] * 1.25, 0, 255)
    return img1.astype(np.uint8), img2.astype(np.uint8)


def test_gain_compensator_golden(rng):
    img1, img2 = _scene(rng)
    corners = [(0, 0), (60, 0)]
    masks = [255 * np.ones((100, 120), np.uint8)] * 2
    comp = cv2.detail.ExposureCompensator_createDefault(cv2.detail.ExposureCompensator_GAIN)
    comp.feed(corners=corners, images=[img1, img2], masks=masks)
    ref = np.array([np.asarray(g).item() for g in comp.getMatGains()])

    # canvas placement
    H, W = 100, 180
    canvas = np.zeros((2, H, W, 3), np.float32)
    cmask = np.zeros((2, H, W), bool)
    canvas[0, :, :120] = img1
    cmask[0, :, :120] = True
    canvas[1, :, 60:] = img2
    cmask[1, :, 60:] = True
    ours = np.asarray(gain_compensator(jnp.asarray(canvas), jnp.asarray(cmask)))
    np.testing.assert_allclose(ours, ref, rtol=0.02)
    # gains correct direction: img2 is brighter -> gain < 1
    assert ours[1] < 1.0 < ours[0]


def test_blocks_gain_maps_sane(rng):
    img1, img2 = _scene(rng)
    H, W = 100, 180
    canvas = np.zeros((2, H, W, 3), np.float32)
    cmask = np.zeros((2, H, W), bool)
    canvas[0, :, :120] = img1
    cmask[0, :, :120] = True
    canvas[1, :, 60:] = img2
    cmask[1, :, 60:] = True
    gmaps = np.asarray(blocks_gain_maps(jnp.asarray(canvas), jnp.asarray(cmask), 32))
    assert gmaps.shape == (2, 4, 6)
    # overlap region: image 2 (brighter) gains < 1, image 1 gains > 1
    ov1 = gmaps[0][:, 2:3]
    ov2 = gmaps[1][:, 2:3]
    assert ov2.mean() < 1.0 < ov1.mean()
    # applying gains roughly equalizes overlap intensity
    g1 = np.asarray(apply_gain(jnp.asarray(canvas[0]),
                               jnp.asarray(cv2.resize(gmaps[0], (W, H)))))
    g2 = np.asarray(apply_gain(jnp.asarray(canvas[1]),
                               jnp.asarray(cv2.resize(gmaps[1], (W, H)))))
    ov = cmask[0] & cmask[1]
    d_before = np.abs(canvas[0][ov] - canvas[1][ov]).mean()
    d_after = np.abs(g1[ov] - g2[ov]).mean()
    assert d_after < 0.5 * d_before, (d_before, d_after)


def test_blocks_gain_golden_aligned(rng):
    """With both images at corner (0,0) and equal size, our canvas-aligned
    block grid coincides with BlocksGainCompensator's per-image grid — gains
    should agree quantitatively."""
    base = rng.integers(40, 200, (96, 128, 3)).astype(np.float32)
    img1 = base.astype(np.uint8)
    img2 = np.clip(base * 1.2, 0, 255).astype(np.uint8)
    corners = [(0, 0), (0, 0)]
    masks = [255 * np.ones((96, 128), np.uint8)] * 2
    comp = cv2.detail.ExposureCompensator_createDefault(
        cv2.detail.ExposureCompensator_GAIN_BLOCKS)
    comp.feed(corners=corners, images=[img1, img2], masks=masks)
    ref = [np.asarray(g) for g in comp.getMatGains()]

    canvas = np.stack([img1, img2]).astype(np.float32)
    cmask = np.ones((2, 96, 128), bool)
    ours = np.asarray(blocks_gain_maps(jnp.asarray(canvas),
                                       jnp.asarray(cmask), 32))
    # same block-grid resolution
    assert ours.shape[1:] == ref[0].shape, (ours.shape, ref[0].shape)
    for i in range(2):
        np.testing.assert_allclose(ours[i], ref[i], atol=0.06)
    # and the gains correct the 1.2x offset in the right direction
    assert ours[1].mean() < 1.0 < ours[0].mean()
