"""Warp + ROI vs cv2.PyRotationWarper.buildMaps/warp."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from stitchingvideo_tpu.geometry.warp import build_maps, warp_image, warp_roi  # noqa: E402


def _setup():
    K = np.array([[700, 0, 320], [0, 700, 240], [0, 0, 1]], np.float32)
    a = 0.15
    Ry = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]], np.float32)
    return K, Ry


@pytest.mark.parametrize("kind", ["plane", "cylindrical", "spherical", "fisheye"])
def test_roi_matches_cv2(kind):
    K, R = _setup()
    w = cv2.PyRotationWarper(kind, 700.0)
    rect, _xmap_cv, _ymap_cv = w.buildMaps((640, 480), K, R)
    ours = warp_roi(kind, 700.0, K, R, (640, 480))
    # ROI agreement within 2 px of position and size
    assert abs(ours[0] - rect[0]) <= 2, (ours, rect)
    assert abs(ours[1] - rect[1]) <= 2
    assert abs(ours[2] - rect[2]) <= 3
    assert abs(ours[3] - rect[3]) <= 3


@pytest.mark.parametrize("kind", ["cylindrical", "spherical"])
def test_warp_image_matches_cv2(kind, rng):
    K, R = _setup()
    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    warper = cv2.PyRotationWarper(kind, 700.0)
    corner_cv, warped_cv = warper.warp(img, K, R, cv2.INTER_LINEAR, cv2.BORDER_REFLECT)
    corner, warped = warp_image(img, kind, 700.0, K, R, interp="linear", border="reflect")
    warped = np.asarray(warped)
    # Align the overlapping region (corners may differ by a pixel).
    dx, dy = corner[0] - corner_cv[0], corner[1] - corner_cv[1]
    h = min(warped.shape[0] - max(0, -dy), warped_cv.shape[0] - max(0, dy)) - 2
    w = min(warped.shape[1] - max(0, -dx), warped_cv.shape[1] - max(0, dx)) - 2
    a = warped[max(0, -dy):max(0, -dy) + h, max(0, -dx):max(0, -dx) + w].astype(np.float32)
    b = warped_cv[max(0, dy):max(0, dy) + h, max(0, dx):max(0, dx) + w].astype(np.float32)
    # Interior pixels should agree closely (PSNR gate).
    mse = np.mean((a - b) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 35.0, psnr


def test_build_maps_padding():
    K, R = _setup()
    corner, (xmap, ymap, valid) = build_maps("cylindrical", 700.0, K, R, (640, 480))
    h, w = xmap.shape
    corner2, (xmap2, ymap2, _) = build_maps(
        "cylindrical", 700.0, K, R, (640, 480), pad_to=(h + 7, w + 5))
    assert xmap2.shape == (h + 7, w + 5)
    assert corner == corner2
    np.testing.assert_allclose(np.asarray(xmap2[:h, :w]), np.asarray(xmap), atol=1e-4)


@pytest.mark.parametrize("kind", ["plane", "cylindrical", "spherical",
                                  "fisheye"])
def test_roi_batch_matches_single(kind):
    """detect_result_roi_batch (one dispatch for all cameras, numpy 3x3
    math) agrees with the per-camera device path within 1 px of truncation
    on every bound (float32 inverse rounding can land a bound on the far
    side of an integer)."""
    from stitchingvideo_tpu.geometry.warp import (detect_result_roi,
                                                  detect_result_roi_batch)
    K, _ = _setup()
    Ks, Rs = [], []
    for a in (0.0, 0.12, -0.31, 0.55):
        Ry = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                       [-np.sin(a), 0, np.cos(a)]], np.float32)
        Ks.append(K.astype(np.float64))
        Rs.append(Ry)
    sizes = [(640, 480)] * len(Ks)
    batch = detect_result_roi_batch(kind, 700.0, Ks, Rs, sizes)
    for i, roi_b in enumerate(batch):
        roi_s = detect_result_roi(kind, 700.0, Ks[i], Rs[i], sizes[i])
        assert all(abs(a - b) <= 1 for a, b in zip(roi_b, roi_s)), \
            (kind, i, roi_b, roi_s)
    # mixed sizes fall back to the single path: exact agreement
    sizes2 = list(sizes)
    sizes2[1] = (512, 480)
    batch2 = detect_result_roi_batch(kind, 700.0, Ks, Rs, sizes2)
    for i, roi_b in enumerate(batch2):
        assert roi_b == detect_result_roi(kind, 700.0, Ks[i], Rs[i],
                                          sizes2[i])
