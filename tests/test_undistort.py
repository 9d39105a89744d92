"""Undistortion map vs cv2.initUndistortRectifyMap golden (the reference's
RunTestEyeFishMap path, 64-bit driver :201-238, with its hard-coded
intrinsics)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from stitchingvideo_tpu.config import UndistortConfig  # noqa: E402
from stitchingvideo_tpu.geometry.undistort import (  # noqa: E402
    build_undistort_map, compose_maps, undistort_map_from_config)


def test_undistort_map_matches_cv2():
    cfg = UndistortConfig()  # defaults = the reference driver's constants
    K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]], np.float64)
    dist = np.array(cfg.dist, np.float64)
    W, H = 1280, 720
    ref_x, ref_y = cv2.initUndistortRectifyMap(
        K, dist, None, K, (W, H), cv2.CV_32FC1)
    ours_x, ours_y = undistort_map_from_config(cfg, (H, W))
    np.testing.assert_allclose(np.asarray(ours_x), ref_x, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ours_y), ref_y, atol=2e-2)


def test_compose_maps_identity():
    """Composing with an identity inner map reproduces the outer map."""
    import jax.numpy as jnp
    H, W = 40, 60
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    inner_x = jnp.asarray(xx)
    inner_y = jnp.asarray(yy)
    outer_x = jnp.asarray(xx * 0.9 + 2.0)
    outer_y = jnp.asarray(yy * 0.8 + 1.0)
    cx, cy = compose_maps(outer_x, outer_y, inner_x, inner_y)
    np.testing.assert_allclose(np.asarray(cx), np.asarray(outer_x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(cy), np.asarray(outer_y), atol=1e-3)
