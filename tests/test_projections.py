"""Projection family vs cv2.PyRotationWarper golden values + round-trip.

Parity target: reference warpers (include/opencv2/stitching/detail/warpers.hpp:
122-501, warpers_inl.hpp:207-765).
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from stitchingvideo_tpu.geometry.projections import (  # noqa: E402
    PROJECTION_KINDS, camera_maps, map_backward, map_forward,
)


def _setup():
    K = np.array([[800, 0, 640], [0, 820, 360], [0, 0, 1]], np.float32)
    cr, sr = np.cos(0.1), np.sin(0.1)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]], np.float32)
    cy, sy = np.cos(-0.22), np.sin(-0.22)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
    R = (Ry @ Rx).astype(np.float32)
    return K, R


@pytest.mark.parametrize("kind", PROJECTION_KINDS)
def test_forward_matches_cv2(kind):
    K, R = _setup()
    r_kinv, _ = camera_maps(K, R)
    rng = np.random.default_rng(7)
    pts = rng.uniform([100, 100], [1180, 620], size=(64, 2)).astype(np.float32)
    warper = cv2.PyRotationWarper(kind, 800.0)
    ref = np.array([warper.warpPoint((float(p[0]), float(p[1])), K, R) for p in pts])
    u, v = map_forward(kind, 800.0, r_kinv, pts[:, 0], pts[:, 1])
    ours = np.stack([np.asarray(u), np.asarray(v)], axis=1)
    np.testing.assert_allclose(ours, ref, atol=5e-3)


@pytest.mark.parametrize("kind", PROJECTION_KINDS)
def test_backward_roundtrip(kind):
    K, R = _setup()
    r_kinv, k_rinv = camera_maps(K, R)
    rng = np.random.default_rng(8)
    pts = rng.uniform([100, 100], [1180, 620], size=(64, 2)).astype(np.float32)
    u, v = map_forward(kind, 800.0, r_kinv, pts[:, 0], pts[:, 1])
    x, y, valid = map_backward(kind, 800.0, k_rinv, u, v)
    valid = np.asarray(valid)
    assert valid.mean() > 0.9
    got = np.stack([np.asarray(x), np.asarray(y)], axis=1)[valid]
    np.testing.assert_allclose(got, pts[valid], atol=5e-3)


def test_batched_over_cameras():
    """vmap over a camera axis must agree with per-camera calls."""
    import jax
    import jax.numpy as jnp
    K, R = _setup()
    K2 = K.copy(); K2[0, 0] = 900; K2[1, 1] = 910
    Ks = np.stack([K, K2]); Rs = np.stack([R, np.eye(3, dtype=np.float32)])
    r_kinv, _ = camera_maps(Ks, Rs)
    pts = np.array([[700.0, 400.0], [200.0, 300.0]], np.float32)
    f = jax.vmap(lambda rk: map_forward("spherical", 800.0, rk, pts[:, 0], pts[:, 1]))
    u, v = f(jnp.asarray(r_kinv))
    for i in range(2):
        u1, v1 = map_forward("spherical", 800.0, r_kinv[i], pts[:, 0], pts[:, 1])
        np.testing.assert_allclose(u[i], u1, rtol=1e-6)
        np.testing.assert_allclose(v[i], v1, rtol=1e-6)
