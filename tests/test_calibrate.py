"""Calibration tool: synthetic chessboard views with known intrinsics."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from stitchingvideo_tpu.tools.calibrate import calibrate_chessboard


def _render_board(K, dist, rvec, tvec, board=(9, 6), sq=30, size=(640, 480)):
    """Render a synthetic chessboard via projectPoints + fillConvexPoly."""
    img = np.full((size[1], size[0]), 140, np.uint8)
    for by in range(board[1] + 1):
        for bx in range(board[0] + 1):
            if (bx + by) % 2:
                continue
            corners3 = np.array([
                [bx * sq, by * sq, 0], [(bx + 1) * sq, by * sq, 0],
                [(bx + 1) * sq, (by + 1) * sq, 0], [bx * sq, (by + 1) * sq, 0],
            ], np.float32)
            pts, _ = cv2.projectPoints(corners3, rvec, tvec, K, dist)
            cv2.fillConvexPoly(img, pts.reshape(-1, 2).astype(np.int32), 20)
    return img


def test_calibrate_recovers_intrinsics():
    f_true = 600.0
    K = np.array([[f_true, 0, 320], [0, f_true, 240], [0, 0, 1]], np.float64)
    dist = np.array([-0.15, 0.05, 0.001, -0.001, 0.0])
    rng = np.random.default_rng(0)
    views = []
    for k in range(8):
        rvec = np.array([0.25 * np.sin(k), 0.25 * np.cos(k), 0.1 * np.sin(2 * k)])
        tvec = np.array([-120 + 12 * k, -90 + 6 * k, 420 + 18 * k], np.float64)
        views.append(_render_board(K, dist, rvec, tvec))
    out = calibrate_chessboard(views, board_size=(9, 6), square_size=30)
    assert out["n_used"] >= 5
    assert out["fx"] == pytest.approx(f_true, rel=0.05)
    assert out["fy"] == pytest.approx(f_true, rel=0.05)
    assert out["dist"][0] == pytest.approx(-0.15, abs=0.05)
