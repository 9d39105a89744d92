"""Regression on the reference's real 6-camera test frames (read-only mount).

Validates that registration recovers the physical rig: a full-360° yaw chain
with consistent focals — the same scene whose stitched output ships in the
reference repo (Release/mystitching.jpg, 8837x1226). Skipped when the
reference mount is absent.
"""
import os

import numpy as np
import pytest

REF_DIR = "/root/reference/stitching/OpenCV2.4.11-Stitching/Release/output1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference footage not mounted")


def test_reference_rig_registration():
    import imageio.v3 as iio
    from scipy.spatial.transform import Rotation
    from stitchingvideo_tpu.config import StitchConfig
    from stitchingvideo_tpu.models.stitcher import _resize, _scale_for
    from stitchingvideo_tpu.register.pipeline import register_images

    imgs = [np.asarray(iio.imread(f"{REF_DIR}/img-{i}.jpg"))[..., :3]
            for i in range(6)]
    cfg = StitchConfig()
    ws = _scale_for(cfg.scales.work_megapix, imgs[0].shape[1], imgs[0].shape[0])
    work = [_resize(im, ws) for im in imgs]
    reg = register_images(work, cfg, seed=0)

    # all six cameras join the panorama
    assert len(reg.indices) == 6, reg.indices
    focals = np.asarray(reg.cameras.focal)
    med = float(np.median(focals))
    assert np.all(np.abs(focals / med - 1.0) < 0.15), focals
    del Rotation
    # yaw chain covers the full circle: camera z-axes spread evenly in yaw
    Rs = np.asarray(reg.cameras.R, np.float64)
    yaws = sorted(float(np.arctan2(R[0, 2], R[2, 2])) for R in Rs)
    circ = np.diff(yaws + [yaws[0] + 2 * np.pi])   # 6 circular gaps
    assert np.isclose(circ.sum(), 2 * np.pi, atol=1e-6)
    assert np.all(circ > 0.5) and np.all(circ < 1.6), yaws
