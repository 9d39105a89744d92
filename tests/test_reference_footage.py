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
    import dataclasses
    import imageio.v3 as iio
    from scipy.spatial.transform import Rotation
    from stitchingvideo_tpu.config import StitchConfig
    from stitchingvideo_tpu.models.stitcher import _resize, _scale_for
    from stitchingvideo_tpu.register.pipeline import register_images

    imgs = [np.asarray(iio.imread(f"{REF_DIR}/img-{i}.jpg"))[..., :3]
            for i in range(6)]
    cfg = StitchConfig()
    cfg = cfg.replace(scales=dataclasses.replace(cfg.scales, work_megapix=0.3))
    ws = _scale_for(0.3, imgs[0].shape[1], imgs[0].shape[0])
    work = [_resize(im, ws) for im in imgs]
    reg = register_images(work, cfg, seed=0)

    # all six cameras join the panorama
    assert len(reg.indices) == 6, reg.indices
    focals = np.asarray(reg.cameras.focal)
    med = float(np.median(focals))
    assert np.all(np.abs(focals / med - 1.0) < 0.15), focals
    # yaw chain covers ~360°: sorted yaws roughly evenly spaced
    yaws = sorted(
        Rotation.from_matrix(np.asarray(reg.cameras.R[i], np.float64))
        .as_rotvec()[1] for i in range(6))
    gaps = np.diff(yaws)
    assert np.all(gaps > 0.5) and np.all(gaps < 1.6), yaws
    span = yaws[-1] - yaws[0]
    assert 4.0 < span < 5.6, span   # ~5 gaps of ~2pi/6
