"""Registration stack tests: autocalib golden vs cv2, waveCorrect golden vs cv2,
BA + full pipeline on synthetic ground truth."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from scipy.spatial.transform import Rotation  # noqa: E402

from stitchingvideo_tpu.config import StitchConfig  # noqa: E402
from stitchingvideo_tpu.geometry.autocalib import focals_from_homography  # noqa: E402
from stitchingvideo_tpu.register.wave import wave_correct  # noqa: E402
from stitchingvideo_tpu.register import graph as graph_mod  # noqa: E402
from stitchingvideo_tpu.utils import synthetic  # noqa: E402


def _centered_K(f):
    return np.array([[f, 0, 0], [0, f, 0], [0, 0, 1]], np.float64)


def test_focals_from_homography_golden():
    f1t, f2t = 900.0, 1000.0
    R = Rotation.from_euler("yx", [0.3, 0.05]).as_matrix()
    H = (_centered_K(f2t) @ R @ np.linalg.inv(_centered_K(f1t))).astype(np.float64)
    H /= H[2, 2]
    f0, f1 = focals_from_homography(H)
    # (cv2.detail.focalsFromHomography has out-params not returned by the
    # Python binding, so validate against the known ground-truth focals.)
    assert f0 == pytest.approx(f1t, rel=0.02)
    assert f1 == pytest.approx(f2t, rel=0.02)


@pytest.mark.parametrize("kind,cvkind", [
    ("horiz", cv2.detail.WAVE_CORRECT_HORIZ),
    ("vert", cv2.detail.WAVE_CORRECT_VERT),
])
def test_wave_correct_golden(kind, cvkind):
    rng = np.random.default_rng(5)
    Rs = []
    rig = Rotation.from_rotvec([0.15, 0.0, 0.08]).as_matrix()
    for k in range(5):
        R = Rotation.from_euler("y", (k - 2) * 0.4).as_matrix()
        R = R @ Rotation.from_rotvec(rng.normal(0, 0.02, 3)).as_matrix()
        Rs.append((rig @ R).astype(np.float32))
    ref = cv2.detail.waveCorrect([R.copy() for R in Rs], cvkind)
    ours = wave_correct(np.stack(Rs), kind)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_spanning_tree_and_component():
    conf = {(0, 1): 2.0, (1, 2): 1.5, (3, 4): 2.5}
    keep = graph_mod.biggest_component(5, conf, 1.0)
    assert keep == [0, 1, 2]
    tree, center = graph_mod.max_spanning_tree(3, {(0, 1): 10, (1, 2): 5, (0, 2): 1})
    assert set(tree) == {(0, 1), (1, 2)}
    assert center == 1


def test_full_registration_synthetic():
    """End-to-end registration on a rendered 4-camera scene recovers the rig."""
    views, K, Rs_true, f_true, _tex = synthetic.make_scene(
        n=4, img_wh=(512, 384), fov_deg=55, overlap_frac=0.4, seed=2)
    cfg = StitchConfig()
    from stitchingvideo_tpu.register.pipeline import register_images
    reg = register_images(views, cfg, seed=0)
    assert len(reg.indices) == 4, reg.indices
    focals = np.asarray(reg.cameras.focal)
    # focal recovery within 3%
    np.testing.assert_allclose(focals, f_true, rtol=0.03)
    # relative rotations: angle between estimated and true relative rotation
    R_est = np.asarray(reg.cameras.R)
    for a in range(4):
        for b in range(4):
            rel_est = R_est[a] @ R_est[b].T
            rel_true = Rs_true[a] @ Rs_true[b].T
            dR = rel_est @ rel_true.T
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            assert ang < 1.0, (a, b, ang)
