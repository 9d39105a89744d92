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


def test_calibrate_rotating_camera_recovers_K():
    """Full-K autocalibration from rotation homographies
    (autocalib.cpp:146-195 parity surface). Gated against synthetic ground
    truth — cv2.detail.calibrateRotatingCamera itself returns a wrong K for
    nonzero principal points (lower-vs-upper Cholesky pitfall), so GT is the
    stronger oracle."""
    from stitchingvideo_tpu.geometry.autocalib import calibrate_rotating_camera
    rng = np.random.default_rng(0)
    K = np.array([[800.0, 2.0, 320.0], [0, 790.0, 240.0], [0, 0, 1.0]])
    Hs = []
    for _ in range(5):
        R = Rotation.from_euler("xyz", rng.uniform(-0.3, 0.3, 3)).as_matrix()
        Hs.append(K @ R @ np.linalg.inv(K))
    Kest = calibrate_rotating_camera(Hs)
    assert Kest is not None
    np.testing.assert_allclose(Kest, K, atol=1e-6)
    # scale-invariance: homographies arrive arbitrarily scaled
    Kest2 = calibrate_rotating_camera([3.7 * H for H in Hs])
    np.testing.assert_allclose(Kest2, K, atol=1e-6)
    # degenerate input (identity motion) must not crash; any K it returns
    # for a single identity homography is unconstrained, so only require
    # "None or finite" — never an exception
    k_degen = calibrate_rotating_camera([np.eye(3)])
    assert k_degen is None or np.all(np.isfinite(k_degen))


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


@pytest.mark.slow
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


def _ba_synthetic_scene(ppx=6.0, ppy=-4.0, aspect=1.02, f=500.0, n=3, m=40):
    """Exact correspondences for cameras with off-center pp and aspect != 1."""
    rng = np.random.default_rng(7)
    yaws = np.radians(np.array([-24.0, 0.0, 24.0]))[:n]
    Rs = np.stack([np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                             [-np.sin(a), 0, np.cos(a)]]) for a in yaws])
    K = np.array([[f, 0, ppx], [0, f * aspect, ppy], [0, 0, 1.0]])
    Kinv = np.linalg.inv(K)
    edges = [(i, i + 1) for i in range(n - 1)]
    pts1 = np.zeros((len(edges), m, 2), np.float32)
    pts2 = np.zeros((len(edges), m, 2), np.float32)
    w = np.ones((len(edges), m), np.float32)
    for e, (i, j) in enumerate(edges):
        H = K @ Rs[j] @ Rs[i].T @ Kinv
        p1 = rng.uniform(-180, 180, (m, 2))
        p1[:, 0] += 105.0 * (1 if j > i else -1)   # bias into the overlap
        q = np.concatenate([p1, np.ones((m, 1))], 1) @ H.T
        pts1[e] = p1
        pts2[e] = q[:, :2] / q[:, 2:3]
    ei = np.array([e[0] for e in edges], np.int32)
    ej = np.array([e[1] for e in edges], np.int32)
    return Rs, ei, ej, pts1, pts2, w


@pytest.mark.slow
def test_ba_refine_mask_per_flag():
    """Each ba_refine_mask flag moves (or freezes) exactly its parameter
    (motion_estimators.cpp:389-438 gating; skew flag inert like the
    reference)."""
    import jax.numpy as jnp
    from stitchingvideo_tpu.register.bundle import bundle_adjust

    Rs, ei, ej, p1, p2, w = _ba_synthetic_scene()
    f0 = jnp.asarray(np.full(3, 480.0, np.float32))   # start off-true
    R0 = jnp.asarray(Rs.astype(np.float32))

    def run(**flags):
        f, R, ppa, cost = bundle_adjust(
            f0, R0, jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(p1),
            jnp.asarray(p2), jnp.asarray(w), kind="reproj", iters=60, **flags)
        return np.asarray(f), np.asarray(ppa), float(cost)

    # focal only: pp frozen at 0, aspect frozen at 1
    f, ppa, _ = run(refine_focal=True)
    assert np.all(ppa[:, :2] == 0.0) and np.all(ppa[:, 2] == 1.0)
    # ppx on: ppx moves toward the true +6 px, ppy stays frozen
    f, ppa, _ = run(refine_focal=True, refine_ppx=True)
    assert np.all(np.abs(ppa[:, 0]) > 0.5), ppa
    assert np.all(ppa[:, 1] == 0.0)
    # all five: the full model fits the data (pp itself is gauge-ambiguous
    # against rotation — the reference's LM has the same degeneracy — so
    # assert fit quality and the identifiable parameters, not raw pp)
    f, ppa, cost = run(refine_focal=True, refine_ppx=True, refine_ppy=True,
                       refine_aspect=True)
    assert cost < 1e-2, cost
    np.testing.assert_allclose(f, 500.0, rtol=0.05)
    # aspect was free to move (it is gauge-free under a pure-yaw rig, so only
    # the freeze/move contract is assertable)
    assert np.any(ppa[:, 2] != 1.0)


@pytest.mark.slow
def test_ba_refine_mask_string_validation():
    """Pipeline rejects malformed masks; skew char accepted but inert."""
    import pytest as _pytest
    from stitchingvideo_tpu.register.pipeline import register_images
    views, _K, _Rs, _f, _tex = synthetic.make_scene(
        n=3, img_wh=(384, 288), fov_deg=55, overlap_frac=0.45, seed=4)
    import dataclasses
    cfg = StitchConfig()
    bad = cfg.replace(register=dataclasses.replace(
        cfg.register, ba_refine_mask="xxx"))
    with _pytest.raises(ValueError, match="ba_refine_mask"):
        register_images(views, bad, seed=0)
    # skew flag flip leaves the result identical (reference: cell (0,1) unread)
    a = cfg.replace(register=dataclasses.replace(
        cfg.register, ba_refine_mask="xxxxx"))
    b = cfg.replace(register=dataclasses.replace(
        cfg.register, ba_refine_mask="x_xxx"))
    ra = register_images(views, a, seed=0)
    rb = register_images(views, b, seed=0)
    np.testing.assert_array_equal(np.asarray(ra.cameras.focal),
                                  np.asarray(rb.cameras.focal))
    np.testing.assert_array_equal(np.asarray(ra.cameras.R),
                                  np.asarray(rb.cameras.R))
