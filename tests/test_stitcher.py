"""End-to-end Stitcher tests: synthetic scenes reconstruct the ground-truth
panorama region; output compared against cv2.Stitcher for fidelity."""
import dataclasses

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from stitchingvideo_tpu.config import StitchConfig  # noqa: E402
from stitchingvideo_tpu.models.stitcher import Stitcher  # noqa: E402
from stitchingvideo_tpu.utils import synthetic  # noqa: E402


def _psnr(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))


def _cfg(**compose_kw):
    cfg = StitchConfig()
    compose = dataclasses.replace(cfg.compose, **compose_kw)
    return cfg.replace(compose=compose)


@pytest.fixture(scope="module")
def synth_scene_reg():
    """Scene + ONE work-scale registration shared by the blend/seam combo
    tests below — registration (features/matching/BA/wave) is independent of
    the compose-stage blend/seam choices, so re-running it per combo only
    repeated the expensive common stage."""
    from stitchingvideo_tpu.models.stitcher import _resize_all, _scale_for
    from stitchingvideo_tpu.register.pipeline import register_images

    views, K, Rs, f, tex = synthetic.make_scene(
        n=3, img_wh=(512, 384), fov_deg=55, overlap_frac=0.4, seed=3)
    cfg = _cfg(warp_type="spherical", expos_comp="no")
    ws = _scale_for(cfg.scales.work_megapix, views[0].shape[1],
                    views[0].shape[0])
    reg = register_images(_resize_all(views, ws), cfg, seed=0)
    return views, ws, reg


@pytest.mark.slow
def test_stitch_synthetic_e2e():
    """One full stitch() E2E (registration + faithful compose in one call)."""
    views, *_ = synthetic.make_scene(
        n=3, img_wh=(512, 384), fov_deg=55, overlap_frac=0.4, seed=3)
    cfg = _cfg(warp_type="spherical", blend_type="feather",
               seam_find="voronoi", expos_comp="no")
    pano, mask = Stitcher(cfg).stitch(views)
    assert pano.ndim == 3 and pano.shape[2] == 3
    assert mask.any()
    assert pano.shape[1] > 600
    assert mask.mean() > 0.5
    assert pano[mask].mean() > 30


@pytest.mark.parametrize("blend,seam", [
    ("multiband", "gc_color"),
    ("no", "voronoi"),
    ("multiband", "dp_color"),
])
@pytest.mark.slow
def test_stitch_synthetic(blend, seam, synth_scene_reg):
    views, ws, reg = synth_scene_reg
    from stitchingvideo_tpu.models.compose_cv import compose_panorama_cv
    cfg = _cfg(warp_type="spherical", blend_type=blend, seam_find=seam,
               expos_comp="no")
    kept = [views[i] for i in reg.indices]
    pano, mask = compose_panorama_cv(kept, reg.cameras,
                                     float(reg.warped_image_scale), ws, cfg)
    assert pano.ndim == 3 and pano.shape[2] == 3
    assert mask.any()
    # panorama must be wider than a single view and mostly covered
    assert pano.shape[1] > 600
    assert mask.mean() > 0.5
    # interior not black where mask set
    assert pano[mask].mean() > 30


@pytest.mark.slow
def test_stitch_mixed_resolution_cameras():
    """Cameras with different resolutions go through the per-camera seam
    path (no batched warp) and must still stitch (reference CLI accepts
    arbitrary image sizes, stitching_detailed.cpp:359-409)."""
    views, K, Rs, f, tex = synthetic.make_scene(
        n=3, img_wh=(512, 384), fov_deg=55, overlap_frac=0.4, seed=5)
    # downscale the middle camera 25% — a mixed-resolution rig
    views = list(views)
    views[1] = cv2.resize(views[1], (384, 288),
                          interpolation=cv2.INTER_AREA)
    cfg = _cfg(warp_type="cylindrical", blend_type="feather",
               seam_find="voronoi", expos_comp="no", faithful=False)
    st = Stitcher(cfg)
    pano, mask = st.stitch(views)
    assert pano.shape[1] > 600 and mask.mean() > 0.4
    assert pano[mask].mean() > 30


@pytest.mark.slow
def test_stitch_exposure_compensation():
    """Brightness-offset views -> gains equalize the output overlap."""
    views, K, Rs, f, tex = synthetic.make_scene(
        n=3, img_wh=(512, 384), fov_deg=55, overlap_frac=0.4, seed=4)
    views = list(views)
    views[1] = np.clip(views[1].astype(np.float32) * 1.3, 0, 255).astype(np.uint8)
    cfg = _cfg(warp_type="spherical", blend_type="feather", seam_find="voronoi",
               expos_comp="gain_blocks")
    pano, mask = Stitcher(cfg).stitch(views)
    cfg_no = _cfg(warp_type="spherical", blend_type="no", seam_find="voronoi",
                  expos_comp="no")
    pano_no, _ = Stitcher(cfg_no).stitch(views)
    # with compensation + feathering the column-wise brightness profile is
    # smoother than hard pasting without compensation
    def roughness(p, m):
        col = np.where(m.sum(0) > 0, p.mean(-1).sum(0) / np.maximum(m.sum(0), 1), 0)
        g = np.abs(np.diff(col))
        return np.percentile(g[g > 0], 98)
    assert roughness(pano.astype(np.float32), mask) < \
        roughness(pano_no.astype(np.float32), mask)


def _ncc_max(a: np.ndarray, b: np.ndarray, max_shift: int = 6) -> float:
    """Max normalized cross-correlation of two grayscale images over small
    2-D shifts (registrations differ slightly, so allow a few px of slack)."""
    def norm(x):
        x = x - x.mean()
        return x / max(np.sqrt((x * x).mean()), 1e-9)
    a = norm(a.astype(np.float64))
    b = norm(b.astype(np.float64))
    best = -1.0
    h, w = a.shape
    c = max_shift
    ac = a[c:h - c, c:w - c]
    ac = (ac - ac.mean()) / max(ac.std(), 1e-9)
    for dy in range(-c, c + 1):
        for dx in range(-c, c + 1):
            bc = b[c + dy:h - c + dy, c + dx:w - c + dx]
            bc = (bc - bc.mean()) / max(bc.std(), 1e-9)
            best = max(best, float((ac * bc).mean()))
    return best


@pytest.mark.slow
def test_stitch_vs_cv2_stitcher():
    """Our panorama vs cv2.Stitcher panorama on the same views: same output
    class AND matching content (NCC of the coarse panoramas >= 0.8)."""
    views, K, Rs, f, tex = synthetic.make_scene(
        n=3, img_wh=(512, 384), fov_deg=55, overlap_frac=0.45, seed=5)
    cv_st = cv2.Stitcher_create(cv2.Stitcher_PANORAMA)
    status, cv_pano = cv_st.stitch(list(views))
    if status != cv2.Stitcher_OK:
        pytest.skip(f"cv2.Stitcher failed on synthetic scene: {status}")
    cfg = _cfg(warp_type="spherical", blend_type="multiband", seam_find="gc_color",
               expos_comp="gain_blocks")
    pano, mask = Stitcher(cfg).stitch(views)
    # same panorama class output
    assert abs(pano.shape[0] - cv_pano.shape[0]) / cv_pano.shape[0] < 0.25
    assert abs(pano.shape[1] - cv_pano.shape[1]) / cv_pano.shape[1] < 0.25
    # content assertion: coarse grayscale panoramas correlate strongly
    size = (256, 64)
    g_cv = cv2.resize(cv_pano.mean(-1).astype(np.float32), size)
    g_us = cv2.resize(pano.mean(-1).astype(np.float32), size)
    ncc = _ncc_max(g_cv, g_us)
    assert ncc >= 0.8, f"panorama content NCC {ncc:.3f} < 0.8"


@pytest.mark.slow
def test_registration_state_roundtrip(tmp_path):
    views, *_ = synthetic.make_scene(n=3, img_wh=(512, 384), seed=3)
    cfg = _cfg(warp_type="cylindrical", blend_type="feather", seam_find="voronoi",
               expos_comp="no")
    st = Stitcher(cfg)
    reg, reg_result, cscale = st.estimate_transform(views)
    p = tmp_path / "reg.npz"
    reg.save(str(p))
    from stitchingvideo_tpu.models.registration import Registration
    reg2 = Registration.load(str(p))
    np.testing.assert_allclose(np.asarray(reg2.xmaps), np.asarray(reg.xmaps))
    assert reg2.canvas_wh == reg.canvas_wh
    pano1, _ = st.compose_panorama(views, reg, reg_result, cscale)
    pano2, _ = st.compose_panorama(views, reg2, reg_result, cscale)
    np.testing.assert_array_equal(pano1, pano2)


@pytest.mark.parametrize("kind", ["fisheye", "mercator"])
@pytest.mark.slow
def test_stitch_exotic_warp_types(kind):
    """Integration smoke: the full pipeline runs for non-default projections
    (ROI detection + map rasterization + blending). Two representative kinds
    here; per-map parity vs cv2.PyRotationWarper covers all 15 projections
    (test_projections.py)."""
    views, *_ = synthetic.make_scene(n=3, img_wh=(384, 288), fov_deg=55,
                                     overlap_frac=0.45, seed=6)
    cfg = _cfg(warp_type=kind, blend_type="feather", seam_find="voronoi",
               expos_comp="no")
    pano, mask = Stitcher(cfg).stitch(views)
    assert mask.any()
    assert pano.shape[0] > 50 and pano.shape[1] > 200
    assert pano[mask].mean() > 30


def test_stitcher_accessors():
    """cv::Stitcher accessor parity: cameras(), component(), work_scale()."""
    views, *_ = synthetic.make_scene(n=3, img_wh=(384, 288), seed=3)
    cfg = _cfg(warp_type="cylindrical", blend_type="no", seam_find="voronoi",
               expos_comp="no")
    st = Stitcher(cfg)
    assert st.cameras() is None and st.component() is None
    st.estimate_transform(views)
    assert st.cameras() is not None
    assert sorted(st.component()) == [0, 1, 2]
    assert 0 < st.work_scale() <= 1.0


def test_center_gauge_wrap_straddle():
    """A rig whose azimuth span straddles lon=+-pi gets re-gauged so the
    cylindrical canvas covers only the true footprint instead of the whole
    2*pi wrap (the free global-yaw gauge of the rotation model; the
    reference never normalizes it and pays an inflated canvas whenever the
    arbitrary BA gauge lands a camera on the seam)."""
    from stitchingvideo_tpu.geometry.warp import warp_roi
    from stitchingvideo_tpu.models.camera import Cameras
    from stitchingvideo_tpu.models.stitcher import _center_gauge

    f, w, h = 50.0, 64, 48
    yaws = np.deg2rad([165.0, 180.0, -165.0])  # cluster across the seam
    def rot_y(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    R = np.stack([rot_y(a) for a in yaws])
    cams = Cameras.create(focal=np.full(3, f), ppx=np.full(3, w / 2),
                          ppy=np.full(3, h / 2), R=R)

    out = _center_gauge(cams, "cylindrical")
    Rn = np.asarray(out.R)
    new_yaw = np.arctan2(Rn[:, 0, 2], Rn[:, 2, 2])
    # rig re-centered away from the seam; relative geometry untouched
    assert np.max(np.abs(new_yaw)) < np.deg2rad(40)
    for i in range(3):
        for j in range(3):
            np.testing.assert_allclose(Rn[i] @ Rn[j].T,
                                       R[i] @ R[j].T, atol=1e-5)
    # the wave-corrected vertical is preserved (rotation about pano y)
    np.testing.assert_allclose(Rn[:, 1, :], R[:, 1, :], atol=1e-6)

    def union_w(c):
        rois = [warp_roi("cylindrical", f, np.asarray(c.K())[i],
                         np.asarray(c.R)[i], (w, h)) for i in range(3)]
        x0 = min(r[0] for r in rois)
        x1 = max(r[0] + r[2] for r in rois)
        return x1 - x0
    assert union_w(out) < union_w(cams) / 2  # straddle cost eliminated

    # non-wrapping projections are left untouched
    same = _center_gauge(cams, "plane")
    np.testing.assert_allclose(np.asarray(same.R), R)


def test_every_camera_contributes_and_canvas_bounded():
    """Regression for a comprehension-scope capture bug (leftover seam-loop
    `tlx` leaked into the compose ROI widths): the compose clip windows went
    negative for some cameras — silently dropping them from the composite —
    while other widths inflated the canvas past one full cylindrical wrap."""
    views, *_ = synthetic.make_scene(n=3, img_wh=(384, 288), fov_deg=55,
                                     overlap_frac=0.4, seed=3)
    cfg = _cfg(warp_type="cylindrical", blend_type="no", seam_find="voronoi",
               expos_comp="no")
    st = Stitcher(cfg)
    reg, rres, _cs = st.estimate_transform(views)
    v = np.asarray(reg.valid)
    counts = v.reshape(v.shape[0], -1).sum(axis=1)
    assert (counts > 0).all(), f"camera(s) with zero valid pixels: {counts}"
    # one full wrap (2*pi*scale) + bucket pad bounds the canvas width
    CW, _CH = reg.canvas_wh
    assert CW <= 2 * np.pi * reg.warp_scale + 65, (CW, reg.warp_scale)
