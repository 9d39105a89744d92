"""Pixel-parity gates against OpenCV (the BASELINE.json north star).

Component gates are bit-level; the end-to-end gate is the PSNR >= 40 dB
criterion: the same views, composed by cv2.detail (the reference flow,
stitching_detailed.cpp:545-764) and by our faithful compose path
(models/compose_cv.py) from identical camera parameters, must agree to
>= 40 dB on the covered region.
"""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REF_DIR = "/root/reference/stitching/OpenCV2.4.11-Stitching/Release/output1"


# ---------------------------------------------------------------------------
# component parity: integer pyramids (bit-exact)
# ---------------------------------------------------------------------------
# heavy parity/golden runs (SURVEY §4): excluded from the fast core profile
pytestmark = pytest.mark.slow

def test_pyramid_int_bit_exact(rng):
    import jax.numpy as jnp
    from stitchingvideo_tpu.ops.pyramid_int import pyr_down_i16, pyr_up_i16
    for shape in [(64, 96), (128, 130), (32, 32), (254, 66)]:
        x = rng.integers(-3000, 3000, shape, dtype=np.int64).astype(np.int16)
        d_cv = cv2.pyrDown(x).astype(np.int32)
        d_us = np.asarray(pyr_down_i16(jnp.asarray(x)))
        np.testing.assert_array_equal(d_cv, d_us)
        u_cv = cv2.pyrUp(x).astype(np.int32)
        u_us = np.asarray(pyr_up_i16(jnp.asarray(x)))
        np.testing.assert_array_equal(u_cv, u_us)


# ---------------------------------------------------------------------------
# component parity: MultiBandBlender (bit-exact)
# ---------------------------------------------------------------------------
def test_multiband_cv_bit_exact(rng):
    from stitchingvideo_tpu.blend.multiband_cv import MultiBandBlenderCV

    H, W = 200, 300
    img1 = cv2.GaussianBlur(
        rng.integers(0, 256, (H, W, 3), dtype=np.int64).astype(np.uint8), (7, 7), 2)
    img2 = cv2.GaussianBlur(
        rng.integers(0, 256, (H, W, 3), dtype=np.int64).astype(np.uint8), (7, 7), 2)
    m1 = np.zeros((H, W), np.uint8); m1[10:190, 5:200] = 255
    m2 = np.zeros((H, W), np.uint8); m2[20:180, 150:295] = 255
    m2[100:110, 150:160] = 97      # partial weights like resized seam masks
    corners = [(-7, 3), (123, -11)]

    blender = cv2.detail_MultiBandBlender(0, 5, cv2.CV_16S)
    roi = cv2.detail.resultRoi(corners=corners, sizes=[(W, H), (W, H)])
    blender.prepare(roi)
    blender.feed(img1.astype(np.int16), m1, corners[0])
    blender.feed(img2.astype(np.int16), m2, corners[1])
    res, res_mask = blender.blend(None, None)

    mb = MultiBandBlenderCV(5)
    mb.prepare(roi)
    mb.feed(img1.astype(np.int16), m1, corners[0])
    mb.feed(img2.astype(np.int16), m2, corners[1])
    pano, mask = mb.blend()

    np.testing.assert_array_equal(pano, res.astype(np.int32))
    np.testing.assert_array_equal(mask, res_mask.astype(bool))


# ---------------------------------------------------------------------------
# component parity: BlocksGainCompensator (<= 1 gray level)
# ---------------------------------------------------------------------------
def test_blocks_gain_cv_parity(rng):
    from stitchingvideo_tpu.photometric.exposure_cv import \
        BlocksGainCompensatorCV

    corners = [(0, 0), (180, 15), (360, -10)]
    base = cv2.GaussianBlur(
        rng.integers(40, 200, (400, 900, 3), dtype=np.int64).astype(np.uint8),
        (31, 31), 9)
    imgs, masks = [], []
    for i, (cx, cy) in enumerate(corners):
        h, w = 260, 300
        crop = base[100 + cy:100 + cy + h, cx:cx + w]
        im = np.clip(crop.astype(np.float32) * (0.8 + 0.15 * i),
                     0, 255).astype(np.uint8)
        m = np.zeros((h, w), np.uint8); m[5:-5, 3:-3] = 255
        imgs.append(im); masks.append(m)

    comp = cv2.detail.ExposureCompensator_createDefault(
        cv2.detail.ExposureCompensator_GAIN_BLOCKS)
    comp.feed(corners=corners, images=imgs, masks=masks)
    ours = BlocksGainCompensatorCV()
    ours.feed(corners, imgs, masks)
    for i in range(3):
        im_cv = imgs[i].copy()
        comp.apply(i, corners[i], im_cv, masks[i])
        im_us = ours.apply(i, imgs[i])
        assert np.abs(im_us.astype(int) - im_cv.astype(int)).max() <= 1


# ---------------------------------------------------------------------------
# component parity: rotation warp (identical ROI, <= 1 gray level)
# ---------------------------------------------------------------------------
def test_warp_image_cv_parity(rng):
    from stitchingvideo_tpu.models.compose_cv import _warp_image

    img = cv2.GaussianBlur(
        rng.integers(0, 256, (240, 320, 3), dtype=np.int64).astype(np.uint8),
        (5, 5), 1.5)
    h, w = img.shape[:2]
    scale = 210.0
    K = np.array([[210.0, 0, w / 2], [0, 210.0, h / 2], [0, 0, 1]], np.float32)
    R = cv2.Rodrigues(np.array([0.05, 0.4, 0.02]))[0].astype(np.float32)
    for kind in ["cylindrical", "spherical", "plane"]:
        warper = cv2.PyRotationWarper(kind, scale)
        corner, wp = warper.warp(img, K, R, cv2.INTER_LINEAR,
                                 cv2.BORDER_REFLECT)
        _, mp = warper.warp(255 * np.ones((h, w), np.uint8), K, R,
                            cv2.INTER_NEAREST, cv2.BORDER_CONSTANT)
        ours, om, oc = _warp_image(img, kind, scale, K.astype(np.float64), R)
        assert oc == tuple(corner), kind
        assert ours.shape == wp.shape, kind
        np.testing.assert_array_equal(om > 0, mp > 0)
        m = mp > 0
        assert np.abs(ours.astype(int) - wp.astype(int)).max(-1)[m].max() <= 1


# ---------------------------------------------------------------------------
# end-to-end: PSNR >= 40 dB vs the cv2.detail compose on reference footage
# ---------------------------------------------------------------------------
@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference footage not mounted")
def test_compose_psnr_vs_cv2():
    import dataclasses

    import imageio.v3 as iio

    from stitchingvideo_tpu.config import StitchConfig
    from stitchingvideo_tpu.models.camera import Cameras
    from stitchingvideo_tpu.models.compose_cv import compose_panorama_cv

    full = [np.asarray(iio.imread(f"{REF_DIR}/img-{i}.jpg"))[..., :3]
            [:, :, ::-1].copy() for i in range(6)]
    WORK_MP, SEAM_MP, COMPOSE_MP = 0.6, 0.1, 0.6
    h0, w0 = full[0].shape[:2]

    def scale_for(mp):
        return 1.0 if mp <= 0 else min(
            1.0, float(np.sqrt(mp * 1e6 / (w0 * h0))))

    work_scale = scale_for(WORK_MP)
    seam_scale = scale_for(SEAM_MP)
    compose_scale = scale_for(COMPOSE_MP)
    swa, cwa = seam_scale / work_scale, compose_scale / work_scale
    work = [cv2.resize(im, None, fx=work_scale, fy=work_scale,
                       interpolation=cv2.INTER_LINEAR) for im in full]

    # --- shared registration (cv2.detail, reference flow) ---
    orb = cv2.ORB_create(nfeatures=1500)
    feats = [cv2.detail.computeImageFeatures2(orb, im) for im in work]
    matcher = cv2.detail_BestOf2NearestMatcher(False, 0.3)
    pm = matcher.apply2(feats)
    indices = [int(i) for i in
               np.asarray(cv2.detail.leaveBiggestComponent(feats, pm, 0.6)).ravel()]
    assert indices == list(range(6))
    estimator = cv2.detail_HomographyBasedEstimator()
    ok, cams_cv = estimator.apply(feats, pm, None)
    assert ok
    for c in cams_cv:
        c.R = c.R.astype(np.float32)
    adj = cv2.detail_BundleAdjusterRay()
    adj.setConfThresh(1.0)
    ok, cams_cv = adj.apply(feats, pm, cams_cv)
    assert ok
    focals = sorted(c.focal for c in cams_cv)
    wis = (focals[2] + focals[3]) * 0.5
    rmats = cv2.detail.waveCorrect([np.copy(c.R) for c in cams_cv],
                                   cv2.detail.WAVE_CORRECT_HORIZ)
    for c, r in zip(cams_cv, rmats):
        c.R = r

    # --- cv2 compose (CLI flow, stitching_detailed.cpp:545-764) ---
    warp_type = "cylindrical"
    warper_s = cv2.PyRotationWarper(warp_type, wis * swa)
    corners, images_warped, masks_warped = [], [], []
    for i, img in enumerate(full):
        im_s = cv2.resize(img, None, fx=seam_scale, fy=seam_scale,
                          interpolation=cv2.INTER_LINEAR)
        K = cams_cv[i].K().astype(np.float32)
        K[0] *= swa; K[1] *= swa
        corner, img_wp = warper_s.warp(im_s, K, cams_cv[i].R,
                                       cv2.INTER_LINEAR, cv2.BORDER_REFLECT)
        _, mask_wp = warper_s.warp(255 * np.ones(im_s.shape[:2], np.uint8),
                                   K, cams_cv[i].R, cv2.INTER_NEAREST,
                                   cv2.BORDER_CONSTANT)
        corners.append(corner)
        images_warped.append(img_wp)
        masks_warped.append(mask_wp)
    comp = cv2.detail.ExposureCompensator_createDefault(
        cv2.detail.ExposureCompensator_GAIN_BLOCKS)
    comp.feed(corners=corners, images=images_warped, masks=masks_warped)
    seam_finder = cv2.detail_GraphCutSeamFinder("COST_COLOR")
    masks_seam = seam_finder.find([im.astype(np.float32)
                                   for im in images_warped],
                                  corners, [m.copy() for m in masks_warped])
    masks_seam = [np.asarray(m.get() if hasattr(m, "get") else m)
                  for m in masks_seam]
    warper_c = cv2.PyRotationWarper(warp_type, wis * cwa)
    fed, c_corners, c_sizes = [], [], []
    for i, img in enumerate(full):
        im_c = cv2.resize(img, None, fx=compose_scale, fy=compose_scale,
                          interpolation=cv2.INTER_LINEAR)
        K = cams_cv[i].K().astype(np.float32)
        K[0] *= cwa; K[1] *= cwa
        corner, img_wp = warper_c.warp(im_c, K, cams_cv[i].R,
                                       cv2.INTER_LINEAR, cv2.BORDER_REFLECT)
        _, mask_wp = warper_c.warp(255 * np.ones(im_c.shape[:2], np.uint8),
                                   K, cams_cv[i].R, cv2.INTER_NEAREST,
                                   cv2.BORDER_CONSTANT)
        comp.apply(i, corner, img_wp, mask_wp)
        dil = cv2.dilate(masks_seam[i], None)
        sm = cv2.resize(dil, (mask_wp.shape[1], mask_wp.shape[0]), 0, 0,
                        cv2.INTER_LINEAR)
        fed.append((img_wp.astype(np.int16),
                    cv2.bitwise_and(sm, mask_wp), corner))
        c_corners.append(corner)
        c_sizes.append((img_wp.shape[1], img_wp.shape[0]))
    roi = cv2.detail.resultRoi(corners=c_corners, sizes=c_sizes)
    nb = max(int(np.ceil(np.log2(
        np.sqrt(roi[2] * roi[3]) * 5.0 / 100.0))) - 1, 0)
    blender = cv2.detail_MultiBandBlender(0, nb, cv2.CV_16S)
    blender.prepare(roi)
    for img_s16, mask_fed, corner in fed:
        blender.feed(img_s16, mask_fed, corner)
    pano_cv, mask_cv = blender.blend(None, None)
    pano_cv = np.clip(pano_cv, 0, 255).astype(np.uint8)

    # --- our faithful compose from the SAME cameras ---
    cams = Cameras(
        focal=np.array([c.focal for c in cams_cv], np.float32),
        aspect=np.array([c.aspect for c in cams_cv], np.float32),
        ppx=np.array([c.ppx for c in cams_cv], np.float32),
        ppy=np.array([c.ppy for c in cams_cv], np.float32),
        R=np.stack([c.R for c in cams_cv]).astype(np.float32),
        t=np.zeros((6, 3), np.float32))
    cfg = StitchConfig()
    cfg = cfg.replace(
        scales=dataclasses.replace(cfg.scales, work_megapix=WORK_MP,
                                   seam_megapix=SEAM_MP,
                                   compose_megapix=COMPOSE_MP),
        compose=dataclasses.replace(cfg.compose, warp_type=warp_type,
                                    seam_find="gc_color",
                                    expos_comp="gain_blocks",
                                    blend_type="multiband"))
    pano_us, mask_us = compose_panorama_cv(full, cams, float(wis),
                                           work_scale, cfg)

    assert pano_us.shape == pano_cv.shape
    m = (mask_cv > 0) & mask_us
    a = pano_cv.astype(np.float64)
    b = pano_us.astype(np.float64)
    mse = ((a - b) ** 2).mean(-1)[m].mean()
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 40.0, f"PSNR {psnr:.2f} dB < 40 dB (mse {mse:.3f})"
