"""OpenCV-faithful still compositing (the pixel-parity compose path).

Parity target: the reference CLI compositing flow, stage for stage
(stitching/OpenCV2.4.11-Stitching/stitching_detailed.cpp:545-764):

  seam-scale warps (INTER_LINEAR/BORDER_REFLECT image, NEAREST/CONSTANT mask)
  -> BlocksGainCompensator feed (:586-590)
  -> seam finder (:594-637)
  -> per image at compose scale (:656-753):
       warp image + mask, apply block gains, convert to CV_16S,
       dilate seam mask 3x3 + bilinear-resize to the warped size,
       AND with the warp mask, feed MultiBandBlender
  -> blend (:757-762).

Every rounding/border convention that shapes the output bits is reproduced
(see blend/multiband_cv.py and photometric/exposure_cv.py). The video hot
loop keeps the fused Pallas LUT path; this module is the still slow path the
PSNR >=40 dB parity criterion is measured on (BASELINE.json north star).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..blend.feather import feather_blend, feather_weights
from ..blend.multiband_cv import MultiBandBlenderCV
from ..config import StitchConfig
from ..geometry import projections as proj
from ..geometry.warp import detect_result_roi, rasterize_backward_map
from ..ops.remap import remap
from ..photometric.exposure_cv import BlocksGainCompensatorCV, _resize_linear
from ..photometric.exposure import gain_compensator
from ..seams.dp import dp_seams
from ..seams.graphcut import graphcut_seams
from ..seams.voronoi import voronoi_seams
from ..utils.timing import GLOBAL_TRACER as _tracer

from .camera import Cameras


def _scale_for(megapix: float, w: int, h: int) -> float:
    if megapix <= 0:
        return 1.0
    return min(1.0, float(np.sqrt(megapix * 1e6 / (w * h))))


def _resize_u8(img: np.ndarray, scale: float) -> np.ndarray:
    """cv::resize INTER_LINEAR analogue for uint8 images."""
    if scale == 1.0:
        return img
    h, w = img.shape[:2]
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    chans = [np.clip(np.rint(_resize_linear(img[..., c].astype(np.float32),
                                            nh, nw)), 0, 255)
             for c in range(img.shape[2])]
    return np.stack(chans, -1).astype(np.uint8)


def _warp_image_dev(img: np.ndarray, kind: str, scale: float, K: np.ndarray,
                    R: np.ndarray):
    """warper->warp parity, device-resident: (warped u8 dev, mask u8 dev,
    corner). Image remap INTER_LINEAR/BORDER_REFLECT, mask NEAREST/CONSTANT
    over the exact detectResultRoi rect (warpers_inl.hpp:63-99, CLI
    :710-716)."""
    h, w = img.shape[:2]
    tlx, tly, brx, bry = detect_result_roi(kind, scale, K, R, (w, h))
    shape = (bry - tly + 1, brx - tlx + 1)
    _, k_rinv = proj.camera_maps(K.astype(np.float32), R.astype(np.float32))
    xm, ym, valid = rasterize_backward_map(
        kind, scale, jnp.asarray(k_rinv),
        jnp.asarray((tlx, tly), jnp.float32), shape)
    warped = remap(jnp.asarray(img, jnp.float32), xm, ym,
                   interp="linear", border="reflect")
    ones = jnp.ones((h, w), jnp.float32)
    m = remap(ones, xm, ym, interp="nearest", border="constant")
    mask = ((m > 0) & valid).astype(jnp.uint8) * 255
    warped_u8 = jnp.where((mask > 0)[..., None],
                          jnp.clip(jnp.round(warped), 0, 255), 0) \
        .astype(jnp.uint8)
    return warped_u8, mask, (tlx, tly)


def _warp_image(img: np.ndarray, kind: str, scale: float, K: np.ndarray,
                R: np.ndarray) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
    """Host-array variant of _warp_image_dev (seam-scale stage)."""
    wd, md, corner = _warp_image_dev(img, kind, scale, K, R)
    return np.asarray(wd), np.asarray(md), corner


def compose_panorama_cv(images: Sequence[np.ndarray], cams: Cameras,
                        warped_image_scale: float, work_scale: float,
                        cfg: StitchConfig,
                        seed_masks: Optional[List[np.ndarray]] = None
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Faithful compose: images are the kept full-resolution frames; cams are
    work-scale cameras from registration. Returns (pano uint8, mask bool)."""
    kind = cfg.compose.warp_type
    h0, w0 = images[0].shape[:2]
    seam_scale = _scale_for(cfg.scales.seam_megapix, w0, h0)
    compose_scale = _scale_for(cfg.scales.compose_megapix, w0, h0)
    seam_work_aspect = seam_scale / work_scale
    compose_work_aspect = compose_scale / work_scale
    n = len(images)

    # ---- seam-scale warps (CLI :545-580) ----
    with _tracer.span("seam_prep"):
        s_scale = warped_image_scale * seam_work_aspect
        s_warped, s_masks, s_corners = [], [], []
        for i in range(n):
            img_s = _resize_u8(images[i], seam_scale)
            K = np.asarray(cams.K()[i]).astype(np.float64)
            K[0] *= seam_work_aspect
            K[1] *= seam_work_aspect
            wi, mi, ci = _warp_image(img_s, kind, s_scale, K,
                                     np.asarray(cams.R[i]))
            s_warped.append(wi)
            s_masks.append(mi)
            s_corners.append(ci)

    # ---- exposure compensation feed (CLI :586-590) ----
    with _tracer.span("exposure_compensation"):
        ec = cfg.compose.expos_comp
        comp: Optional[BlocksGainCompensatorCV] = None
        gains1: Optional[np.ndarray] = None
        if ec == "gain_blocks":
            comp = BlocksGainCompensatorCV(cfg.compose.expos_block_size,
                                           cfg.compose.expos_block_size)
            comp.feed(s_corners, s_warped, s_masks)
        elif ec == "gain":
            # single gain per image (GainCompensator), canvas-form stats
            sx0 = min(c[0] for c in s_corners)
            sy0 = min(c[1] for c in s_corners)
            sx1 = max(c[0] + m.shape[1] for c, m in zip(s_corners, s_masks))
            sy1 = max(c[1] + m.shape[0] for c, m in zip(s_corners, s_masks))
            ci = np.zeros((n, sy1 - sy0, sx1 - sx0, 3), np.float32)
            cm = np.zeros((n, sy1 - sy0, sx1 - sx0), bool)
            for i in range(n):
                y, x = s_corners[i][1] - sy0, s_corners[i][0] - sx0
                hh, ww = s_masks[i].shape
                ci[i, y:y + hh, x:x + ww] = s_warped[i]
                cm[i, y:y + hh, x:x + ww] = s_masks[i] > 0
            gains1 = np.asarray(gain_compensator(jnp.asarray(ci),
                                                 jnp.asarray(cm)))

    # ---- seam finding on the seam-scale canvas (CLI :594-637) ----
    with _tracer.span("seam_finding"):
        sx0 = min(c[0] for c in s_corners)
        sy0 = min(c[1] for c in s_corners)
        sx1 = max(c[0] + m.shape[1] for c, m in zip(s_corners, s_masks))
        sy1 = max(c[1] + m.shape[0] for c, m in zip(s_corners, s_masks))
        SH, SW = sy1 - sy0, sx1 - sx0
        canvas_imgs = np.zeros((n, SH, SW, 3), np.float32)
        canvas_masks = np.zeros((n, SH, SW), bool)
        for i in range(n):
            y, x = s_corners[i][1] - sy0, s_corners[i][0] - sx0
            hh, ww = s_masks[i].shape
            canvas_imgs[i, y:y + hh, x:x + ww] = s_warped[i]
            canvas_masks[i, y:y + hh, x:x + ww] = s_masks[i] > 0
        sf = cfg.compose.seam_find
        if sf == "voronoi":
            seam_canvas = np.asarray(voronoi_seams(jnp.asarray(canvas_masks)))
        elif sf in ("gc_color", "gc_colorgrad"):
            seam_canvas = graphcut_seams(
                canvas_imgs, canvas_masks,
                "color" if sf == "gc_color" else "colorgrad")
        elif sf in ("dp_color", "dp_colorgrad"):
            seam_canvas = dp_seams(
                canvas_imgs, canvas_masks,
                "color" if sf == "dp_color" else "colorgrad")
        elif sf == "no":
            seam_canvas = canvas_masks.copy()
        else:
            raise ValueError(f"unknown seam finder {sf}")
        if seed_masks is not None:      # test hook: force external seam masks
            seam_masks = seed_masks
        else:
            seam_masks = []
            for i in range(n):
                y, x = s_corners[i][1] - sy0, s_corners[i][0] - sx0
                hh, ww = s_masks[i].shape
                seam_masks.append(
                    (seam_canvas[i, y:y + hh, x:x + ww].astype(np.uint8) * 255))

    # ---- compose loop at full/compose scale (CLI :656-753) ----
    # Device-resident: warped images, gain application, seam-mask resizes,
    # CV_16S conversion, and the blender feed never leave HBM (the host-
    # array version of this loop paid ~40 s of relay transfers per stitch).
    with _tracer.span("compositing"):
        from ..photometric.exposure_cv import _resize_linear_dev
        c_scale = warped_image_scale * compose_work_aspect
        c_corners: List[Tuple[int, int]] = []
        c_sizes: List[Tuple[int, int]] = []
        warped_s16: List[jnp.ndarray] = []
        fed_masks: List[jnp.ndarray] = []
        for i in range(n):
            img_c = _resize_u8(images[i], compose_scale)
            K = np.asarray(cams.K()[i]).astype(np.float64)
            K[0] *= compose_work_aspect
            K[1] *= compose_work_aspect
            img_w, mask_w, corner = _warp_image_dev(img_c, kind, c_scale, K,
                                                    np.asarray(cams.R[i]))
            if comp is not None:
                img_w = comp.apply_dev(i, img_w)
            elif gains1 is not None:
                img_w = jnp.clip(jnp.round(img_w.astype(jnp.float32) *
                                           float(gains1[i])), 0, 255
                                 ).astype(jnp.uint8)
            # dilate + resize the seam mask, AND with warp mask (CLI :726-728)
            sm = _dilate3(seam_masks[i])
            hh, ww = mask_w.shape
            sm_r = jnp.clip(jnp.round(_resize_linear_dev(
                jnp.asarray(sm, jnp.float32), hh, ww)), 0,
                255).astype(jnp.uint8)
            fed = jnp.where(mask_w > 0, sm_r, 0).astype(jnp.uint8)
            c_corners.append(corner)
            c_sizes.append((ww, hh))
            warped_s16.append(img_w.astype(jnp.int16))
            fed_masks.append(fed)

        # result ROI over compose corners/sizes (util.cpp resultRoi)
        x0 = min(c[0] for c in c_corners)
        y0 = min(c[1] for c in c_corners)
        x1 = max(c[0] + s[0] for c, s in zip(c_corners, c_sizes))
        y1 = max(c[1] + s[1] for c, s in zip(c_corners, c_sizes))
        bt = cfg.compose.blend_type
        if bt == "multiband":
            blend_width = float(np.sqrt((x1 - x0) * (y1 - y0)) *
                                cfg.compose.blend_strength / 100.0)
            if blend_width < 1.0:
                bt = "no"
            else:
                bands = max(int(np.ceil(np.log2(blend_width))) - 1, 0)
        if bt == "multiband":
            mb = MultiBandBlenderCV(bands)
            mb.prepare((x0, y0, x1 - x0, y1 - y0))
            for i in range(n):
                mb.feed_dev(warped_s16[i], fed_masks[i], c_corners[i])
            pano16, mask = mb.blend()
            pano = np.clip(pano16, 0, 255).astype(np.uint8)
            return pano, mask
        # feather / no: simple canvas blends (FeatherBlender parity lives in
        # blend/feather.py; still path reuses it at canvas scale)
        H, W = y1 - y0, x1 - x0
        imgs_c = np.zeros((n, H, W, 3), np.float32)
        seams_c = np.zeros((n, H, W), bool)
        for i in range(n):
            y, x = c_corners[i][1] - y0, c_corners[i][0] - x0
            ww, hh = c_sizes[i]
            imgs_c[i, y:y + hh, x:x + ww] = np.asarray(warped_s16[i])
            seams_c[i, y:y + hh, x:x + ww] = np.asarray(fed_masks[i]) > 0
        if bt == "feather":
            wgt = feather_weights(jnp.asarray(seams_c),
                                  cfg.compose.feather_sharpness)
            pano, mask = feather_blend(jnp.asarray(imgs_c), wgt)
            pano = np.asarray(jnp.clip(jnp.rint(pano), 0, 255)).astype(np.uint8)
            return pano, np.asarray(mask)
        wsum = seams_c.astype(np.float32)
        acc = (imgs_c * wsum[..., None]).sum(0)
        tot = wsum.sum(0)
        pano = np.clip(np.rint(acc / np.maximum(tot[..., None], 1.0)),
                       0, 255).astype(np.uint8)
        return pano, tot > 0


def _dilate3(mask: np.ndarray) -> np.ndarray:
    """cv::dilate 3x3 rect kernel on a uint8 mask (CLI :726)."""
    p = np.pad(mask, 1, mode="constant")
    out = mask
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out = np.maximum(out, p[dy:dy + mask.shape[0],
                                    dx:dx + mask.shape[1]])
    return out
