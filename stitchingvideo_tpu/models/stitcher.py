"""Stitcher facade: the public two-phase API.

Parity target: cv::Stitcher (reference src/stitcher.cpp:49-334,
include/.../stitcher.hpp:58-174) and the CLI compositing flow
(stitching_detailed.cpp:545-764):

  estimate_transform(images) -> Registration   (slow path)
  compose_panorama(images, registration)       (repeatable fast path)
  stitch(images) = both

Multi-resolution decoupling follows the reference exactly (SURVEY §5.7):
registration at work_megapix, seams/exposure at seam_megapix, composition at
compose_megapix, linked by work_scale/seam_scale/compose_work_aspect.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..blend.feather import feather_blend, feather_weights
from ..blend.multiband import multiband_blend, num_bands_for, pad_for_bands
from ..config import StitchConfig
from ..geometry import projections as proj
from ..geometry.warp import (_np_camera_maps, detect_result_roi_batch,
                             rasterize_backward_map)
from ..ops.filters import dilate
from ..ops.remap import remap
from ..photometric.exposure import blocks_gain_maps, gain_compensator, upsample_gain
from ..register.pipeline import (RegistrationResult, compute_features,
                                 estimate_cameras, match_all_pairs)
from ..utils.timing import GLOBAL_TRACER as _tracer, maybe_sync as _msync
from ..seams.graphcut import graphcut_seams
from ..seams.voronoi import voronoi_seams
from ..seams.dp import dp_seams
from .camera import Cameras
from .registration import Registration


def _bucket(x: int, q: int = 64) -> int:
    """Round shapes up to a bucket so re-registrations with slightly shifted
    ROIs reuse compiled programs instead of recompiling (each remote compile
    costs seconds to minutes)."""
    return -(-x // q) * q


def _center_gauge(cams: Cameras, kind: str) -> Cameras:
    """Rotate all cameras about the panorama's vertical axis so the rig's
    azimuth span sits as far as possible from lon = ±pi.

    For the atan2-based projections (cylindrical/spherical/mercator) a
    camera whose warped footprint straddles the ±pi seam gets a forward ROI
    spanning the ENTIRE wrap — the canvas inflates by up to ~25% with
    duplicated content at both ends (observed 8896 vs 11520 px on the same
    rig depending on the registration's arbitrary yaw gauge; the reference
    binary has the same flaw — OpenCV detectResultRoi, warpers_inl.hpp:
    144-163, never re-gauges). The estimated geometry has a free global-yaw
    gauge: choosing it to center the largest azimuth gap at ±pi is
    invisible to every pairwise relation and to wave correction (a rotation
    about the wave-corrected vertical), it only normalizes the panorama's
    horizontal placement."""
    if kind not in ("cylindrical", "spherical", "mercator"):
        return cams
    R = np.asarray(cams.R, np.float64)
    yaw = np.arctan2(R[:, 0, 2], R[:, 2, 2])
    order = np.sort(yaw)
    gaps = np.diff(np.concatenate([order, order[:1] + 2 * np.pi]))
    g = int(np.argmax(gaps))
    mid_gap = order[g] + gaps[g] / 2.0          # azimuth of the largest gap
    delta = float((mid_gap + np.pi + np.pi) % (2 * np.pi) - np.pi)
    # new yaw = yaw - delta puts mid_gap at ±pi (the farthest any seam
    # crossing can be pushed from every footprint). A full-wrap rig
    # (gap ~ 0) cannot avoid the seam; a near-identity shift is skipped to
    # keep placement byte-stable across re-registrations.
    if gaps[g] < 0.05 or abs(delta) < 0.02:
        return cams
    c, s = np.cos(-delta), np.sin(-delta)
    Ry = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], np.float64)
    Rn = (Ry[None] @ R).astype(np.float32)
    return Cameras(focal=cams.focal, aspect=cams.aspect, ppx=cams.ppx,
                   ppy=cams.ppy, R=jnp.asarray(Rn), t=cams.t)


def _scale_for(megapix: float, w: int, h: int) -> float:
    if megapix <= 0:
        return 1.0
    return min(1.0, float(np.sqrt(megapix * 1e6 / (w * h))))


def _resize(img: np.ndarray, scale: float) -> np.ndarray:
    if scale == 1.0:
        return img
    h, w = img.shape[:2]
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    out = jax.image.resize(jnp.asarray(img, jnp.float32),
                           (nh, nw) + img.shape[2:], method="linear")
    return np.asarray(jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8))


def _resize_all(images, scale: float):
    """Host-side resize (cv2 INTER_LINEAR — the reference's own resample,
    CLI stitching_detailed.cpp:381,:546). Registration only ever consumes
    work- and seam-scale pixels, so resizing on host avoids shipping the
    full-resolution frames to the device at all (37 MB ≈ 2 s per
    re-registration on the remote relay); falls back to the device resize
    without cv2."""
    if scale == 1.0:
        return [np.asarray(im) for im in images]
    try:
        import cv2
    except ImportError:
        return [_resize(im, scale) for im in images]
    out = []
    for im in images:
        h, w = im.shape[:2]
        out.append(cv2.resize(np.asarray(im),
                              (max(1, round(w * scale)),
                               max(1, round(h * scale))),
                              interpolation=cv2.INTER_LINEAR))
    return out


@partial(jax.jit, static_argnames=("kind", "interp", "border", "shape"))
def _warp_with_maps(image, kind, scale, k_rinv, corner_xy, shape, interp, border):
    xm, ym, valid = rasterize_backward_map(kind, scale, k_rinv, corner_xy, shape)
    out = remap(image, xm, ym, interp=interp, border=border)
    return out, xm, ym, valid


@partial(jax.jit, static_argnames=("kind", "shape"))
def _compose_fields_batch(kind, scale, k_rinvs, corners, wh, roi_hw, shape,
                          seam_canvas, gain_canvas, canvas_origin, ratio):
    """All cameras' compose-scale fields in ONE dispatch: backward maps,
    validity, seam-mask and gain-map transfers from the seam canvas."""
    Hr, Wr = shape

    def one(k_rinv, corner, wh_i, roi_i, seam_i, gain_i):
        xm, ym, valid = rasterize_backward_map(kind, scale, k_rinv, corner,
                                               (Hr, Wr))
        inb = (xm > -0.5) & (xm < wh_i[0] - 0.5) &               (ym > -0.5) & (ym < wh_i[1] - 0.5)
        yy_r = jnp.arange(Hr) < roi_i[0]
        xx_r = jnp.arange(Wr) < roi_i[1]
        v = valid & inb & (yy_r[:, None] & xx_r[None, :])
        # seam/gain transfer from the seam canvas is an AFFINE resample
        # (in_pos = out*ratio + corner*ratio - origin): scale_and_translate
        # lowers to resampling-matrix matmuls — the 24M-point remap gathers
        # here were the dominant warm re-registration stage on TPU
        cy = corner[1] * ratio - canvas_origin[1]
        cx = corner[0] * ratio - canvas_origin[0]
        sc = jnp.stack([1.0 / ratio, 1.0 / ratio])
        half = 0.5 * ratio - 0.5

        def affine(img, c_shift):
            tr = jnp.stack([(half - (cy + c_shift)) / ratio,
                            (half - (cx + c_shift)) / ratio])
            return jax.image.scale_and_translate(
                img, (Hr, Wr), (0, 1), sc, tr, method="linear",
                antialias=False)

        sm = dilate(seam_i, 3).astype(jnp.float32)
        seam_r = affine(sm, 0.0)              # zero border = remap 'constant'
        # replicate border for gain: 2px edge pad, origin shifted to match
        gain_r = affine(jnp.pad(gain_i, 2, mode="edge"), 2.0)
        return xm, ym, v, (seam_r > 0.05) & v, gain_r

    return jax.vmap(one)(k_rinvs, corners, wh, roi_hw, seam_canvas,
                         gain_canvas)


@partial(jax.jit, static_argnames=("canvas_hw",))
def _seam_canvas_place(warped, masks, rel_corners, canvas_hw):
    """Place per-camera seam-scale warps on the canvas, on device."""
    SH, SW = canvas_hw
    n, hh, ww = masks.shape

    def one(img, m, c):
        ci = jnp.zeros((SH + hh, SW + ww, 3), jnp.float32)
        cm = jnp.zeros((SH + hh, SW + ww), bool)
        ci = jax.lax.dynamic_update_slice(ci, img.astype(jnp.float32),
                                          (c[1], c[0], jnp.int32(0)))
        cm = jax.lax.dynamic_update_slice(cm, m.astype(bool), (c[1], c[0]))
        return ci[:SH, :SW], cm[:SH, :SW]

    return jax.vmap(one)(warped, masks, rel_corners)


@partial(jax.jit, static_argnames=("kind", "shape"))
def _seam_warp_batch(images, kind, scale, k_rinvs, corners, shape,
                     src_hw=None):
    """All cameras' seam-scale warps in ONE dispatch (image linear/reflect +
    mask nearest/constant), vmapped over the camera axis.

    src_hw: static TRUE (H, W) source extent when `images` are bucket-padded
    (shape bucketing: the in-range mask must follow the true extent; reads
    just past it hit the reflect-101 pad — the same values border='reflect'
    resampling of the unpadded image yields)."""
    def one(img, k_rinv, corner):
        xm, ym, valid = rasterize_backward_map(kind, scale, k_rinv, corner, shape)
        w = remap(img, xm, ym, interp="linear", border="reflect")
        # the mask 'warp' (remap of ones, nearest/constant) is analytically
        # the nearest-tap in-range test — no gather needed
        H, W = src_hw if src_hw is not None else img.shape[:2]
        inb = (xm > -0.5) & (xm < W - 0.5) & (ym > -0.5) & (ym < H - 0.5)
        return w, inb & valid
    return jax.vmap(one)(images, k_rinvs, corners)


class Stitcher:
    """High-level stitcher. See module docstring."""

    def __init__(self, config: Optional[StitchConfig] = None):
        self.cfg = config or StitchConfig()
        self._last_result: Optional[RegistrationResult] = None
        self._last_work_scale: float = 1.0
        self._shape_memo: dict = {}
        self._shapes_frozen: bool = False

    def _sticky(self, name: str, value: int) -> int:
        """Session-sticky shape: never shrinks. Re-registrations whose ROIs
        jitter around a bucket boundary would otherwise flip the static
        shapes of the big compiled programs back and forth — each flip costs
        a trace+lower (+compile) on every 30 s cycle. Growing monotonically
        freezes the statics after the largest size has been seen once."""
        if self._shapes_frozen and name in self._shape_memo:
            return self._shape_memo[name]
        v = max(int(value), self._shape_memo.get(name, 0))
        self._shape_memo[name] = v
        return v

    def freeze_shapes(self) -> None:
        """Freeze every sticky shape at its current value: later
        registrations reuse the first successful registration's canvas/ROI
        statics even if their true extents drift past a bucket boundary, so
        NO compiled program ever changes shape mid-stream (the reference's
        model stabilization keeps the first registration's panorama geometry
        the same way — 64-bit driver :447-532 `imgMatready` guard). Content
        drifting beyond a frozen extent is clipped at the canvas edge."""
        self._shapes_frozen = True

    # accessor parity with cv::Stitcher (stitcher.hpp:58-174)
    def cameras(self) -> Optional[Cameras]:
        """Estimated cameras of the last estimate_transform (work scale)."""
        return self._last_result.cameras if self._last_result else None

    def component(self) -> Optional[List[int]]:
        """Indices of images kept in the panorama (biggest component)."""
        return self._last_result.indices if self._last_result else None

    def work_scale(self) -> float:
        return self._last_work_scale

    # ------------------------------------------------------------------
    # Phase 1: estimate_transform (stitcher.cpp:91-112)
    # ------------------------------------------------------------------
    def estimate_transform(self, images: Sequence[np.ndarray],
                           seed: int = 0) -> Registration:
        cfg = self.cfg
        h0, w0 = images[0].shape[:2]
        work_scale = _scale_for(cfg.scales.work_megapix, w0, h0)
        seam_scale = _scale_for(cfg.scales.seam_megapix, w0, h0)
        seam_work_aspect = seam_scale / work_scale

        self._last_work_scale = work_scale
        work_imgs = _resize_all(images, work_scale)
        # staged registration with tracing spans (reference LOG/LOGLN timers,
        # SURVEY §5.1 — 'Finding features', 'Pairwise matching', ...)
        with _tracer.span("find_features"):
            # compute_features host-fetches the detector outputs (one
            # transfer), which also syncs the detect dispatch into this span
            feats = compute_features(work_imgs, cfg)
        with _tracer.span("pairwise_matching"):
            pairs = match_all_pairs(feats, cfg, seed)
        with _tracer.span("estimate_cameras"):
            reg = estimate_cameras(feats, pairs, cfg)
        self._last_result = reg
        kept = reg.indices
        full_kept = [images[i] for i in kept]
        n = len(kept)

        cams = reg.cameras  # work-scale intrinsics, centered pp re-added
        warped_image_scale = reg.warped_image_scale
        kind = cfg.compose.warp_type
        cams = _center_gauge(cams, kind)

        # ---- seam-scale warps (CLI :545-580) ----
        _seam_span = _tracer.span("seam_prep"); _seam_span.__enter__()
        seam_imgs = _resize_all(full_kept, seam_scale)
        seam_shapes = [im.shape[:2] for im in seam_imgs]
        s_scale = warped_image_scale * seam_work_aspect
        s_corners: List[Tuple[int, int]] = []
        s_shapes: List[Tuple[int, int]] = []
        # one fetch of all camera matrices + one batched ROI scan: the old
        # per-camera detect_result_roi/camera_maps loop cost ~4n relay round
        # trips per registration pass (the dominant warm-re-reg overhead)
        K_all = np.asarray(cams.K()).astype(np.float64)
        R_all = np.asarray(cams.R)
        Ks_s = K_all.copy()
        Ks_s[:, 0] *= seam_work_aspect
        Ks_s[:, 1] *= seam_work_aspect
        rois_s = detect_result_roi_batch(
            kind, s_scale, list(Ks_s), list(R_all),
            [(sh[1], sh[0]) for sh in seam_shapes])
        _, k_rinv_all = _np_camera_maps(Ks_s.astype(np.float32), R_all)
        k_rinvs = list(k_rinv_all)
        for i, (tlx, tly, brx, bry) in enumerate(rois_s):
            s_corners.append((tlx, tly))
            s_shapes.append((_bucket(bry - tly + 1), _bucket(brx - tlx + 1)))
        shape = (self._sticky("seam_h", max(sh[0] for sh in s_shapes)),
                 self._sticky("seam_w", max(sh[1] for sh in s_shapes)))
        if len(set(seam_shapes)) == 1:
            # one upload (seam scale, ~1 MB) + one dispatch for all cameras;
            # bucket-padded so any rig in the same shape bucket reuses the
            # compiled program (cold-start shape bucketing, src extent masks)
            from ..register.pipeline import _pad_to_bucket
            src_hw = seam_imgs[0].shape[:2]
            wb, mb = _seam_warp_batch(
                jnp.asarray(np.stack([_pad_to_bucket(im)
                                      for im in seam_imgs])),
                kind, s_scale, jnp.asarray(np.stack(k_rinvs)),
                jnp.asarray(np.array(s_corners, np.float32)), shape,
                src_hw=tuple(src_hw))
        else:
            from ..register.pipeline import _pad_to_bucket
            s_warped, s_masks = [], []
            for i in range(n):
                h_t, w_t = seam_imgs[i].shape[:2]
                padded = _pad_to_bucket(seam_imgs[i])
                img_w, _xm, _ym, valid = _warp_with_maps(
                    jnp.asarray(padded), kind, s_scale,
                    jnp.asarray(k_rinvs[i]),
                    jnp.asarray(s_corners[i], jnp.float32), shape,
                    "linear", "reflect")
                # true-extent ones, zero pad: the mask warp keeps the true
                # in-range semantics on the padded array
                ones = jnp.zeros(padded.shape[:2], jnp.float32) \
                    .at[:h_t, :w_t].set(1.0)
                mask_w, _, _, _ = _warp_with_maps(
                    ones, kind, s_scale, jnp.asarray(k_rinvs[i]),
                    jnp.asarray(s_corners[i], jnp.float32), shape,
                    "nearest", "constant")
                s_warped.append(img_w)
                s_masks.append((mask_w > 0) & valid)
            wb = jnp.stack(s_warped)
            mb = jnp.stack(s_masks)

        # seam-scale canvas, assembled ON DEVICE (the round-1 host-numpy
        # assembly cost two ~45 MB host<->device round trips per
        # registration on the remote TPU relay — VERDICT item 2)
        sx0 = min(c[0] for c in s_corners)
        sy0 = min(c[1] for c in s_corners)
        sx1 = max(c[0] + shape[1] for c in s_corners)
        sy1 = max(c[1] + shape[0] for c in s_corners)
        SH = self._sticky("canvas_sh", _bucket(sy1 - sy0))
        SW = self._sticky("canvas_sw", _bucket(sx1 - sx0))
        rel_corners = jnp.asarray(np.array(
            [[c[0] - sx0, c[1] - sy0] for c in s_corners], np.int32))
        canvas_imgs, canvas_masks = _seam_canvas_place(
            wb, mb, rel_corners, (SH, SW))

        _msync(canvas_imgs, canvas_masks)
        _seam_span.__exit__(None, None, None)
        # ---- exposure compensation at seam scale (CLI :586-590) ----
        # canvas_imgs/canvas_masks are device arrays; the gain solve and
        # gain-map upsampling stay in HBM end to end
        _ec_span = _tracer.span("exposure_compensation"); _ec_span.__enter__()
        ec = cfg.compose.expos_comp
        if ec == "gain":
            gains = gain_compensator(canvas_imgs, canvas_masks)
            gain_canvas = jnp.broadcast_to(
                gains[:, None, None], (n, SH, SW)).astype(jnp.float32)
        elif ec == "gain_blocks":
            bs = cfg.compose.expos_block_size
            gmaps = blocks_gain_maps(canvas_imgs, canvas_masks, bs)
            gain_canvas = jax.vmap(
                lambda g: upsample_gain(g, (SH, SW), bs))(gmaps)
        else:
            gain_canvas = jnp.ones((n, SH, SW), jnp.float32)

        _msync(gain_canvas)
        _ec_span.__exit__(None, None, None)
        # ---- seam finding at seam scale (CLI :594-637) ----
        _sf_span = _tracer.span("seam_finding"); _sf_span.__enter__()
        sf = cfg.compose.seam_find
        if sf == "voronoi":
            seam_canvas = voronoi_seams(canvas_masks)   # device end to end
        elif sf in ("gc_color", "gc_colorgrad"):
            # BK max-flow is host-sequential (SURVEY §7.3); only the
            # pairwise-overlap BANDS are fetched (u8-quantized, one batched
            # transfer) instead of the full ~45 MB seam canvas
            from ..seams.graphcut import graphcut_seams_banded
            imgs_u8 = jnp.clip(jnp.round(canvas_imgs), 0,
                               255).astype(jnp.uint8)
            seam_canvas = graphcut_seams_banded(
                imgs_u8, canvas_masks,
                "color" if sf == "gc_color" else "colorgrad",
                sticky=self._shape_memo.setdefault("seam_band", {}))
        elif sf in ("dp_color", "dp_colorgrad"):
            imgs_np = np.asarray(jnp.clip(jnp.round(canvas_imgs), 0, 255)
                                 .astype(jnp.uint8)).astype(np.float32)
            seam_canvas = dp_seams(
                imgs_np, np.asarray(canvas_masks),
                "color" if sf == "dp_color" else "colorgrad")
        elif sf == "no":
            seam_canvas = canvas_masks
        else:
            raise ValueError(f"unknown seam finder {sf}")

        _msync(seam_canvas)
        _sf_span.__exit__(None, None, None)
        # ---- compose-scale warp fields (CLI :656-716) ----
        _cw_span = _tracer.span("warp_field_build"); _cw_span.__enter__()
        compose_scale = _scale_for(cfg.scales.compose_megapix, w0, h0)
        compose_work_aspect = compose_scale / work_scale
        c_scale = warped_image_scale * compose_work_aspect

        Ks = K_all.copy()
        Ks[:, 0] *= compose_work_aspect
        Ks[:, 1] *= compose_work_aspect
        c_sizes = [(round(full_kept[i].shape[1] * compose_scale),
                    round(full_kept[i].shape[0] * compose_scale))
                   for i in range(n)]
        rois_c = detect_result_roi_batch(kind, c_scale, list(Ks),
                                         list(R_all), c_sizes)
        # NB: unpack all four in one comprehension — an earlier version
        # unpacked `_tlx` here and the `brx - tlx + 1` body silently captured
        # the seam-stage loop's leftover `tlx` (comprehension bodies read the
        # enclosing function scope), producing garbage widths: an inflated
        # canvas AND negative clip widths that dropped whole cameras from
        # the composite.
        c_corners = [(tlx, tly) for tlx, tly, _brx, _bry in rois_c]
        c_shapes = [(bry - tly + 1, brx - tlx + 1)
                    for tlx, tly, brx, bry in rois_c]
        if any(h <= 0 or w <= 0 for h, w in c_shapes):
            raise AssertionError(
                f"non-positive compose ROI shape: {c_shapes} (rois {rois_c})"
                " — a zero-area clip window silently drops a camera")
        Ks = list(Ks)

        Hr = self._sticky("roi_h", _bucket(max(s[0] for s in c_shapes), 128))
        Wr = self._sticky("roi_w", _bucket(max(s[1] for s in c_shapes), 128))

        # device-side field build in ONE dispatch for all cameras — the maps
        # stay in HBM from rasterization straight into the Registration pytree
        k_rinvs_c = _np_camera_maps(np.stack(Ks).astype(np.float32), R_all)[1]
        wh_arr = np.asarray(c_sizes, np.float32)
        roi_arr = np.array(c_shapes, np.int32)
        xmaps, ymaps, valids, seam_rois, gain_rois = _compose_fields_batch(
            kind, c_scale, jnp.asarray(k_rinvs_c),
            jnp.asarray(np.array(c_corners, np.float32)),
            jnp.asarray(wh_arr), jnp.asarray(roi_arr), (Hr, Wr),
            jnp.asarray(seam_canvas), jnp.asarray(gain_canvas),
            jnp.asarray([sx0, sy0], jnp.float32),
            jnp.float32(s_scale / c_scale))

        # canvas — bucketed so re-registrations with slightly shifted corners
        # keep canvas_wh static (an unbucketed canvas recompiles build_lut
        # and the blend graph on every 30 s re-registration)
        cx0 = min(c[0] for c in c_corners)
        cy0 = min(c[1] for c in c_corners)
        cx1 = max(c[0] + s[1] for c, s in zip(c_corners, c_shapes))
        cy1 = max(c[1] + s[0] for c, s in zip(c_corners, c_shapes))
        CW = self._sticky("pano_w", _bucket(cx1 - cx0))
        CH = self._sticky("pano_h", _bucket(cy1 - cy0))
        # true covered extent, sticky so the RT crop (computed from it)
        # keeps static shapes across re-registrations; everything beyond it
        # is bucket pad (cam_idx=-1) and must never reach the output
        EW = self._sticky("ext_w", min(cx1 - cx0, CW))
        EH = self._sticky("ext_h", min(cy1 - cy0, CH))
        corners = np.array([[c[0] - cx0, c[1] - cy0] for c in c_corners], np.int32)

        cams_c = Cameras(
            focal=cams.focal * compose_work_aspect,
            aspect=cams.aspect,
            ppx=cams.ppx * compose_work_aspect,
            ppy=cams.ppy * compose_work_aspect,
            R=cams.R, t=cams.t)

        _msync(xmaps, seam_rois, gain_rois)
        _cw_span.__exit__(None, None, None)
        return Registration(
            cameras=cams_c,
            corners=jnp.asarray(corners),
            valid=jnp.asarray(valids),
            xmaps=jnp.asarray(xmaps),
            ymaps=jnp.asarray(ymaps),
            seam_masks=jnp.asarray(seam_rois),
            gain_maps=jnp.asarray(gain_rois),
            canvas_wh=(CW, CH),
            roi_hw=(Hr, Wr),
            warp_kind=kind,
            warp_scale=float(c_scale),
            extent_wh=(EW, EH),
            src_indices=tuple(int(i) for i in reg.indices),
        ), reg, compose_scale

    # ------------------------------------------------------------------
    # Phase 2: compose_panorama (stitcher.cpp:114-316)
    # ------------------------------------------------------------------
    def compose_panorama(self, images: Sequence[np.ndarray], reg: Registration,
                         reg_result: Optional[RegistrationResult] = None,
                         compose_scale: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
        cfg = self.cfg
        if reg_result is not None:
            images = [images[i] for i in reg_result.indices]
        imgs = _resize_all(images, compose_scale)
        n = reg.n_cameras
        # pad inputs to a common static shape for vmapped remap
        Hs = max(im.shape[0] for im in imgs)
        Ws = max(im.shape[1] for im in imgs)
        batch = np.zeros((n, Hs, Ws, 3), np.float32)
        for i, im in enumerate(imgs):
            batch[i, :im.shape[0], :im.shape[1]] = im

        warped = _remap_gain_batch(jnp.asarray(batch), reg.xmaps, reg.ymaps,
                                   reg.gain_maps)
        pano, mask = _blend_on_canvas(
            warped, reg.seam_masks, reg.valid, np.asarray(reg.corners),
            reg.canvas_wh, cfg.compose.blend_type, cfg.compose.blend_strength,
            cfg.compose.feather_sharpness)
        return (np.asarray(jnp.clip(jnp.round(pano), 0, 255).astype(jnp.uint8)),
                np.asarray(mask))

    def stitch(self, images: Sequence[np.ndarray],
               seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        if self.cfg.compose.faithful:
            # OpenCV-faithful still path (pixel parity, BASELINE north star):
            # registration at work scale, then the CLI-exact compose flow —
            # the video Registration/LUT build is skipped entirely.
            from .compose_cv import compose_panorama_cv
            from ..register.pipeline import register_images
            cfg = self.cfg
            h0, w0 = images[0].shape[:2]
            work_scale = _scale_for(cfg.scales.work_megapix, w0, h0)
            self._last_work_scale = work_scale
            work_imgs = _resize_all(images, work_scale)
            with _tracer.span("registration"):
                reg = register_images(work_imgs, cfg, seed)
            self._last_result = reg
            kept = [images[i] for i in reg.indices]
            return compose_panorama_cv(kept, reg.cameras,
                                       float(reg.warped_image_scale),
                                       work_scale, cfg)
        reg, reg_result, compose_scale = self.estimate_transform(images, seed)
        return self.compose_panorama(images, reg, reg_result, compose_scale)


@jax.jit
def _remap_gain_batch(images, xmaps, ymaps, gains):
    """[N,H,W,3] + maps -> warped [N,Hr,Wr,3] with gains applied."""
    def one(img, xm, ym, g):
        w = remap(img, xm, ym, interp="linear", border="reflect")
        return w * g[..., None]
    return jax.vmap(one)(images, xmaps, ymaps, gains)


def _blend_on_canvas(warped, seam_masks, valids, corners, canvas_wh,
                     blend_type: str, blend_strength: float, sharpness: float):
    """Place per-camera ROIs on the canvas (static corners) and blend."""
    CW, CH = canvas_wh
    n, Hr, Wr = warped.shape[0], warped.shape[1], warped.shape[2]
    if blend_type == "multiband":
        area = float(CW * CH)
        bands = num_bands_for(area, blend_strength)
        CHp, CWp = pad_for_bands(CH, CW, bands)
    else:
        CHp, CWp = CH, CW

    canvas_imgs = jnp.zeros((n, CHp, CWp, 3), jnp.float32)
    canvas_seams = jnp.zeros((n, CHp, CWp), bool)
    for i in range(n):
        x, y = int(corners[i][0]), int(corners[i][1])
        h = min(Hr, CHp - y)
        w = min(Wr, CWp - x)
        canvas_imgs = canvas_imgs.at[i, y:y + h, x:x + w].set(
            (warped[i] * valids[i][..., None])[:h, :w])
        canvas_seams = canvas_seams.at[i, y:y + h, x:x + w].set(
            (seam_masks[i] & valids[i])[:h, :w])

    if blend_type == "no":
        # priority paste (first camera wins where seams overlap nothing)
        wsum = canvas_seams.astype(jnp.float32)
        acc = jnp.einsum("nhwc,nhw->hwc", canvas_imgs, wsum)
        tot = wsum.sum(0)
        pano = acc / jnp.maximum(tot[..., None], 1.0)
        mask = tot > 0
    elif blend_type == "feather":
        w = feather_weights(canvas_seams, sharpness)
        pano, mask = feather_blend(canvas_imgs, w)
    elif blend_type == "multiband":
        bands = num_bands_for(float(CW * CH), blend_strength)
        pano, mask = multiband_blend(canvas_imgs, canvas_seams, bands)
    else:
        raise ValueError(f"unknown blend type {blend_type}")
    return pano[:CH, :CW], mask[:CH, :CW]
