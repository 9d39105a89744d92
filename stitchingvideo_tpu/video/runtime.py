"""Video runtime: cached-registration streaming compositor.

Parity target: the reference 64-bit RT driver's main loop + threads
(stitching_detailed.cpp:724-856): a compositing hot loop streams frames
through cached LUTs while a registration worker re-registers every K seconds
(:843, 30 s) or on demand ('a' key, :768), swapping state double-buffered
(`UpdateMat` :696-722). Differences by design:

  * Registration state + LUT are immutable pytrees; "swap" is an atomic
    reference assignment under a lock — no torn reads (the reference's
    Upflag/imgMatready plain-bool races, SURVEY §5.2, cannot happen).
  * The output canvas is frozen to the first registration's (cropped) shape so
    the hot loop never recompiles; later registrations are padded/cropped in.
  * A dead frame source times out instead of hanging (SURVEY §5.3).
"""
from __future__ import annotations

import logging
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StitchConfig
from ..geometry.undistort import compose_maps, undistort_map_from_config
from ..models.registration import Registration
from ..models.stitcher import Stitcher
from ..ops.remap import remap
from ..utils.timing import Timer
from .lut import CompositeLUT, build_lut, composite_frame_u8
from .sources import FrameSource

log = logging.getLogger(__name__)


def _fit2d(a: jnp.ndarray, fill, shape) -> jnp.ndarray:
    """Pad/crop a 2-D array to `shape` (the frozen-output fit primitive)."""
    H, W = shape
    h, w = a.shape
    out = jnp.full((H, W), fill, a.dtype)
    return out.at[:min(h, H), :min(w, W)].set(a[:min(h, H), :min(w, W)])


@dataclass
class FrameStats:
    """Per-frame timing log (reference 'Stitching Frame'/'Read Frame' parity,
    32-bit driver :864-893)."""
    read_s: List[float] = field(default_factory=list)
    compose_s: List[float] = field(default_factory=list)
    frames: int = 0

    def fps(self, last: int = 50) -> float:
        if not self.compose_s:
            return 0.0
        w = self.compose_s[-last:]
        return len(w) / max(sum(w), 1e-9)

    def report(self) -> dict:
        """Machine-readable per-frame stats (the reference's resultTime*.txt
        'Stitching Frame'/'Read Frame' logs, SURVEY §4/§5.1, as JSON)."""
        import numpy as _np

        def stats(xs):
            if not xs:
                return {}
            a = _np.asarray(xs)
            return {"mean_ms": float(a.mean() * 1e3),
                    "p50_ms": float(_np.median(a) * 1e3),
                    "p95_ms": float(_np.percentile(a, 95) * 1e3),
                    "max_ms": float(a.max() * 1e3)}

        return {"frames": self.frames, "fps": self.fps(),
                "compose": stats(self.compose_s), "read": stats(self.read_s)}


class VideoStitcher:
    def __init__(self, config: Optional[StitchConfig] = None):
        import dataclasses as _dc
        cfg = config or StitchConfig()
        if cfg.scales.compose_megapix > 0:
            # The hot loop consumes raw full-resolution frames through the
            # LUT (reference RT driver works at native 1080p); maps must be
            # built in full-res source coordinates.
            cfg = cfg.replace(scales=_dc.replace(cfg.scales,
                                                 compose_megapix=-1.0))
        self.cfg = cfg
        self.stitcher = Stitcher(self.cfg)
        self._mesh = None
        if cfg.parallel.canvas_shards > 1:
            # product multi-chip mode (SURVEY §2.3/§5.8): the panorama is
            # sharded in row bands over the 'canvas' mesh axis; the hot loop
            # runs the materialized Pallas kernel per band with ZERO
            # collectives (every output pixel is an independent gather)
            from ..parallel.mesh import make_mesh
            self._mesh = make_mesh(canvas=cfg.parallel.canvas_shards,
                                   camera=cfg.parallel.camera_shards)
        self._lock = threading.Lock()
        self._lut: Optional[CompositeLUT] = None
        self._tlut = None                  # Pallas tiled LUT (fast path)
        self._ftlut = None                 # feather hot-loop state
        self._ftlut_reg = None             # the Registration it was built from
        self._mbtlut = None                # multiband hot-loop state
        self._mbtlut_sharded = None        # (ShardedMultiband, fn) multichip
        self._mbtlut_reg = None
        self._reg: Optional[Registration] = None
        self._out_shape: Optional[tuple] = None
        self._und_maps = None              # (xmap, ymap) full-res undistort
        self._kernel_memo: dict = {}       # sticky class-count buckets
        self._reg_thread: Optional[threading.Thread] = None
        self._reg_requested = threading.Event()
        self._stop = threading.Event()
        self._last_reg_time = 0.0
        self.stats = FrameStats()
        self.registrations = 0

    # -- slow path -----------------------------------------------------
    def register(self, frames: List[np.ndarray], seed: int = 0) -> None:
        """Full registration from the given frame set; atomically swaps the
        LUT in (GetPreStruct + UpdateMat parity)."""
        frame_hw = frames[0].shape[:2]
        if self.registrations == 0:
            # this instance's first registration loads ITS OWN executables
            # (a sharded-kernel stitcher created after a single-device one
            # compiles fresh programs) — re-arm span syncing so those loads
            # don't overlap and poison each other on the TPU relay
            from ..utils.timing import set_sync_spans
            set_sync_spans(True)
        if self.cfg.undistort.enabled:
            # Registration runs on undistorted frames; the undistort LUT is
            # composed into the final maps so the hot loop consumes RAW frames
            # through a single gather (vs the reference's two chained remaps,
            # 64-bit driver :741,:752).
            if self._und_maps is None:
                self._und_maps = undistort_map_from_config(
                    self.cfg.undistort, frame_hw)
            ux, uy = self._und_maps
            frames = [np.asarray(remap(jnp.asarray(f), ux, uy,
                                       interp="linear", border="constant"))
                      for f in frames]
        reg, _reg_result, _cscale = self.stitcher.estimate_transform(frames, seed)
        if self.cfg.undistort.enabled:
            ux, uy = self._und_maps
            cx, cy = jax.vmap(lambda mx, my: compose_maps(mx, my, ux, uy))(
                reg.xmaps, reg.ymaps)
            reg = reg.replace(xmaps=cx, ymaps=cy)
        from ..utils.timing import GLOBAL_TRACER as _tracer
        from ..utils.timing import maybe_sync as _msync
        with _tracer.span("lut_build"):
            CW, CH = reg.canvas_wh
            lut = build_lut(reg, crop=self._crop_slices((CH, CW),
                                                        reg.extent_wh))
            _msync(lut.cam_idx)
        self.install_lut(lut, frame_hw, reg=reg)
        # first successful registration defines the panorama geometry for
        # the life of the stream (reference model stabilization, :447-532):
        # freezing the sticky shapes guarantees re-registrations never flip
        # a compiled program's static shape (measured 3.7 s lut_build
        # recompile when a re-registration grew pano_w one bucket)
        self.stitcher.freeze_shapes()
        # first registration loaded every executable — warm re-registration
        # is faster free-running (see timing.set_sync_spans)
        from ..utils.timing import set_sync_spans
        set_sync_spans(False)

    def install_lut(self, lut: CompositeLUT, frame_hw,
                    reg: Optional[Registration] = None) -> None:
        """Atomically swap in a composite LUT (the double-buffered UpdateMat
        step, 64-bit driver :696-722). Called by register(); also the entry
        point for loaded/checkpointed registration state and the multichip
        dryrun — it exercises the same kernel build + swap a registration
        does."""
        from ..utils.timing import GLOBAL_TRACER as _tracer
        with self._lock:
            if self._out_shape is None:
                self._out_shape = lut.cam_idx.shape
            else:
                lut = self._fit_lut(lut, self._out_shape)
            if reg is not None:
                self._reg = reg
            self._frame_hw = tuple(int(x) for x in frame_hw)
            self._lut = lut
            if self.cfg.video.compose_mode == "lut":
                with _tracer.span("pallas_weight_build"):
                    self._tlut = self._try_tiled(lut, frame_hw,
                                                 self.cfg.video.kernel,
                                                 self._mesh)
                    from ..utils.timing import maybe_sync as _ms2
                    if self._tlut is not None:
                        _ms2(jax.tree.leaves(self._tlut[1])[0])
            else:
                # feather/multiband hot loops never consume the seam-select
                # kernel — building it here would add its full weight-
                # materialization to every re-registration for nothing
                self._tlut = None
            self._last_reg_time = time.monotonic()
            self.registrations += 1
        if self.cfg.video.compose_mode == "feather" and reg is not None:
            # feather is a hot-loop mode: build its dual-slot kernel state
            # eagerly so the first frame is already fast
            self.build_feather_state(frame_hw)
        if self.cfg.video.compose_mode == "multiband" and reg is not None:
            self.build_multiband_state(frame_hw)

    def build_multiband_state(self, frame_hw) -> bool:
        """Build + swap the multiband video state (per-camera Pallas warp
        LUTs + cached mask pyramids). Returns True when live; the full
        XLA blend path remains the fallback."""
        from ..utils.timing import GLOBAL_TRACER as _tracer
        with self._lock:
            reg = self._reg
        if reg is None:
            return False
        with _tracer.span("multiband_state_build"):
            try:
                from ..blend.multiband_video import build_multiband_state
                CW, CH = reg.canvas_wh
                ndev = self._mesh.shape["canvas"] if self._mesh else 0
                st, crop_yx = build_multiband_state(
                    reg, tuple(frame_hw),
                    self.cfg.compose.blend_strength,
                    crop=self._crop_slices((CH, CW), reg.extent_wh),
                    pad_pieces_to=ndev)
                sharded = None
                if self._mesh is not None and ndev > 1:
                    # multichip: piece-shard the window chain, psum the band
                    # canvases over ICI (parallel/compose_multiband.py) —
                    # --canvas_shards covers all three compose modes
                    try:
                        from ..parallel.compose_multiband import (
                            shard_multiband_state, sharded_multiband_fn)
                        smb = shard_multiband_state(st, self._mesh)
                        interp = jax.default_backend() != "tpu"
                        fn = sharded_multiband_fn(self._mesh, smb,
                                                  crop_yx=crop_yx,
                                                  interpret=interp)
                        sharded = (smb, fn)
                    except Exception:
                        log.warning(
                            "sharded multiband build failed; using "
                            "single-device", exc_info=True)
                with self._lock:
                    self._mbtlut = (st, crop_yx)
                    self._mbtlut_sharded = sharded
                    self._mbtlut_reg = reg
                return True
            except Exception:
                log.warning(
                    "multiband video state build failed; using the full "
                    "blend path", exc_info=True)
                with self._lock:
                    self._mbtlut = None
                    self._mbtlut_sharded = None
                    self._mbtlut_reg = None
                return False

    def build_feather_state(self, frame_hw) -> bool:
        """Build + swap the feather hot-loop kernel from the last
        registration. Returns True when the Pallas feather path is live
        (falls back to the full-blend XLA path otherwise)."""
        from ..utils.timing import GLOBAL_TRACER as _tracer
        with self._lock:
            reg = self._reg
            out_shape = self._out_shape
        if reg is None:
            return False
        with _tracer.span("feather_lut_build"):
            try:
                from ..ops.pallas.composite_feather import (build_blend_lut,
                                                            build_feather_mat)
                blut = build_blend_lut(reg,
                                       self.cfg.compose.feather_sharpness)
                y0, y1, x0, x1 = self._crop_slices(blut.shape, reg.extent_wh)
                blut = blut.crop(y0, y1, x0, x1)
                if out_shape is not None and blut.shape != tuple(out_shape):
                    blut = self._fit_blend(blut, out_shape)
            except Exception:
                log.warning(
                    "feather blend-LUT build failed; frames will use the "
                    "slow full-blend path", exc_info=True)
                with self._lock:
                    self._ftlut = None   # composite() uses the full XLA blend
                    self._ftlut_reg = None
                return False
            state = None
            if self._mesh is not None:
                # multichip: row-band-shard the feather kernel (item 5 —
                # every hot-loop mode people use must scale over the mesh)
                try:
                    from ..parallel.compose_feather import (
                        pad_blend_rows_for_shards, shard_feather_lut,
                        sharded_composite_feather_fn)
                    ndev = self._mesh.shape["canvas"]
                    Hp = blut.shape[0]
                    blut_p = pad_blend_rows_for_shards(blut, ndev)
                    fml = build_feather_mat(blut_p, tuple(frame_hw))
                    sf = shard_feather_lut(fml, self._mesh)
                    interp = jax.default_backend() != "tpu"
                    fn = sharded_composite_feather_fn(self._mesh, sf,
                                                      interpret=interp)
                    state = ("fmat_sharded", (sf, fn, Hp))
                except Exception:
                    log.warning(
                        "sharded feather build failed; using single-device",
                        exc_info=True)
            if state is None:
                try:
                    state = ("fmat",
                             jax.device_put(build_feather_mat(
                                 blut, tuple(frame_hw))))
                except Exception:
                    log.warning(
                        "feather kernel build failed; demoting to the exact "
                        "XLA dual-gather path (slower)", exc_info=True)
                    state = ("fgather", jax.device_put(blut))
            with self._lock:
                self._ftlut = state
                self._ftlut_reg = reg
        return state[0] in ("fmat", "fmat_sharded")

    def _try_tiled(self, lut: CompositeLUT, frame_hw, kernel: str = "auto",
                   mesh=None):
        """Build the Pallas fast-path state; None if not representable.

        Kernel preference (cfg.video.kernel): 'auto' = mat2 > mat > tiled >
        gather; or pinned. 'mat2' is the fastest hot loop, 'mat' builds its
        weights ~3x faster per re-registration. With a mesh (multi-chip
        mode) the mat2 kernel — fallback-tile overlay included — runs
        shard_map'd over canvas row bands ('auto'/'mat2'); kernel='mat' pins
        the older sharded mat kernel."""
        if kernel == "gather":
            return None
        if mesh is not None:
            ndev = mesh.shape["canvas"]
            Hp = lut.cam_idx.shape[0]
            interp = jax.default_backend() != "tpu"
            from ..ops.pallas.composite import build_tiled_lut
            from .lut import pad_lut_rows_for_shards
            if kernel in ("auto", "mat2"):
                try:
                    from ..ops.pallas.composite_mat2 import _materialize2
                    from ..parallel.compose_mat2 import (
                        shard_mat2_lut, sharded_composite_mat2_fn)
                    lut_p = pad_lut_rows_for_shards(lut, ndev)
                    tlut = build_tiled_lut(lut_p, tuple(frame_hw))
                    ml2 = _materialize2(
                        tlut, tuple(frame_hw),
                        sticky=self._kernel_memo.setdefault("mat2s", {}))
                    sm = shard_mat2_lut(ml2, mesh)
                    fn = sharded_composite_mat2_fn(mesh, sm, interpret=interp)
                    return ("mat2_sharded", (sm, fn, Hp))
                except Exception:
                    log.warning(
                        "sharded mat2 build failed; trying sharded mat",
                        exc_info=True)
            try:
                from ..ops.pallas.composite_mat import _materialize
                from ..parallel.compose_mat import (shard_mat_lut,
                                                    sharded_composite_mat_fn)
                lut_p = pad_lut_rows_for_shards(lut, ndev)
                tlut = build_tiled_lut(lut_p, tuple(frame_hw))
                if int(tlut.n_fallback) != 0:
                    # the mat kernel has no per-tile fallback overlay;
                    # >2-camera tiles would compose wrong — demote loudly
                    log.warning(
                        "multichip compose demoted to single-device: %d "
                        "fallback tiles and the mat2 path unavailable",
                        int(tlut.n_fallback))
                else:
                    ml = _materialize(tlut)
                    fn = sharded_composite_mat_fn(mesh, ml, interpret=interp)
                    return ("mat_sharded", (shard_mat_lut(ml, mesh), fn, Hp))
            except Exception:
                # never a silent demotion: the user asked for multichip
                log.warning(
                    "multichip compose demoted to single-device "
                    "(sharded kernel build failed)", exc_info=True)
        try:
            from ..ops.pallas.composite import build_tiled_lut
            from ..ops.pallas.composite_mat import _materialize
            tlut = build_tiled_lut(lut, tuple(frame_hw))
            if kernel in ("auto", "mat2"):
                # mat2 handles fallback tiles per-tile (exact-gather overlay,
                # composite_mat2._fallback_values) — no whole-LUT demotion
                try:
                    from ..ops.pallas.composite_mat2 import _materialize2
                    return ("mat2", jax.device_put(_materialize2(
                        tlut, tuple(frame_hw),
                        sticky=self._kernel_memo.setdefault("mat2", {}))))
                except Exception:
                    log.warning("mat2 build failed; trying the mat kernel",
                                exc_info=True)
                    if kernel == "mat2":
                        if int(tlut.n_fallback) != 0:
                            return None
                        return ("tiled", jax.device_put(tlut))
            if int(tlut.n_fallback) != 0:
                # mat/tiled kernels have no per-tile fallback path
                return None
            if kernel in ("auto", "mat"):
                try:
                    return ("mat", jax.device_put(_materialize(tlut)))
                except Exception:
                    pass
            return ("tiled", jax.device_put(tlut))
        except Exception:
            log.warning(
                "Pallas composite state build failed; the hot loop will use "
                "the XLA gather reference path (slow)", exc_info=True)
            return None

    def _crop_slices(self, shape, extent_wh=None):
        """Reference crop margins (64-bit driver :47): 10% top/bottom, 10 px
        left/right — applied to the TRUE covered extent, so the 64-px canvas
        bucket pad (uncovered, black) is cropped along with the margins.
        Returns (y0, y1, x0, x1)."""
        v = self.cfg.video
        H, W = shape
        if extent_wh is not None:
            eW, eH = extent_wh
            W, H = min(int(eW), W), min(int(eH), H)
        y0 = int(H * v.crop_top_frac)
        y1 = H - int(H * v.crop_bottom_frac)
        x0 = v.crop_left_px
        x1 = W - v.crop_right_px
        if y1 <= y0 or x1 <= x0:
            return 0, H, 0, W
        return y0, y1, x0, x1

    @staticmethod
    def _fit_blend(blut, shape):
        """Pad/crop a blend LUT to the frozen output shape."""
        import dataclasses as _dc
        return _dc.replace(
            blut,
            cam_a=_fit2d(blut.cam_a, -1, shape),
            sx_a=_fit2d(blut.sx_a, 0.0, shape),
            sy_a=_fit2d(blut.sy_a, 0.0, shape),
            gw_a=_fit2d(blut.gw_a, 0.0, shape),
            cam_b=_fit2d(blut.cam_b, -1, shape),
            sx_b=_fit2d(blut.sx_b, 0.0, shape),
            sy_b=_fit2d(blut.sy_b, 0.0, shape),
            gw_b=_fit2d(blut.gw_b, 0.0, shape))

    @staticmethod
    def _fit_lut(lut: CompositeLUT, shape) -> CompositeLUT:
        """Pad/crop a new LUT to the frozen output shape."""
        return CompositeLUT(cam_idx=_fit2d(lut.cam_idx, -1, shape),
                            src_x=_fit2d(lut.src_x, 0.0, shape),
                            src_y=_fit2d(lut.src_y, 0.0, shape),
                            gain=_fit2d(lut.gain, 1.0, shape))

    def _fit_frame(self, pano: np.ndarray) -> np.ndarray:
        """Pad/crop a composed HWC frame to the frozen output shape. The
        frozen-canvas invariant (module docstring) must hold for EVERY
        compose path: a mid-stream shape change kills encoder sinks
        (VideoFileSink rejects resized frames)."""
        with self._lock:
            out_shape = self._out_shape
        if out_shape is None:
            return pano
        H, W = out_shape
        h, w = pano.shape[:2]
        if (h, w) == (H, W):
            return pano
        out = np.zeros((H, W) + pano.shape[2:], pano.dtype)
        out[:min(h, H), :min(w, W)] = pano[:min(h, H), :min(w, W)]
        return out

    def _select_frames(self, frames: List[np.ndarray],
                       reg: Optional[Registration] = None) -> List[np.ndarray]:
        """Select the registration's kept cameras from the full rig frame
        list (leaveBiggestComponent parity, matchers.cpp:552-573: a
        registration may drop low-confidence cameras, so the hot loop must
        feed the kept subset in component order — otherwise the LUT's camera
        indices silently address the wrong frames). Only applied when the
        rig size differs from the registration's camera count, so callers
        that already pass the kept subset are untouched.

        Pass `reg` explicitly when composing through a cached blend state:
        selection must match the registration THAT STATE was built from —
        self._reg may already be a newer registration whose kept subset
        differs while the state rebuild is still in flight."""
        if reg is None:
            with self._lock:
                reg = self._reg
        if reg is None:
            return frames
        idx = reg.src_indices
        if idx is None or len(frames) == reg.n_cameras:
            return frames
        if max(idx) >= len(frames):
            raise ValueError(
                f"registration expects rig camera indices {idx} but only "
                f"{len(frames)} frames were provided")
        return [frames[i] for i in idx]

    # -- hot path ------------------------------------------------------
    def composite(self, frames: List[np.ndarray]) -> np.ndarray:
        """One frame through the cached registration. HWC uint8.

        cfg.video.compose_mode selects the hot path:
          'lut'       — reference-parity seam-select gather (StitchingAll),
                        Pallas-accelerated (the default and fastest);
          'feather' / 'multiband' — full blending through the cached warp
                        fields + seam masks every frame (beyond-reference
                        quality mode; heavier).
        """
        mode = self.cfg.video.compose_mode
        # ONE snapshot: every state is read together with the registration
        # it was built from, so frame selection, the kernel state, and the
        # camera indexing inside it can never mix two registrations mid-swap
        with self._lock:
            reg = self._reg
            lut, tlut = self._lut, self._tlut
            ftlut, ft_reg = self._ftlut, self._ftlut_reg
            mbt, mb_reg = self._mbtlut, self._mbtlut_reg
            mbs = self._mbtlut_sharded
        if mode == "lut":
            out = self._planar_with(
                jnp.asarray(np.stack(self._select_frames(frames, reg))),
                lut, tlut)
            if out.ndim == 3 and out.shape[0] == 3:
                from ..ops.pallas.composite_mat import planar_to_hwc
                out = planar_to_hwc(out)
            return np.asarray(out)
        if mode == "feather" and ftlut is not None:
            from ..ops.pallas.composite_mat import planar_to_hwc
            sel = self._select_frames(frames, ft_reg or reg)
            out = self._feather_planar(jnp.asarray(np.stack(sel)), ftlut)
            return self._fit_frame(np.asarray(planar_to_hwc(out)))
        if mode == "multiband" and mbt is not None:
            from ..blend.multiband_video import multiband_video_frame
            from ..ops.pallas.composite_mat import (frames_to_planar_i8,
                                                    planar_to_hwc)
            st, crop_yx = mbt
            interpret = jax.default_backend() != "tpu"
            sel = self._select_frames(frames, mb_reg or reg)
            planar = frames_to_planar_i8(jnp.asarray(np.stack(sel)))
            if mbs is not None:
                smb, sfn = mbs
                out = sfn(planar, smb)      # crop baked into the shard fn
            else:
                out = multiband_video_frame(planar, st, crop_yx=crop_yx,
                                            interpret=interpret)
            return self._fit_frame(np.asarray(planar_to_hwc(out)))
        return self._composite_blend(self._select_frames(frames, reg),
                                     mode, reg)

    def composite_feather_planar(self, batch: jnp.ndarray) -> jnp.ndarray:
        """Feather-blended hot path, [3, Hp, Wp] uint8 planar.

        Uses the dual-slot Pallas kernel when built ('fmat'); exact XLA
        dual-gather otherwise ('fgather')."""
        with self._lock:
            ftlut = self._ftlut
        if ftlut is None:
            raise RuntimeError("feather state not built "
                               "(register with compose_mode='feather' or "
                               "call build_feather_state)")
        return self._feather_planar(batch, ftlut)

    def _feather_planar(self, batch: jnp.ndarray, ftlut) -> jnp.ndarray:
        """Feather hot path on a CALLER-snapshotted state: re-reading
        self._ftlut here could observe a concurrent build-failure reset to
        None and crash a streaming loop that already checked it."""
        kind, state = ftlut
        if kind == "fmat_sharded":
            from ..ops.pallas.composite_mat import frames_to_planar_i8
            sf, fn, Hp = state
            out = fn(frames_to_planar_i8(batch), sf)
            return out[:, :Hp]   # drop shard-alignment pad rows
        if kind == "fmat":
            from ..ops.pallas.composite_feather import \
                composite_feather_planar as fthr
            from ..ops.pallas.composite_mat import frames_to_planar_i8
            interpret = jax.default_backend() != "tpu"
            return fthr(frames_to_planar_i8(batch), state,
                        interpret=interpret)
        from ..ops.pallas.composite_feather import composite_blend_gather
        out = composite_blend_gather(batch, state)
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
        return jnp.transpose(out, (2, 0, 1))

    def _composite_blend(self, frames: List[np.ndarray], mode: str,
                         reg: Optional[Registration] = None) -> np.ndarray:
        from ..models.stitcher import _blend_on_canvas, _remap_gain_batch
        if reg is None:
            with self._lock:
                reg = self._reg
        if reg is None:
            raise RuntimeError("not registered yet")
        batch = jnp.asarray(np.stack(frames)).astype(jnp.float32)
        warped = _remap_gain_batch(batch, reg.xmaps, reg.ymaps, reg.gain_maps)
        pano, _mask = _blend_on_canvas(
            warped, reg.seam_masks, reg.valid, np.asarray(reg.corners),
            reg.canvas_wh, mode, self.cfg.compose.blend_strength,
            self.cfg.compose.feather_sharpness)
        out = np.asarray(jnp.clip(jnp.round(pano), 0, 255).astype(jnp.uint8))
        # same crop + frozen-shape contract as the hot paths: a fallback
        # transition mid-stream must not change the frame size (encoder
        # sinks reject that) or expose the uncropped canvas margins
        CW, CH = reg.canvas_wh
        y0, y1, x0, x1 = self._crop_slices((CH, CW), reg.extent_wh)
        return self._fit_frame(out[y0:y1, x0:x1])

    def composite_device(self, batch: jnp.ndarray) -> jnp.ndarray:
        """Device-resident hot path (no host transfer), HWC output.

        Path preference: materialized int8 MXU kernel > on-the-fly MXU kernel
        > XLA gather. `composite_planar` skips the HWC interleave."""
        out = self.composite_planar(batch)
        if out.ndim == 3 and out.shape[0] == 3:
            from ..ops.pallas.composite_mat import planar_to_hwc
            return planar_to_hwc(out)
        return out

    def composite_microbatch(self, planar_batch: jnp.ndarray) -> jnp.ndarray:
        """Throughput serving path: B frame-sets per device execution.

        planar_batch: [B, N, 3, H, W] int8 (value-128, the ingest-native
        planar layout). Returns [B, 3, Hp, Wp] uint8. Micro-batching
        amortizes per-execution dispatch overhead — the production serving
        shape (at ~B/fps added latency).
        """
        with self._lock:
            tlut = self._tlut
            ftlut = self._ftlut
        interpret = jax.default_backend() != "tpu"
        if self.cfg.video.compose_mode == "multiband":
            # never silently serve seam-select output at multiband quality
            raise RuntimeError(
                "multiband has no micro-batch kernel; batch "
                "multiband_video_frame directly (see bench.py) or use "
                "compose_mode='lut'/'feather'")
        if self.cfg.video.compose_mode == "feather":
            if ftlut is None or ftlut[0] not in ("fmat", "fmat_sharded"):
                raise RuntimeError("feather micro-batch path requires the "
                                   "materialized feather state")
            if ftlut[0] == "fmat_sharded":
                sf, sfn, Hp = ftlut[1]
                return jax.lax.map(lambda f: sfn(f, sf),
                                   planar_batch)[:, :, :Hp]
            from ..ops.pallas.composite_feather import \
                composite_feather_planar as fn
            ml = ftlut[1]
        elif tlut is not None and tlut[0] in ("mat_sharded", "mat2_sharded"):
            sm, sfn, Hp = tlut[1]
            return jax.lax.map(lambda f: sfn(f, sm),
                               planar_batch)[:, :, :Hp]
        elif tlut is not None and tlut[0] == "mat2":
            # true batched kernel: grid (Tg, B) holds each weight block in
            # VMEM across the B inner steps — per-frame HBM traffic drops
            # ~3x vs lax.map over the single-frame kernel (weights are ~68%
            # of its per-frame bytes)
            from ..ops.pallas.composite_mat2 import \
                composite_mat2_planar_batched
            return composite_mat2_planar_batched(planar_batch, tlut[1],
                                                 interpret=interpret)
        elif tlut is not None and tlut[0] == "mat":
            ml = tlut[1]
            from ..ops.pallas.composite_mat import \
                composite_mat_planar as fn
        else:
            raise RuntimeError("micro-batch path requires a materialized "
                               "Pallas LUT (register() first)")
        return jax.lax.map(lambda f: fn(f, ml, interpret=interpret),
                           planar_batch)

    def composite_planar(self, batch: jnp.ndarray) -> jnp.ndarray:
        """Hot path returning channel-planar [3, H, W] when on a Pallas path
        (the native layout for encoders); HWC on the gather fallback."""
        with self._lock:
            lut = self._lut
            tlut = self._tlut
        return self._planar_with(batch, lut, tlut)

    def _planar_with(self, batch: jnp.ndarray, lut, tlut) -> jnp.ndarray:
        """Hot path on CALLER-snapshotted LUT state: composite() snapshots
        the registration and its kernels under ONE lock acquisition, so a
        concurrent install_lut between frame selection and the kernel call
        cannot compose old-subset frames through a new registration's LUT."""
        if lut is None:
            raise RuntimeError("not registered yet")
        interpret = jax.default_backend() != "tpu"
        if tlut is not None and tlut[0] in ("mat_sharded", "mat2_sharded"):
            from ..ops.pallas.composite_mat import frames_to_planar_i8
            sharded, fn, Hp = tlut[1]
            out = fn(frames_to_planar_i8(batch), sharded)
            return out[:, :Hp]   # drop shard-alignment pad rows
        if tlut is not None and tlut[0] == "mat2":
            from ..ops.pallas.composite_mat import frames_to_planar_i8
            from ..ops.pallas.composite_mat2 import composite_mat2_planar
            return composite_mat2_planar(frames_to_planar_i8(batch), tlut[1],
                                         interpret=interpret)
        if tlut is not None and tlut[0] == "mat":
            from ..ops.pallas.composite_mat import composite_mat
            return composite_mat(batch, tlut[1], interpret=interpret)
        if tlut is not None and tlut[0] == "tiled":
            from ..ops.pallas.composite import composite_tiled
            out = composite_tiled(batch, tlut[1], interpret=interpret)
            return jnp.transpose(out, (2, 0, 1))
        return jnp.transpose(composite_frame_u8(batch, lut), (2, 0, 1))

    def save_registration(self, path: str) -> None:
        """Persist the live registration (+ the frame shape its kernels were
        built for) so a later process can stream without re-registering —
        the persistence the reference's camera-mp4.yml intended but never
        wired (SURVEY §5.4). Loadable via load_registration()."""
        with self._lock:
            reg = self._reg
            fhw = getattr(self, "_frame_hw", None)
        if reg is None or fhw is None:
            raise RuntimeError("no live registration to save")
        d = reg.state_dict()
        d["frame_hw"] = np.asarray(fhw, np.int32)
        # write through an open handle: np.savez_compressed(str) silently
        # appends '.npz' to bare paths, which load_registration then misses
        with open(path, "wb") as f:
            np.savez_compressed(f, **d)

    def load_registration(self, path: str) -> None:
        """Load a saved registration and swap it in through the same
        install_lut path a live registration uses. After this, composite()
        serves frames immediately — the cold registration is skipped
        entirely (the cheapest cold-start mitigation: seconds instead of
        the full slow path)."""
        with np.load(path, allow_pickle=False) as z:
            d = {k: z[k] for k in z.files}
        fhw = tuple(int(x) for x in d.pop("frame_hw"))
        reg = Registration.from_state_dict(d)
        CW, CH = reg.canvas_wh
        lut = build_lut(reg, crop=self._crop_slices((CH, CW), reg.extent_wh))
        self.install_lut(lut, fhw, reg=reg)

    def force_reregister(self) -> None:
        """'a'-key parity (64-bit driver :768)."""
        self._reg_requested.set()

    # -- streaming loop ------------------------------------------------
    def run(self, source: FrameSource,
            on_frame: Optional[Callable[[np.ndarray, int], None]] = None,
            max_frames: Optional[int] = None,
            pipeline_depth: Optional[int] = None) -> FrameStats:
        """Main loop with background re-registration every
        cfg.video.reregister_seconds (reference :832-848).

        pipeline_depth (default cfg.video.pipeline_depth): 1 keeps the
        reference's submit-then-deliver-frame-i semantics; K>1 keeps K
        composites in flight (dispatch + async D2H overlap, video/stream.
        StreamingComposer) so on_frame(i) fires a bounded K-1 frames behind
        ingest but at kernel rate instead of round-trip rate. Every frame is
        still delivered exactly once, in order (the tail drains at exit)."""
        period = self.cfg.video.reregister_seconds
        depth = (self.cfg.video.pipeline_depth if pipeline_depth is None
                 else pipeline_depth)
        # re-entrancy: a previous run() set _stop in its finally; a fresh
        # loop needs a live worker (else re-registration requests are never
        # serviced and the exit drain spins its full deadline)
        self._stop.clear()
        self._reg_requested.clear()
        frames = source.read()
        if frames is None:
            raise RuntimeError("frame source empty")
        if self._lut is None:
            self.register(frames)

        self._reg_busy = threading.Event()

        def reg_worker():
            while not self._stop.is_set():
                if not self._reg_requested.wait(timeout=0.1):
                    continue
                self._reg_busy.set()       # before clearing the request: the
                self._reg_requested.clear()  # drain loop must never see both unset
                with self._lock:
                    latest = self._latest_frames
                try:
                    self.register(latest)
                except Exception:
                    # registration failure: keep streaming with the old LUT and
                    # retry on the next trigger (reference retry loop :822-826)
                    log.warning(
                        "re-registration failed; keeping the previous LUT",
                        exc_info=True)
                finally:
                    self._reg_busy.clear()

        self._latest_frames = frames
        self._reg_thread = threading.Thread(target=reg_worker, daemon=True)
        self._reg_thread.start()
        sc = None
        if depth > 1:
            from .stream import StreamingComposer
            sc = StreamingComposer(self, depth=depth)
        try:
            i = 0
            delivered = 0
            while max_frames is None or i < max_frames:
                with Timer() as t_read:
                    if i > 0:
                        frames = source.read()
                        if frames is None:
                            break
                with self._lock:
                    self._latest_frames = frames
                with Timer() as t_comp:
                    pano = (sc.submit(frames) if sc is not None
                            else self.composite(frames))
                self.stats.read_s.append(t_read.elapsed)
                self.stats.compose_s.append(t_comp.elapsed)
                self.stats.frames += 1
                if pano is not None:
                    if on_frame is not None:
                        on_frame(pano, delivered)
                    delivered += 1
                if time.monotonic() - self._last_reg_time > period:
                    self._last_reg_time = time.monotonic()  # rearm
                    self._reg_requested.set()
                i += 1
            if sc is not None:
                for pano in sc.flush():      # drain the in-flight tail
                    if on_frame is not None:
                        on_frame(pano, delivered)
                    delivered += 1
        finally:
            # drain any in-flight re-registration before tearing the worker
            # down (an interpreter exit with a live jax thread aborts hard)
            deadline = time.monotonic() + 120.0
            while (self._reg_requested.is_set() or self._reg_busy.is_set()) \
                    and time.monotonic() < deadline:
                time.sleep(0.05)
            self._stop.set()
            self._reg_thread.join(timeout=30.0)
        return self.stats
