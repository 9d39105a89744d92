"""Multiband blending as a VIDEO mode: per-frame Laplacian blending through
registration-cached state.

The reference's video hot loop is seam-select only; its multiband blender
exists on the still path (blenders.cpp:189-377, feed() per image over its
ROI + band-canvas accumulation). The first video version of this mode ran
every per-camera stage on FULL-CANVAS grids ([N*3, CHp, CWp] pyramids),
~340 ms/frame — dominated by full-resolution work that is provably
unnecessary:

  * Per-camera content lives in a narrow window of the canvas. All
    per-camera terms (mask-normalized pyramids, Laplacians, the L1->L0
    upsample) are computed on tight per-camera WINDOW grids and only
    accumulated onto canvas grids (the reference's own feed()-per-ROI
    architecture, re-derived for batched TPU execution). A 360° wrap-around
    camera whose footprint spans both canvas edges is split at its interior
    footprint gap into two virtual cameras — Gaussian pyramids are linear,
    so the split is exact as long as the two halves' blur tails never meet.
  * Level-0 needs no per-camera normalization at all: the level-0 mask
    pyramid is the binary seam partition, so
        band_0 = sum_n gi_n - sum_n up(norm_n,1) * m_n = S - U
    where S is the plain seam-composited canvas (one accumulation of the
    warped windows) and U accumulates per-window upsamples. The [N*3]
    full-canvas level-0 pyramid stage of the old path disappears.
  * Pyramid levels are stored bfloat16 (blur arithmetic in f32, canvas
    accumulators f32): the chain is HBM-bound and u8 content fits bf16.

Per frame only window pyramids + canvas accumulation remain. Quality
semantics match blend/multiband.py (normalized-convolution pyramids, the
documented TPU deviation) up to window truncation of coarse-band Gaussian
tails beyond MARGIN px outside a camera's footprint — the cached mask
pyramids and normalization reciprocals are truncated identically, so the
output stays a convex blend of camera values; the deviation is gated by
tests/test_multiband_video.py against the full still blend.
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pyramid_planar as ppyr
from .multiband import WEIGHT_EPS, num_bands_for, pad_for_bands

# extra window width (canvas px) kept on each side of a camera's footprint:
# level-l Gaussian tails spread ~4*2^l px, so 256 keeps levels <= 6 exact
# and truncates only the outermost tail of band 7
MARGIN = 256
# footprint column gaps wider than this split a camera into virtual cameras
# (the 360° wrap-around case); narrower gaps stay one window
SPLIT_GAP = 384


@flax.struct.dataclass
class MultibandVideoState:
    """Registration-cached state for the windowed multiband frame path."""
    warp_lut: object            # ONE concat TiledLUT (frame -> windows, gain folded)
    m0: jnp.ndarray             # [Nv, Hb, Wb] bf16 binary seam&valid masks
    gm: Tuple                   # window mask Gaussian pyramid [Nv, h, w]/level
    recip: Tuple                # per-band canvas 1/(wsum + eps), f32
    piece_cam: Tuple[int, ...] = flax.struct.field(pytree_node=False)
    piece_ax: Tuple[int, ...] = flax.struct.field(pytree_node=False)
    canvas_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    buf_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    out_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    bands: int = flax.struct.field(pytree_node=False)
    # align-padded window-stack canvas width CWb (>= ax + Wb for every
    # piece): the sharded path's local accumulators run on this width
    pad_w: int = flax.struct.field(pytree_node=False, default=0)


def _column_pieces(valid: np.ndarray) -> List[Tuple[int, int]]:
    """[Hr, Wr] footprint -> list of (x0, x1) ROI column spans. One span per
    contiguous column run; runs separated by <= SPLIT_GAP are merged. Splits
    at EVERY wide gap — a footprint the seams carve into k clusters (the
    wrap-around camera, or per-component DP seams) yields k virtual cameras;
    collapsing them to one span would inflate the shared window width Wb
    toward the full canvas and with it every camera's pyramid cost."""
    cols = np.flatnonzero(valid.any(axis=0))
    if cols.size == 0:
        return []
    # diff between consecutive covered columns = uncovered gap + 1
    gaps = np.flatnonzero(np.diff(cols) - 1 > SPLIT_GAP)
    starts = np.concatenate([[0], gaps + 1])
    ends = np.concatenate([gaps, [cols.size - 1]])
    return [(int(cols[s]), int(cols[e]) + 1) for s, e in zip(starts, ends)]


def build_multiband_state(reg, frame_hw: Tuple[int, int],
                          blend_strength: float = 5.0,
                          crop=None, pad_pieces_to: int = 0):
    """From a Registration pytree -> (MultibandVideoState, crop_yx).
    crop=(y0,y1,x0,x1) applies the RT crop margins to the OUTPUT (canvas and
    pyramids keep the full extent so blend character is unchanged).
    pad_pieces_to: round the virtual-camera count up to a multiple (empty
    pieces — all-uncovered windows, zero masks — so the piece axis splits
    evenly across canvas shards; see parallel/compose_multiband.py)."""
    from ..ops.pallas.composite import build_tiled_lut
    from ..video.lut import CompositeLUT

    n = reg.n_cameras
    CW, CH = reg.canvas_wh
    bands = num_bands_for(float(CW * CH), blend_strength)
    if bands < 1:
        raise ValueError("canvas too small for banded blending")
    CHp, CWp = pad_for_bands(CH, CW, bands)
    align = max(128, 1 << bands)
    CHb = -(-CHp // align) * align      # window height = full canvas height
    CWb = -(-CWp // align) * align
    Hr, Wr = reg.roi_hw

    valid_np = np.asarray(reg.valid)
    seam_np = np.asarray(reg.seam_masks) & valid_np
    xm_np = np.asarray(reg.xmaps)
    ym_np = np.asarray(reg.ymaps)
    gn_np = np.asarray(reg.gain_maps)
    corners = np.asarray(reg.corners)

    # -- virtual-camera windows ------------------------------------------
    # window extents follow the SEAM-owned footprint (not the full valid
    # footprint): every per-camera term is seam-masked before the pyramids,
    # so valid-but-unowned content contributes nothing anywhere — narrower
    # windows shrink the whole per-frame pyramid chain
    pieces = []                       # (cam, ax, x0r, x1r)
    for i in range(n):
        cx, cy = int(corners[i, 0]), int(corners[i, 1])
        for x0r, x1r in _column_pieces(seam_np[i]):
            cx0 = max(0, cx + x0r)
            cx1 = min(CWb, cx + x1r)
            if cx1 <= cx0:
                continue
            pieces.append((i, cx0, cx1, x0r, x1r))
    if not pieces:
        raise ValueError("no valid camera footprints")
    Wb = min(CWb, -(-(max(c1 - c0 for _, c0, c1, _, _ in pieces)
                      + 2 * MARGIN) // align) * align)
    Nv = len(pieces)

    piece_cam, piece_ax = [], []
    m_w = np.zeros((Nv, CHb, Wb), np.float32)
    luts = []
    for p, (i, cx0, cx1, x0r, x1r) in enumerate(pieces):
        cx, cy = int(corners[i, 0]), int(corners[i, 1])
        ax = max(0, cx0 - MARGIN) // align * align
        ax = min(ax, CWb - Wb)
        if ax + Wb < cx1:             # window must cover the footprint
            ax = min(CWb - Wb, -(-(cx1 - Wb) // align) * align)
        assert ax >= 0 and ax + Wb >= cx1 and ax <= cx0, (ax, cx0, cx1, Wb)
        piece_cam.append(i)
        piece_ax.append(int(ax))

        # ROI -> window copy rectangles (full canvas height; content is
        # clipped at the TRUE canvas extent CHp/CWp exactly like the
        # full-canvas placement it replaces)
        ry0, ry1 = max(0, -cy), min(Hr, CHp - cy)
        rc0 = max(x0r, ax - cx)
        rc1 = min(x1r, ax + Wb - cx, CWp - cx)
        wy, wx = cy + ry0, (cx + rc0) - ax
        hh, ww = ry1 - ry0, rc1 - rc0
        if hh <= 0 or ww <= 0:
            raise ValueError(f"camera {i}: empty window piece")

        # the frame path multiplies the warped window by the binary seam
        # mask m0 — fold that mask into the LUT coverage instead: seam-
        # unowned pixels become uncovered (-1), the kernel writes exact 0
        # there, and whole seam-unowned tile GROUPs drop out of the launch
        # grid via the used-groups compaction (materialize2_used)
        sv = seam_np[i, ry0:ry1, rc0:rc1]
        cam_idx = np.full((CHb, Wb), -1, np.int32)
        cam_idx[wy:wy + hh, wx:wx + ww] = np.where(sv, 0, -1)
        sx = np.zeros((CHb, Wb), np.float32)
        sy = np.zeros((CHb, Wb), np.float32)
        gg = np.ones((CHb, Wb), np.float32)
        sx[wy:wy + hh, wx:wx + ww] = xm_np[i, ry0:ry1, rc0:rc1]
        sy[wy:wy + hh, wx:wx + ww] = ym_np[i, ry0:ry1, rc0:rc1]
        gg[wy:wy + hh, wx:wx + ww] = gn_np[i, ry0:ry1, rc0:rc1]
        m_w[p, wy:wy + hh, wx:wx + ww] = sv

        lut_p = CompositeLUT(cam_idx=jnp.asarray(cam_idx),
                             src_x=jnp.asarray(sx), src_y=jnp.asarray(sy),
                             gain=jnp.asarray(gg))
        tl = build_tiled_lut(lut_p, tuple(frame_hw))
        # window-overflow tiles (strong local warp curvature) are fine: the
        # mat2 pieces kernel overlays them with the exact XLA gather
        luts.append(tl)

    if pad_pieces_to and Nv % pad_pieces_to:
        n_dummy = -Nv % pad_pieces_to
        zer = np.zeros((CHb, Wb), np.float32)
        empty = CompositeLUT(
            cam_idx=jnp.asarray(np.full((CHb, Wb), -1, np.int32)),
            src_x=jnp.asarray(zer), src_y=jnp.asarray(zer),
            gain=jnp.asarray(np.ones((CHb, Wb), np.float32)))
        for _ in range(n_dummy):
            piece_cam.append(0)
            piece_ax.append(0)
            luts.append(build_tiled_lut(empty, tuple(frame_hw)))
        m_w = np.concatenate(
            [m_w, np.zeros((n_dummy, CHb, Wb), np.float32)])
        Nv += n_dummy

    from ..ops.pallas.composite import concat_tiled_luts
    from ..ops.pallas.composite_mat2 import materialize2_used
    warp_lut = jax.device_put(
        materialize2_used(concat_tiled_luts(luts, piece_cam)))
    gm, recip = _mask_state(jnp.asarray(m_w), tuple(piece_ax),
                            (CHp, CWp), bands)
    y0, y1, x0, x1 = crop if crop is not None else (0, CH, 0, CW)
    st = MultibandVideoState(
        warp_lut=warp_lut,
        m0=jnp.asarray(m_w).astype(jnp.bfloat16),
        gm=gm, recip=recip,
        piece_cam=tuple(piece_cam), piece_ax=tuple(piece_ax),
        canvas_hw=(CHp, CWp), buf_hw=(CHb, Wb),
        out_hw=(y1 - y0, x1 - x0), bands=bands, pad_w=CWb)
    return st, (y0, x0)


@partial(jax.jit, static_argnames=("piece_ax", "canvas_hw", "bands"))
def _mask_state(m_w, piece_ax, canvas_hw, bands):
    """Window mask pyramids + canvas normalization reciprocals."""
    CHp, CWp = canvas_hw
    gm = tuple(ppyr.gaussian_pyramid_p(m_w, bands))
    recip = []
    for lvl, g in enumerate(gm):
        ws = jnp.zeros((CHp >> lvl, CWp >> lvl), jnp.float32)
        hb, wb = g.shape[1], g.shape[2]
        hl, wl = CHp >> lvl, CWp >> lvl
        for p, ax in enumerate(piece_ax):
            ws = ws.at[:min(hb, hl), ax >> lvl:(ax >> lvl) + wb].add(
                g[p, :min(hb, hl), :min(wb, wl - (ax >> lvl))])
        recip.append(1.0 / (ws + WEIGHT_EPS))
    return gm, tuple(recip)


@jax.jit
def _bblur_up(x_bf16: jnp.ndarray) -> jnp.ndarray:
    """pyr_up on bf16 storage: bf16 MXU operands (= the stored data,
    nothing lost), exact f32 accumulation and output."""
    return ppyr.pyr_up_p(x_bf16, jnp.float32)


@partial(jax.jit, static_argnames=("interpret", "crop_yx"))
def multiband_video_frames_batched(planar_b_i8: jnp.ndarray,
                                   st: MultibandVideoState,
                                   crop_yx: Tuple[int, int] = (0, 0),
                                   interpret: bool = False) -> jnp.ndarray:
    """[B,N,3,H,W] int8 planar frames (value-128, see
    composite_mat.frames_to_planar_i8) -> blended [B, 3, outH, outW] uint8.

    The whole band chain runs batched: B folds into the M dimension of the
    warp kernel and of every pyramid matmul, and each canvas accumulation
    touches B frames per pass — measured ~1.6x the per-frame throughput of
    lax.map over the single-frame path at B=8 (the lax.map body leaves the
    MXU mostly idle between short ops)."""
    from ..ops.pallas.composite_mat2 import \
        composite_mat2_planar_pieces_batched

    B = planar_b_i8.shape[0]
    Nv = len(st.piece_cam)
    CHp, CWp = st.canvas_hw
    CHb, Wb = st.buf_hw
    bands = st.bands

    # -- warp every piece into its window: mat2 kernels (int8 DMAs, short
    # easy windows, seam-unowned groups skipped); the seam mask m0 is folded
    # into the LUT so the output is already masked. M-stacked over B with
    # bf16 output blocks (the window grid is ~1.9x the pano grid — GROUP
    # granularity keeps most window tiles "used" — so its output traffic
    # matters twice as much).
    x = composite_mat2_planar_pieces_batched(planar_b_i8, st.warp_lut, Nv,
                                             interpret=interpret)
    # [B, Nv, 3, CHb, Wb] bf16

    # -- window image pyramids + per-level normalized contributions -------
    gp = ppyr.gaussian_pyramid_p(x.reshape(B * Nv * 3, CHb, Wb), bands)
    norms = [None]
    for lvl in range(1, bands + 1):
        gi = gp[lvl].reshape(B, Nv, 3, CHb >> lvl, Wb >> lvl)
        norms.append((gi / jnp.maximum(st.gm[lvl],
                                       WEIGHT_EPS)[None, :, None])
                     .astype(jnp.bfloat16))

    # band canvases for levels >= 1: sum_p lap_p * gm_p placed at ax>>lvl
    band = []
    for lvl in range(1, bands + 1):
        if lvl < bands:
            up = _bblur_up(norms[lvl + 1].reshape(
                B * Nv * 3, CHb >> (lvl + 1), Wb >> (lvl + 1))) \
                .reshape(B, Nv, 3, CHb >> lvl, Wb >> lvl)
            lap = norms[lvl].astype(jnp.float32) - up
        else:
            lap = norms[bands].astype(jnp.float32)
        contrib = lap * st.gm[lvl][None, :, None]
        hl, wl = CHp >> lvl, CWp >> lvl
        hb, wb = CHb >> lvl, Wb >> lvl
        acc = jnp.zeros((B, 3, hl, wl), jnp.float32)
        for p, ax in enumerate(st.piece_ax):
            a = ax >> lvl
            acc = acc.at[:, :, :min(hb, hl), a:a + wb].add(
                contrib[:, p, :, :min(hb, hl), :min(wb, wl - a)])
        band.append(acc)

    # -- collapse coarse..1 on canvas grids -------------------------------
    C = band[-1] * st.recip[bands][None, None]
    for lvl in range(bands - 1, 0, -1):
        C = ppyr.pyr_up_p(C.reshape(B * 3, CHp >> (lvl + 1),
                                    CWp >> (lvl + 1))) \
            .reshape(B, 3, CHp >> lvl, CWp >> lvl) \
            + band[lvl - 1] * st.recip[lvl][None, None]

    # -- level 0: band_0 = sum_p place(x_p - up(norm_1)_p * m_p) ----------
    # (x is the seam composite S restricted to its window and u the level-0
    # correction; folding the subtraction into window space leaves ONE
    # canvas accumulation instead of separate S and U passes)
    u_all = _bblur_up(norms[1].reshape(B * Nv * 3, CHb >> 1, Wb >> 1)) \
        .reshape(B, Nv, 3, CHb, Wb) * st.m0[None, :, None] \
        .astype(jnp.float32)
    d_all = x.astype(jnp.float32) - u_all
    B0 = jnp.zeros((B, 3, CHp, CWp), jnp.float32)
    for p, ax in enumerate(st.piece_ax):
        B0 = B0.at[:, :, :CHp, ax:ax + Wb].add(
            d_all[:, p, :, :CHp, :min(Wb, CWp - ax)])

    pano = B0 * st.recip[0][None, None] \
        + ppyr.pyr_up_p(C.reshape(B * 3, CHp >> 1, CWp >> 1)) \
        .reshape(B, 3, CHp, CWp)

    oy, ox = crop_yx
    oh, ow = st.out_hw
    out = jax.lax.dynamic_slice(
        pano, (jnp.int32(0), jnp.int32(0), oy, ox), (B, 3, oh, ow))
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("interpret", "crop_yx"))
def multiband_video_frame(planar_i8: jnp.ndarray, st: MultibandVideoState,
                          crop_yx: Tuple[int, int] = (0, 0),
                          interpret: bool = False) -> jnp.ndarray:
    """[N,3,H,W] int8 planar frames (value-128, see
    composite_mat.frames_to_planar_i8) -> blended [3, outH, outW] uint8.
    B=1 slice of the batched path (single code path => automatic parity)."""
    return multiband_video_frames_batched(planar_i8[None], st,
                                          crop_yx=crop_yx,
                                          interpret=interpret)[0]
