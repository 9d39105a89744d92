"""Multiband blending as a VIDEO mode: per-frame Laplacian blending through
registration-cached state.

The reference's video hot loop is seam-select only; its multiband blender
exists on the still path (blenders.cpp:189-377). The round-1 video
'multiband' mode re-ran the full still blend graph per frame (remap gathers +
per-frame mask pyramids + python canvas placement) at ~1 s/frame. This module
restructures it around what is registration-static:

  * per-camera warps run through the on-the-fly Pallas tiled kernel (one
    single-camera TiledLUT per camera, gain folded; ~16 B/pixel of HBM —
    MATERIALIZED weights at ~336 B/pixel would cost several GB across 6
    full-res ROIs and OOM the chip) — the remap gathers were ~0.8 s/frame
    of scalar-issue work;
  * the mask Gaussian pyramids and the per-band normalization reciprocals
    depend only on the registration — precomputed once, cached in HBM;
  * the whole frame path (warp → place → image pyramids → weighted
    accumulate → collapse) is ONE jitted program, so nothing is retraced
    and nothing visits the host.

Per frame only the image pyramids remain — the irreducible per-frame cost of
true multiband blending. Quality semantics match blend/multiband.py
(normalized-convolution full-canvas pyramids, the documented TPU deviation).
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


@flax.struct.dataclass
class MultibandVideoState:
    """Registration-cached state for the multiband frame path."""
    warp_luts: Tuple            # per-camera mat2 LUTs (ROI warp, gain folded)
    corners: jnp.ndarray        # [N, 2] (x, y) canvas corners
    masks: jnp.ndarray          # [N, CHp, CWp] bool (seam & valid, placed)
    gp_m: Tuple                 # mask Gaussian pyramid, stacked [N,h,w]/level
    recip: Tuple                # per-band 1/(sum_i gp_m_i + eps)
    canvas_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    out_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    bands: int = flax.struct.field(pytree_node=False)
    roi_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)


def build_multiband_state(reg, frame_hw: Tuple[int, int],
                          blend_strength: float = 5.0,
                          crop=None) -> MultibandVideoState:
    """From a Registration pytree. crop=(y0,y1,x0,x1) applies the RT crop
    margins to the OUTPUT (the canvas/pyramids keep the full extent so blend
    character is unchanged; the crop is a final slice)."""
    from ..ops.pallas.composite import build_tiled_lut
    from ..video.lut import CompositeLUT

    n = reg.n_cameras
    CW, CH = reg.canvas_wh
    bands = num_bands_for(float(CW * CH), blend_strength)
    CHp, CWp = pad_for_bands(CH, CW, bands)

    luts = []
    for i in range(n):
        lut_i = CompositeLUT(
            cam_idx=jnp.where(reg.valid[i], 0, -1).astype(jnp.int32),
            src_x=reg.xmaps[i], src_y=reg.ymaps[i],
            gain=reg.gain_maps[i])
        tl = build_tiled_lut(lut_i, tuple(frame_hw))
        if int(tl.n_fallback) != 0:
            raise ValueError(f"camera {i}: {int(tl.n_fallback)} "
                             "window-overflow tiles in the warp LUT")
        luts.append(jax.device_put(tl))

    corners = np.asarray(reg.corners)
    masks, gp_m, wsum = _mask_pyramids(
        reg.seam_masks, reg.valid, jnp.asarray(corners), (CHp, CWp), bands)
    recip = tuple(1.0 / (w + WEIGHT_EPS) for w in wsum)

    y0, y1, x0, x1 = crop if crop is not None else (0, CH, 0, CW)
    return MultibandVideoState(
        warp_luts=tuple(luts), corners=jnp.asarray(corners),
        masks=masks, gp_m=gp_m, recip=recip,
        canvas_hw=(CHp, CWp), out_hw=(y1 - y0, x1 - x0), bands=bands,
        roi_hw=reg.roi_hw), (y0, x0)


@partial(jax.jit, static_argnames=("canvas_hw", "bands"))
def _mask_pyramids(seam_masks, valid, corners, canvas_hw, bands):
    CHp, CWp = canvas_hw
    n, Hr, Wr = seam_masks.shape

    def place(i):
        m = (seam_masks[i] & valid[i]).astype(jnp.float32)
        canvas = jnp.zeros((CHp + Hr, CWp + Wr), jnp.float32)
        canvas = jax.lax.dynamic_update_slice(
            canvas, m, (corners[i, 1], corners[i, 0]))
        return canvas[:CHp, :CWp]

    placed = jnp.stack([place(i) for i in range(n)])      # [N, CHp, CWp]
    # batched mask pyramids: levels as stacked [N, h, w]
    gp_m = tuple(ppyr.gaussian_pyramid_p(placed, bands))
    wsum = tuple(g.sum(axis=0) for g in gp_m)
    masks = placed > 0
    return masks, gp_m, wsum


@jax.jit
def to_planar_bf16(frames_u8: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,3] u8 -> [N,3,H,W] bf16. MUST run as its own dispatch: a
    transpose fused into the same jit as the warp kernels gets folded into
    a non-default operand layout that Mosaic rejects (see composite_tiled)."""
    return frames_u8.transpose(0, 3, 1, 2).astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("interpret", "crop_yx"))
def multiband_video_frame(planar_bf16: jnp.ndarray, st: MultibandVideoState,
                          crop_yx: Tuple[int, int] = (0, 0),
                          interpret: bool = False) -> jnp.ndarray:
    """[N,3,H,W] bfloat16 planar frames (see to_planar_bf16) ->
    blended [3, outH, outW] uint8."""
    from ..ops.pallas.composite import composite_tiled_planar

    n = planar_bf16.shape[0]
    CHp, CWp = st.canvas_hw
    Hr, Wr = st.roi_hw
    bands = st.bands

    # warp every camera (Pallas), place on canvas -> one BATCHED pyramid
    # chain over [N*3, H, W] (six sequential chains left the VPU underfed)
    canvases = []
    for i in range(n):
        w = composite_tiled_planar(planar_bf16[i:i + 1], st.warp_luts[i],
                                   interpret=interpret)   # [Hr, Wr, 3] u8
        img = jnp.transpose(w, (2, 0, 1)).astype(jnp.float32)[:, :Hr, :Wr]
        canvas = jnp.zeros((3, CHp + Hr, CWp + Wr), jnp.float32)
        canvas = jax.lax.dynamic_update_slice(
            canvas, img, (jnp.int32(0), st.corners[i, 1], st.corners[i, 0]))
        canvases.append(canvas[:, :CHp, :CWp])
    stack = jnp.stack(canvases)                           # [N, 3, CHp, CWp]
    stack = stack * st.masks.astype(jnp.float32)[:, None]
    gp_im = ppyr.gaussian_pyramid_p(stack.reshape(n * 3, CHp, CWp), bands)
    band_acc: List[jnp.ndarray] = []
    norms = []
    for lvl in range(bands + 1):
        gi = gp_im[lvl].reshape(n, 3, CHp >> lvl, CWp >> lvl)
        gm = st.gp_m[lvl]                                  # [N, h, w]
        norms.append(gi / jnp.maximum(gm, WEIGHT_EPS)[:, None])
    for lvl in range(bands + 1):
        if lvl < bands:
            up = ppyr.pyr_up_p(
                norms[lvl + 1].reshape(n * 3, CHp >> (lvl + 1),
                                       CWp >> (lvl + 1))) \
                .reshape(n, 3, CHp >> lvl, CWp >> lvl)
            lap = norms[lvl] - up
        else:
            lap = norms[lvl]
        band_acc.append(jnp.einsum("nchw,nhw->chw", lap, st.gp_m[lvl]))

    norm = [b * r[None] for b, r in zip(band_acc, st.recip)]
    pano = ppyr.collapse_laplacian_p(norm)
    oy, ox = crop_yx
    oh, ow = st.out_hw
    out = jax.lax.dynamic_slice(pano, (jnp.int32(0), oy, ox), (3, oh, ow))
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
