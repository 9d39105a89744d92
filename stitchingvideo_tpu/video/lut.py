"""Composite LUT: the flattened per-panorama-pixel gather table + hot loop.

Parity target: the reference's key performance insight (SURVEY §7.1) — the
64-bit RT driver's `xmapdet/ymapdet/indxmap` composite LUT built during
registration (`feedSize`, stitching_detailed.cpp:117-148) and consumed by the
per-frame hot loop (`feedSizeRemap` :150-177, `StitchingAll` :724-770): every
panorama pixel knows its source camera and source coordinates, so a frame is
composited by one gather pass. The reference chains two remaps (fisheye
undistort then cylindrical warp); here both are composed into a single map at
LUT build time, and gain is folded in as a per-pixel multiplier.

All LUT state is traced arrays — re-registration swaps buffers without any
recompilation (UpdateMat parity, :696-722).
"""
from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp

from ..models.registration import Registration


@flax.struct.dataclass
class CompositeLUT:
    """cam_idx: [Hp, Wp] int32 (-1 where uncovered); src_x/src_y: [Hp, Wp]
    float32 source-frame coords; gain: [Hp, Wp] float32."""
    cam_idx: jnp.ndarray
    src_x: jnp.ndarray
    src_y: jnp.ndarray
    gain: jnp.ndarray

    @property
    def shape(self):
        return self.cam_idx.shape


@partial(jax.jit, static_argnames=("canvas_wh", "roi_hw", "crop"))
def _build(corners, valid, xmaps, ymaps, seam_masks, gain_maps,
           canvas_wh, roi_hw, crop=None):
    CW, CH = canvas_wh
    Hr, Wr = roi_hw
    n = xmaps.shape[0]
    # oversized canvas so dynamic_update_slice never clamps, cropped at the end
    HP, WP = CH + Hr, CW + Wr

    def place(i, arr, fill):
        canvas = jnp.full((HP, WP), fill, arr.dtype)
        return jax.lax.dynamic_update_slice(
            canvas, arr, (corners[i, 1], corners[i, 0]))

    own = jnp.stack([place(i, (seam_masks[i] & valid[i]), False)
                     for i in range(n)])              # [N, HP, WP]
    sx = jnp.stack([place(i, xmaps[i], 0.0) for i in range(n)])
    sy = jnp.stack([place(i, ymaps[i], 0.0) for i in range(n)])
    g = jnp.stack([place(i, gain_maps[i], 1.0) for i in range(n)])

    cam = jnp.argmax(own, axis=0)                     # first owner wins
    covered = own.any(axis=0)
    cam_idx = jnp.where(covered, cam, -1)

    def take(a):
        # equality-masked select instead of take_along_axis: a 22M-index
        # gather is scalar-issue on TPU (~2.5 s of the warm re-registration);
        # N where-passes are pure VPU (~ms)
        out = a[0]
        for i in range(1, n):
            out = jnp.where(cam == i, a[i], out)
        return out

    src_x = take(sx)
    src_y = take(sy)
    gain = jnp.where(covered, take(g), 1.0)
    y0, y1, x0, x1 = crop if crop is not None else (0, CH, 0, CW)
    sl = (slice(y0, y1), slice(x0, x1))
    return CompositeLUT(cam_idx=cam_idx[sl].astype(jnp.int32),
                        src_x=src_x[sl], src_y=src_y[sl], gain=gain[sl])


def build_lut(reg: Registration, crop=None) -> CompositeLUT:
    """crop=(y0, y1, x0, x1) applies the RT crop margins inside the same
    jitted program (one dispatch, no separate slice pass)."""
    return _build(reg.corners, reg.valid, reg.xmaps, reg.ymaps,
                  reg.seam_masks, reg.gain_maps, reg.canvas_wh, reg.roi_hw,
                  crop=tuple(crop) if crop is not None else None)


def pad_lut_rows_for_shards(lut: CompositeLUT, n_shards: int,
                            tile_h: int = 8, tile_w: int = 128,
                            group: int = 8) -> CompositeLUT:
    """Pad the panorama with uncovered rows so the tiled kernel's row-major
    tile groups split into n_shards equal row bands of whole groups:
    nty % n_shards == 0 and (nty / n_shards) * ntx % group == 0. Pad rows are
    cam_idx=-1 (gc=0 in the kernel -> black), cropped off after compose."""
    H, W = lut.cam_idx.shape
    ntx = -(-W // tile_w)
    k = -(-(-(-H // tile_h)) // n_shards)     # ceil(nty0 / n_shards)
    while (k * ntx) % group != 0:
        k += 1
    Hp = k * n_shards * tile_h
    if Hp == H:
        return lut
    pad = ((0, Hp - H), (0, 0))
    return CompositeLUT(
        cam_idx=jnp.pad(lut.cam_idx, pad, constant_values=-1),
        src_x=jnp.pad(lut.src_x, pad),
        src_y=jnp.pad(lut.src_y, pad),
        gain=jnp.pad(lut.gain, pad, constant_values=1.0))


@jax.jit
def composite_frame(frames: jnp.ndarray, lut: CompositeLUT) -> jnp.ndarray:
    """The per-frame hot loop: bilinear gather through the composite LUT.

    frames: [N, H, W, 3] (uint8 or float); returns [Hp, Wp, 3] float32.
    XLA-gather formulation; the Pallas-tiled variant lives in
    ops/pallas/composite.py and is selected by the video runtime when
    available.
    """
    n, H, W, C = frames.shape
    flat = frames.reshape(n * H * W, C).astype(jnp.float32)
    base = jnp.maximum(lut.cam_idx, 0) * (H * W)

    x0f = jnp.floor(lut.src_x)
    y0f = jnp.floor(lut.src_y)
    fx = lut.src_x - x0f
    fy = lut.src_y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    def g(yi, xi):
        return jnp.take(flat, (base + yi * W + xi).reshape(-1), axis=0) \
            .reshape(*lut.cam_idx.shape, C)

    out = ((1 - fx) * (1 - fy))[..., None] * g(y0, x0) \
        + (fx * (1 - fy))[..., None] * g(y0, x1) \
        + ((1 - fx) * fy)[..., None] * g(y1, x0) \
        + (fx * fy)[..., None] * g(y1, x1)
    out = out * lut.gain[..., None]
    return jnp.where((lut.cam_idx >= 0)[..., None], out, 0.0)


@jax.jit
def composite_frame_u8(frames: jnp.ndarray, lut: CompositeLUT) -> jnp.ndarray:
    """Hot loop returning uint8 (display/encode path)."""
    return jnp.clip(jnp.round(composite_frame(frames, lut)), 0, 255).astype(jnp.uint8)
