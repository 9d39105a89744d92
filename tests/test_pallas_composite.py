"""Pallas tiled composite kernel vs the XLA-gather reference (interpret mode
on CPU; the same kernel compiles natively on TPU — exercised by bench.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stitchingvideo_tpu.ops.pallas.composite import (
    build_tiled_lut, composite_tiled)
from stitchingvideo_tpu.video.lut import CompositeLUT, composite_frame_u8


def _make_state(rng, n_cams=3, fh=128, fw=512, ph=64, pw=1024, rot=0.05):
    frames = rng.integers(0, 255, (n_cams, fh, fw, 3), np.uint8)
    xx, yy = np.meshgrid(np.arange(pw, dtype=np.float32),
                         np.arange(ph, dtype=np.float32))
    seg = pw // n_cams
    cam = np.clip(xx.astype(np.int32) // seg, 0, n_cams - 1)
    lx = xx - cam * seg
    # smooth rotated-ish map per camera, strictly inside the frame
    sx = 8 + lx * (fw - 16) / seg + rot * yy
    sy = 8 + yy * (fh - 16) / ph - rot * lx * 0.2
    valid = (sx > 1) & (sx < fw - 2) & (sy > 1) & (sy < fh - 2)
    gain = 1.0 + 0.1 * np.sin(xx / 31.0)
    lut = CompositeLUT(
        cam_idx=jnp.asarray(np.where(valid, cam, -1).astype(np.int32)),
        src_x=jnp.asarray(sx.astype(np.float32)),
        src_y=jnp.asarray(sy.astype(np.float32)),
        gain=jnp.asarray(gain.astype(np.float32)))
    return jnp.asarray(frames), lut


def test_build_tiled_lut(rng):
    frames, lut = _make_state(rng)
    tlut = build_tiled_lut(lut, (128, 512))
    assert int(tlut.n_fallback) == 0
    T = tlut.sx.shape[0]
    assert tlut.tile_cam.shape == (T * 2,)
    # origins in range
    org = np.asarray(tlut.tile_org).reshape(-1, 4)
    assert org.min() >= 0
    assert org[:, [0, 2]].max() <= 128 - 80
    assert org[:, [1, 3]].max() <= 512 - 384


def test_composite_tiled_matches_gather(rng):
    frames, lut = _make_state(rng)
    ref = np.asarray(composite_frame_u8(frames, lut)).astype(np.int32)
    tlut = build_tiled_lut(lut, (128, 512))
    assert int(tlut.n_fallback) == 0
    out = np.asarray(composite_tiled(frames, tlut, interpret=True)).astype(np.int32)
    assert out.shape == ref.shape
    diff = np.abs(out - ref)
    # bf16 weight quantization: tiny deviations allowed
    assert np.median(diff) <= 1
    assert diff.mean() < 1.0, diff.mean()
    assert (diff <= 3).mean() > 0.999, (diff > 3).mean()


def test_composite_tiled_uncovered_zero(rng):
    frames, lut = _make_state(rng)
    tlut = build_tiled_lut(lut, (128, 512))
    out = np.asarray(composite_tiled(frames, tlut, interpret=True))
    cam = np.asarray(lut.cam_idx)
    assert (out[cam < 0] == 0).all()
