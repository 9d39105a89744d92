"""Materialized-weights composite kernel vs XLA gather reference (interpret)."""
import numpy as np
import pytest

import jax.numpy as jnp

from stitchingvideo_tpu.ops.pallas.composite_mat import (
    build_mat_lut, composite_mat, planar_to_hwc)
from stitchingvideo_tpu.video.lut import composite_frame_u8

from tests.test_pallas_composite import _make_state


def test_composite_mat_matches_gather(rng):
    frames, lut = _make_state(rng)
    ref = np.asarray(composite_frame_u8(frames, lut)).astype(np.int32)
    mlut = build_mat_lut(lut, (128, 512))
    assert int(mlut.n_fallback) == 0
    out_planar = composite_mat(frames, mlut, interpret=True)
    out = np.asarray(planar_to_hwc(out_planar)).astype(np.int32)
    assert out.shape == ref.shape
    diff = np.abs(out - ref)
    # int8 weight quantization: <= ~2 gray levels
    assert np.median(diff) <= 1
    assert diff.mean() < 1.2, diff.mean()
    assert (diff <= 4).mean() > 0.999, (diff > 4).mean()


def test_composite_mat_uncovered_zero(rng):
    frames, lut = _make_state(rng)
    mlut = build_mat_lut(lut, (128, 512))
    out = np.asarray(composite_mat(frames, mlut, interpret=True))
    cam = np.asarray(lut.cam_idx)
    assert (out.transpose(1, 2, 0)[cam < 0] == 0).all()


def test_vx_rows_sum_127(rng):
    frames, lut = _make_state(rng)
    mlut = build_mat_lut(lut, (128, 512))
    from stitchingvideo_tpu.ops.pallas.composite import VXW
    vx = np.asarray(mlut.vx).astype(np.int32)
    vx = vx.reshape(-1, VXW, 1024)[:mlut.n_tiles]
    sums = vx.sum(axis=1)
    assert (sums == 127).all()
