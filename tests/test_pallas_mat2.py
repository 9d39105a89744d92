"""Two-class materialized kernel vs the XLA gather reference (interpret)."""
import numpy as np
import pytest

import jax.numpy as jnp

from stitchingvideo_tpu.ops.pallas.composite_mat import frames_to_planar_i8
from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
    build_mat2_lut, composite_mat2_planar)
from stitchingvideo_tpu.video.lut import composite_frame_u8

from tests.test_pallas_composite import _make_state


def test_composite_mat2_matches_gather(rng):
    frames, lut = _make_state(rng)
    ref = np.asarray(composite_frame_u8(frames, lut)).astype(np.int32)
    ml = build_mat2_lut(lut, (128, 512))
    assert int(ml.n_fallback) == 0
    assert ml.tg_easy + ml.tg_hard == -(-ml.n_tiles // 8)
    out = composite_mat2_planar(frames_to_planar_i8(frames), ml, interpret=True)
    hwc = np.asarray(out).transpose(1, 2, 0).astype(np.int32)
    diff = np.abs(hwc - ref)
    assert np.median(diff) <= 1
    assert diff.mean() < 1.2, diff.mean()
    assert (diff <= 4).mean() > 0.999


def test_mat2_classes_nontrivial(rng):
    """The tilted test map should produce a mix of easy and hard groups (or
    at least classify without error)."""
    frames, lut = _make_state(rng, rot=0.4)
    ml = build_mat2_lut(lut, (128, 512))
    assert ml.tg_easy >= 0 and ml.tg_hard >= 0
    out = composite_mat2_planar(frames_to_planar_i8(frames), ml, interpret=True)
    assert out.shape[0] == 3
