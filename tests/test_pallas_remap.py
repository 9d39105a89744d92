"""ops/pallas/remap.py wrapper: single-image MXU remap vs reference remap."""
import numpy as np
import pytest

import jax.numpy as jnp

from stitchingvideo_tpu.ops.pallas.remap import remap_tiled
from stitchingvideo_tpu.ops.remap import remap


def test_remap_tiled_matches_reference(rng):
    img = rng.integers(0, 255, (128, 512, 3), np.uint8)
    yy, xx = np.mgrid[0:96, 0:384].astype(np.float32)
    xm = xx * 1.1 + 4.5
    ym = yy * 1.05 + 2.2
    out = remap_tiled(jnp.asarray(img), jnp.asarray(xm), jnp.asarray(ym),
                      interpret=True)
    assert out is not None
    ref = np.asarray(remap(jnp.asarray(img), jnp.asarray(xm), jnp.asarray(ym)))
    ref = np.clip(np.round(ref), 0, 255).astype(np.int32)
    hwc = np.asarray(out)[0] if out.ndim == 4 else np.asarray(out)
    # output of composite path is planar [3,H,W]
    if hwc.shape[0] == 3:
        hwc = hwc.transpose(1, 2, 0)
    d = np.abs(hwc.astype(np.int32) - ref)
    assert d.max() <= 2 and d.mean() < 1.0


def test_remap_tiled_declines_small_frames(rng):
    img = rng.integers(0, 255, (32, 64, 3), np.uint8)
    xm = np.zeros((16, 16), np.float32)
    ym = np.zeros((16, 16), np.float32)
    assert remap_tiled(jnp.asarray(img), jnp.asarray(xm), jnp.asarray(ym),
                       interpret=True) is None


def test_dp_seams_partition(rng):
    from stitchingvideo_tpu.seams.dp import dp_seams
    H, W = 48, 80
    base = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    img1 = np.zeros((H, W, 3), np.float32)
    img2 = np.zeros((H, W, 3), np.float32)
    img1[:, :55] = base[:, :55]
    img2[:, 25:] = base[:, 25:]
    masks = np.zeros((2, H, W), bool)
    masks[0, :, :55] = True
    masks[1, :, 25:] = True
    out = dp_seams(np.stack([img1, img2]), masks, "color")
    assert not (out[0] & out[1]).any()
    assert ((out[0] | out[1]) == (masks[0] | masks[1])).all()
