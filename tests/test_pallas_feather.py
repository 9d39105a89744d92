"""Feather hot-loop kernel: dual-slot blend vs exact gather, fallback tiles,
and the registration-driven video mode vs the full XLA feather blend."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stitchingvideo_tpu.ops.pallas.composite_feather import (
    BlendLUT, build_feather_mat, composite_blend_gather,
    composite_feather_planar)
from stitchingvideo_tpu.ops.pallas.composite_mat import frames_to_planar_i8


def _synthetic_blend_lut(rng, N=3, fh=128, fw=512, Hp=64, Wp=768,
                         triple_cols=()):
    """Side-by-side cameras with ramped overlap bands; optionally force some
    columns to reference a third camera (fallback-tile trigger)."""
    frames = rng.integers(0, 255, (N, fh, fw, 3), np.uint8)
    xx, yy = np.meshgrid(np.arange(Wp, dtype=np.float32),
                         np.arange(Hp, dtype=np.float32))
    seg = Wp // N
    camA = np.clip((xx / seg).astype(np.int32), 0, N - 1)
    bpos = (xx - camA * seg) / seg
    ov = 0.25
    wA = np.ones((Hp, Wp), np.float32)
    camB = np.full((Hp, Wp), -1, np.int32)
    wB = np.zeros((Hp, Wp), np.float32)
    right = (bpos > 1 - ov) & (camA < N - 1)
    wA[right] = ((1 - bpos[right]) / ov) * 0.5 + 0.5
    camB[right] = camA[right] + 1
    wB[right] = 1 - wA[right]
    for c in triple_cols:
        camB[:, c] = (camA[:, c] + 2) % N   # third camera in this tile
        wB[:, c] = 0.3
        wA[:, c] = 0.7
    sxA = 8 + (xx - camA * seg) * (fw - 16) / seg * 0.6
    syA = 8 + yy * (fh - 16) / Hp * 0.8
    sxB = np.where(camB >= 0, 10 + (xx % seg) * 0.1, 0.0).astype(np.float32)
    gA = (1.0 + 0.1 * np.sin(xx / 31)).astype(np.float32)
    blut = BlendLUT(
        cam_a=jnp.asarray(camA),
        sx_a=jnp.asarray(sxA.astype(np.float32)),
        sy_a=jnp.asarray(syA.astype(np.float32)),
        gw_a=jnp.asarray((wA * gA).astype(np.float32)),
        cam_b=jnp.asarray(camB),
        sx_b=jnp.asarray(sxB),
        sy_b=jnp.asarray(syA.astype(np.float32)),
        gw_b=jnp.asarray((wB * gA).astype(np.float32)))
    return frames, blut


@pytest.mark.slow
def test_feather_kernel_matches_gather(rng):
    frames, blut = _synthetic_blend_lut(rng)
    ml = build_feather_mat(blut, (128, 512))
    assert int(ml.n_fallback) == 0
    ref = np.asarray(composite_blend_gather(jnp.asarray(frames), blut))
    ref_u8 = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    out = np.asarray(composite_feather_planar(
        frames_to_planar_i8(jnp.asarray(frames)), ml, interpret=True))
    d = np.abs(out.transpose(1, 2, 0).astype(np.int16)
               - ref_u8.astype(np.int16))
    # int8 weight quantization: <= ~1 gray level per axis
    assert np.median(d) == 0 and d.max() <= 3, (np.median(d), d.max())


@pytest.mark.slow
def test_feather_fallback_tiles_exact(rng):
    """Tiles referencing 3 distinct cameras get the exact dual-gather overlay
    — no whole-LUT demotion, and those tiles are bit-exact vs the oracle."""
    frames, blut = _synthetic_blend_lut(rng, triple_cols=(130, 131, 700))
    ml = build_feather_mat(blut, (128, 512))
    assert int(ml.n_fallback) > 0
    ref = np.asarray(composite_blend_gather(jnp.asarray(frames), blut))
    ref_u8 = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    out = np.asarray(composite_feather_planar(
        frames_to_planar_i8(jnp.asarray(frames)), ml,
        interpret=True)).transpose(1, 2, 0)
    # fallback columns are full-precision gathers (<=1 ulp-at-rounding vs the
    # oracle's different f32 summation order — NOT the +-2 of weight
    # quantization)
    for c in (130, 131, 700):
        dc = np.abs(out[:, c].astype(np.int16) - ref_u8[:, c].astype(np.int16))
        assert dc.max() <= 1, dc.max()
    d = np.abs(out.astype(np.int16) - ref_u8.astype(np.int16))
    assert d.max() <= 3


@pytest.mark.slow
def test_video_feather_hot_loop(scene_feather):
    """Registration-driven: the feather Pallas path matches the full XLA
    feather blend (same weights, all-camera normalization) closely."""
    vs, views = scene_feather
    assert vs._ftlut is not None and vs._ftlut[0] == "fmat", \
        (vs._ftlut[0] if vs._ftlut else None)
    pano_hot = vs.composite(list(views))
    # _composite_blend applies the same crop + frozen-shape contract as
    # the hot path (a fallback transition must not change the frame size)
    pano_full = vs._composite_blend(list(views), "feather")
    assert pano_hot.shape == pano_full.shape
    cov = (pano_full.sum(-1) > 0) & (pano_hot.sum(-1) > 0)
    d = np.abs(pano_hot.astype(np.int16) - pano_full.astype(np.int16))
    d = d[cov]
    # top-2 truncation + weight quantization: tiny differences, no structure
    assert np.median(d) <= 1
    assert (d <= 4).mean() > 0.99, (np.median(d), (d <= 4).mean(), d.max())


@pytest.mark.slow
def test_feather_microbatch(scene_feather):
    """Serving shape: B frame-sets per device execution through the feather
    kernel — identical to the single-frame path."""
    vs, views = scene_feather
    batch = jnp.asarray(np.stack(views))
    planar = frames_to_planar_i8(batch)
    out = vs.composite_microbatch(jnp.stack([planar, planar]))
    single = vs.composite_feather_planar(batch)
    assert out.shape == (2,) + single.shape
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(single))


@pytest.fixture(scope="module")
def scene_feather():
    from stitchingvideo_tpu.config import StitchConfig
    from stitchingvideo_tpu.utils import synthetic
    from stitchingvideo_tpu.video.runtime import VideoStitcher
    views, *_ = synthetic.make_scene(n=3, img_wh=(512, 288), fov_deg=55,
                                     overlap_frac=0.4, seed=7)
    cfg = StitchConfig()
    cfg = cfg.replace(
        compose=dataclasses.replace(cfg.compose, warp_type="cylindrical",
                                    blend_type="no", seam_find="voronoi",
                                    expos_comp="gain"),
        video=dataclasses.replace(cfg.video, compose_mode="feather",
                                  reregister_seconds=3600.0))
    vs = VideoStitcher(cfg)
    vs.register(list(views))
    return vs, views
