"""Multiband video hot path: registration-cached state vs the full blend."""
import dataclasses

import numpy as np
import pytest


def test_pyramid_planar_matches_hwc():
    """The planar shifted-add pyramids equal the HWC depthwise-conv ones."""
    import jax.numpy as jnp
    from stitchingvideo_tpu.ops import pyramid as pyr
    from stitchingvideo_tpu.ops import pyramid_planar as ppyr
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)
    xp = jnp.asarray(x.transpose(2, 0, 1))
    np.testing.assert_allclose(
        np.asarray(ppyr.pyr_down_p(xp)).transpose(1, 2, 0),
        np.asarray(pyr.pyr_down(jnp.asarray(x))), atol=1e-3)
    small = x[::2, ::2]
    np.testing.assert_allclose(
        np.asarray(ppyr.pyr_up_p(jnp.asarray(small.transpose(2, 0, 1))))
        .transpose(1, 2, 0),
        np.asarray(pyr.pyr_up(jnp.asarray(small))), atol=1e-3)


@pytest.fixture(scope="module")
def scene_mb():
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
        video=dataclasses.replace(cfg.video, compose_mode="multiband",
                                  reregister_seconds=3600.0))
    vs = VideoStitcher(cfg)
    vs.register(list(views))
    return vs, views


@pytest.mark.slow
def test_multiband_video_hot_path(scene_mb):
    """The cached-state multiband frame path matches the full XLA multiband
    blend (same normalized-convolution formulation; warps differ only by the
    Pallas kernel's u8 rounding)."""
    vs, views = scene_mb
    assert vs._mbtlut is not None
    pano_hot = vs.composite(list(views))
    pano_full = vs._composite_blend(list(views), "multiband")
    assert pano_hot.shape == pano_full.shape
    cov = (pano_full.sum(-1) > 0) & (pano_hot.sum(-1) > 0)
    d = np.abs(pano_hot.astype(np.int16) - pano_full.astype(np.int16))[cov]
    assert np.median(d) <= 1
    assert (d <= 6).mean() > 0.99, (np.median(d), (d <= 6).mean(), d.max())


@pytest.mark.slow
def test_multiband_video_rereg_keeps_working(scene_mb):
    """Re-registration rebuilds the cached state and the path stays live."""
    vs, views = scene_mb
    vs.register(list(views), seed=1)
    assert vs._mbtlut is not None
    pano = vs.composite(list(views))
    assert pano.dtype == np.uint8 and (pano.sum(-1) > 0).mean() > 0.3


def test_column_pieces_multi_gap():
    """A footprint the seams carve into k clusters yields k spans — an
    earlier version collapsed >=2 wide gaps into ONE span, inflating the
    shared window width toward the full canvas."""
    from stitchingvideo_tpu.blend.multiband_video import (SPLIT_GAP,
                                                          _column_pieces)
    W = 4000
    m = np.zeros((4, W), bool)
    m[:, 0:100] = True
    m[:, 1500:1650] = True
    m[:, 3200:3300] = True          # three clusters, gaps > SPLIT_GAP
    assert SPLIT_GAP < 1400
    assert _column_pieces(m) == [(0, 100), (1500, 1650), (3200, 3300)]
    # narrow gaps still merge
    m2 = np.zeros((4, W), bool)
    m2[:, 0:100] = True
    m2[:, 150:300] = True
    assert _column_pieces(m2) == [(0, 300)]
    assert _column_pieces(np.zeros((4, W), bool)) == []


def test_pyramid_matmul_matches_shifted_add():
    """The MXU banded-matrix pyramids equal the shifted-add formulation
    (f32: exact up to summation order)."""
    import jax.numpy as jnp
    from stitchingvideo_tpu.ops import pyramid_planar as ppyr
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (3, 96, 160)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ppyr.pyr_down_p(x)),
                               np.asarray(ppyr.pyr_down_sa(x)), atol=2e-3)
    s = jnp.asarray(rng.uniform(0, 255, (3, 48, 80)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ppyr.pyr_up_p(s)),
                               np.asarray(ppyr.pyr_up_sa(s)), atol=2e-3)


def test_pieces_batched_matches_single():
    """The micro-batched window warp is bit-identical per frame to the
    single-frame pieces kernel: the batched kernel quantizes (round-half-
    even + clamp) BEFORE its bf16 block write, and 0..255 integers are
    exact in bf16."""
    import dataclasses
    import jax.numpy as jnp
    from stitchingvideo_tpu.config import StitchConfig
    from stitchingvideo_tpu.ops.pallas.composite_mat import \
        frames_to_planar_i8
    from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
        composite_mat2_planar_pieces, composite_mat2_planar_pieces_batched)
    from stitchingvideo_tpu.utils import synthetic
    from stitchingvideo_tpu.video.runtime import VideoStitcher

    views, *_ = synthetic.make_scene(n=3, img_wh=(512, 288), fov_deg=55,
                                     overlap_frac=0.4, seed=7)
    cfg = StitchConfig()
    cfg = cfg.replace(
        compose=dataclasses.replace(cfg.compose, warp_type="cylindrical",
                                    blend_type="no", seam_find="voronoi",
                                    expos_comp="no"),
        video=dataclasses.replace(cfg.video, compose_mode="multiband"))
    vs = VideoStitcher(cfg)
    vs.register(list(views))
    assert vs._mbtlut is not None
    st, _ = vs._mbtlut
    Nv = len(st.piece_cam)
    rng = np.random.default_rng(2)
    B = 3
    pb = frames_to_planar_i8(jnp.asarray(np.stack(
        [np.stack(views)] * B) + rng.integers(0, 3, (B, 1, 1, 1, 1),
                                              np.uint8)).reshape(
        B * len(views), *views[0].shape)).reshape(
        B, len(views), 3, *views[0].shape[:2])
    got = np.asarray(composite_mat2_planar_pieces_batched(
        pb, st.warp_lut, Nv, interpret=True).astype(jnp.float32))
    for b in range(B):
        ref = np.asarray(composite_mat2_planar_pieces(
            pb[b], st.warp_lut, Nv, interpret=True).astype(jnp.float32))
        d = np.abs(got[b] - ref)
        assert d.max() == 0.0, (b, float(d.max()))
