"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stitchingvideo_tpu.parallel.mesh import make_mesh
from stitchingvideo_tpu.parallel.compose import (
    gain_stats_sharded, shard_lut, sharded_composite_fn)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(canvas=8, camera=1)


def _state(pw=512):
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _tiny_lut_and_frames
    return _tiny_lut_and_frames(n_cams=4, ph=96, pw=pw)


def test_sharded_composite_matches_single(mesh8):
    from stitchingvideo_tpu.video.lut import composite_frame_u8
    frames, lut = _state()
    ref = np.asarray(composite_frame_u8(frames, lut))
    lut_sh = shard_lut(lut, mesh8)
    fn = sharded_composite_fn(mesh8)
    out = np.asarray(fn(frames, lut_sh))
    np.testing.assert_array_equal(out, ref)


def test_sharded_composite_layout(mesh8):
    frames, lut = _state()
    lut_sh = shard_lut(lut, mesh8)
    fn = sharded_composite_fn(mesh8)
    out = fn(frames, lut_sh)
    # output is column-sharded across the 8 canvas shards
    assert len(out.sharding.device_set) == 8


def test_gain_stats_sharded_matches_dense(mesh8):
    rng = np.random.default_rng(0)
    n, Ppix = 4, 1024
    lum = rng.uniform(0, 255, (n, Ppix)).astype(np.float32)
    mask = (rng.uniform(size=(n, Ppix)) > 0.4).astype(np.float32)
    Nmat, Imat = gain_stats_sharded(mesh8, jnp.asarray(lum), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(Nmat), mask @ mask.T, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(Imat), (lum * mask) @ mask.T, rtol=1e-4)


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip, entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (96, 256, 3)
    if len(jax.devices()) >= 8:
        dryrun_multichip(8)


def test_sharded_mat_composite_matches_single(mesh8, rng):
    """The materialized kernel sharded over canvas row-bands == single-device."""
    from stitchingvideo_tpu.ops.pallas.composite_mat import (
        build_mat_lut, composite_mat_planar, frames_to_planar_i8)
    from stitchingvideo_tpu.parallel.compose_mat import (
        shard_mat_lut, sharded_composite_mat_fn)
    from tests.test_pallas_composite import _make_state

    frames, lut = _make_state(rng)
    mlut = build_mat_lut(lut, (128, 512))
    assert mlut.vx.shape[0] % 8 == 0  # Tg divisible by 8 devices
    planar = frames_to_planar_i8(frames)
    ref = np.asarray(composite_mat_planar(planar, mlut, interpret=True))

    sharded = shard_mat_lut(mlut, mesh8)
    fn = sharded_composite_mat_fn(mesh8, mlut, interpret=True)
    out = fn(planar, sharded)
    got = np.asarray(out)[:, :ref.shape[1], :ref.shape[2]]
    np.testing.assert_array_equal(got, ref)
    assert len(out.sharding.device_set) == 8


def test_multihost_ingest_assembly(mesh8):
    """global_camera_batch shards per-process captures over the camera axis;
    single-process degenerates to a plain shard (exercised end to end), and
    local_camera_slice covers exactly the whole range across processes."""
    from stitchingvideo_tpu.parallel.ingest import (global_camera_batch,
                                                    local_camera_slice)
    cam_mesh = make_mesh(canvas=1, camera=8)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 32, 48, 3), np.uint8)
    sl = local_camera_slice(cam_mesh, 8)
    assert (sl.start, sl.stop) == (0, 8)   # single process owns everything
    garr = global_camera_batch(cam_mesh, frames[sl])
    assert garr.shape == (8, 32, 48, 3)
    assert len(garr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(garr), frames)
    # camera-parallel consumer: per-camera mean without manual comms
    means = jax.jit(lambda f: f.astype(jnp.float32).mean(axis=(1, 2, 3)))(garr)
    np.testing.assert_allclose(np.asarray(means),
                               frames.astype(np.float32).mean(axis=(1, 2, 3)),
                               rtol=1e-6)


def test_videostitcher_multichip_product_path(rng):
    """The PRODUCT multi-chip mode (VERDICT item 4): VideoStitcher with
    cfg.parallel.canvas_shards=8 builds the mesh, row-band-shards the
    materialized kernel, and composites identically to single-device —
    through the same composite() a user calls."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import dataclasses
    from stitchingvideo_tpu.config import StitchConfig
    from stitchingvideo_tpu.video.runtime import VideoStitcher
    from tests.test_pallas_composite import _make_state

    frames, lut = _make_state(rng)
    frames_np = np.asarray(frames)
    fh, fw = frames_np.shape[1:3]

    cfg = StitchConfig()
    cfg_sh = cfg.replace(parallel=dataclasses.replace(
        cfg.parallel, canvas_shards=8))
    vs = VideoStitcher(cfg_sh)
    assert vs._mesh is not None
    vs.install_lut(jax.device_put(lut), (fh, fw))
    assert vs._tlut is not None and vs._tlut[0] == "mat_sharded", \
        (vs._tlut[0] if vs._tlut else None)
    pano_sh = vs.composite(list(frames_np))

    vs1 = VideoStitcher(cfg)   # single-device reference
    vs1.install_lut(jax.device_put(lut), (fh, fw))
    pano_1 = vs1.composite(list(frames_np))
    assert pano_sh.shape == pano_1.shape
    # both are quantized Pallas paths (mat vs mat2 share weight quantization)
    d = np.abs(pano_sh.astype(np.int16) - pano_1.astype(np.int16))
    assert np.median(d) == 0 and (d <= 2).mean() > 0.999, \
        (np.median(d), float((d <= 2).mean()))
