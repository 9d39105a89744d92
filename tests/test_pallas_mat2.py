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
    from stitchingvideo_tpu.ops.pallas.composite_mat2 import GROUP as G2
    assert ml.tg_easy + ml.tg_hard == -(-ml.n_tiles // G2)
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


def test_mat2_per_tile_fallback(rng):
    """A LUT with 3-camera tiles keeps the mat2 fast path: fallback tiles are
    composited by the exact gather and overlaid — BIT-EXACT vs the gather
    reference on those tiles, no whole-LUT demotion (VERDICT r1 item 3)."""
    frames, lut = _make_state(rng)
    cam = np.array(lut.cam_idx)
    # poison a few tiles so they span 3 cameras (not representable by the
    # two-slot kernel): the 8x128 tile keeps its own cam plus two others
    cam[4:6, 200:210] = 1
    cam[4:6, 210:220] = 2      # tile (0,1): cams {0,1,2}
    cam[40:44, 980:990] = 0
    cam[40:44, 990:1000] = 1   # tile (5,7): cams {0,1,2}
    import jax.numpy as _jnp
    from stitchingvideo_tpu.video.lut import CompositeLUT
    lut = CompositeLUT(cam_idx=_jnp.asarray(cam), src_x=lut.src_x,
                       src_y=lut.src_y, gain=lut.gain)

    ref = np.asarray(composite_frame_u8(frames, lut)).astype(np.int32)
    ml = build_mat2_lut(lut, (128, 512))
    assert int(ml.n_fallback) > 0
    assert ml.n_fb >= int(ml.n_fallback)
    out = composite_mat2_planar(frames_to_planar_i8(frames), ml,
                                interpret=True)
    hwc = np.asarray(out).transpose(1, 2, 0).astype(np.int32)

    # fallback tiles: bit-exact vs the gather reference
    from stitchingvideo_tpu.ops.pallas.composite import TILE_H, TILE_W
    fb_tid = np.asarray(ml.fb_tid)[np.asarray(ml.fb_valid)]
    ntx = ml.grid_hw[1]
    for t in fb_tid:
        ty, tx = divmod(int(t), ntx)
        ys = slice(ty * TILE_H, min((ty + 1) * TILE_H, ref.shape[0]))
        xs = slice(tx * TILE_W, min((tx + 1) * TILE_W, ref.shape[1]))
        np.testing.assert_array_equal(hwc[ys, xs], ref[ys, xs])
    # non-fallback tiles keep the usual quantization tolerance
    diff = np.abs(hwc - ref)
    assert np.median(diff) <= 1
    assert (diff <= 4).mean() > 0.999


def test_mat2_used_compaction_pieces(rng):
    """materialize2_used + composite_mat2_planar_pieces: sparse per-piece
    coverage (the multiband window layout) drops fully-uncovered groups from
    the launch grid, matches the gather reference on covered pixels, and
    writes exact 0 on uncovered ones."""
    from stitchingvideo_tpu.ops.pallas.composite import (build_tiled_lut,
                                                         concat_tiled_luts)
    from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
        GROUP, composite_mat2_planar_pieces, materialize2_used)
    from stitchingvideo_tpu.video.lut import CompositeLUT

    frames, lut = _make_state(rng)
    cam = np.array(lut.cam_idx)
    luts, cams, masks = [], [], []
    # masks stay inside one camera's column span (the source-coord map jumps
    # at camera boundaries, which would overflow the 256-wide hat band)
    for p, keep in enumerate([(slice(0, 16), slice(0, 256)),
                              (slice(40, 56), slice(512, 640))]):
        m = np.zeros_like(cam, bool)
        m[keep] = True
        m &= cam >= 0
        plut = CompositeLUT(
            cam_idx=jnp.asarray(np.where(m, 0, -1).astype(np.int32)),
            src_x=lut.src_x, src_y=lut.src_y, gain=lut.gain)
        tl = build_tiled_lut(plut, (128, 512))
        assert int(tl.n_fallback) == 0
        luts.append(tl)
        cams.append(int(cam[m][0]) if m.any() else 0)
        masks.append(m)
    ml = materialize2_used(concat_tiled_luts(luts, cams), bucket=8)
    Tg_all = -(-ml.n_tiles // GROUP)
    assert ml.scratch_slot
    assert ml.tg_easy + ml.tg_hard < Tg_all   # compaction really dropped work

    out = composite_mat2_planar_pieces(frames_to_planar_i8(frames), ml, 2,
                                       interpret=True)
    out = np.asarray(out).astype(np.int32)          # [2, 3, Hb, Wb]
    assert out.shape[0] == 2 and out.shape[1] == 3
    for p, (m, c) in enumerate(zip(masks, cams)):
        plut = CompositeLUT(
            cam_idx=jnp.asarray(np.where(m, c, -1).astype(np.int32)),
            src_x=lut.src_x, src_y=lut.src_y, gain=lut.gain)
        ref = np.asarray(composite_frame_u8(frames, plut)).astype(np.int32)
        got = out[p].transpose(1, 2, 0)[:ref.shape[0], :ref.shape[1]]
        diff = np.abs(got - ref)[m[:, :, None].repeat(3, 2)]
        assert np.median(diff) <= 1
        assert (diff <= 4).mean() > 0.999, (p, (diff > 4).mean())
        assert (got[~m] == 0).all()                  # uncovered exact zero


def test_mat2_batched_matches_per_frame(rng):
    """composite_mat2_planar_batched == per-frame composite_mat2_planar,
    bit for bit, on distinct frames per batch slot (incl. fallback tiles) —
    the serving micro-batch path that amortizes the VMEM weight load."""
    from stitchingvideo_tpu.ops.pallas.composite_mat2 import \
        composite_mat2_planar_batched
    from stitchingvideo_tpu.video.lut import CompositeLUT

    frames, lut = _make_state(rng)
    cam = np.array(lut.cam_idx)
    cam[4:6, 200:210] = 1
    cam[4:6, 210:220] = 2      # a 3-camera tile -> fallback overlay live
    lut = CompositeLUT(cam_idx=jnp.asarray(cam), src_x=lut.src_x,
                       src_y=lut.src_y, gain=lut.gain)
    ml = build_mat2_lut(lut, (128, 512))
    assert int(ml.n_fallback) > 0

    B = 3
    batch = np.stack([np.asarray(frames), np.asarray(frames)[:, ::-1],
                      np.roll(np.asarray(frames), 7, axis=2)])
    planar_b = jnp.stack([frames_to_planar_i8(jnp.asarray(b)) for b in batch])
    refs = [np.asarray(composite_mat2_planar(planar_b[b], ml,
                                             interpret=True))
            for b in range(B)]
    # both DMA layouts: fused (one [B,3,wh,VXW] copy per tile slot) and
    # per-frame — the kernel math is shared, the window plumbing is not
    for fused in (True, False):
        got = np.asarray(composite_mat2_planar_batched(
            planar_b, ml, interpret=True, fused_dma=fused))
        assert got.shape[0] == B
        for b in range(B):
            np.testing.assert_array_equal(got[b], refs[b], err_msg=str(fused))
