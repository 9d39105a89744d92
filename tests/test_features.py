"""Feature detection / description / matching / RANSAC tests.

Strategy (SURVEY §4): synthetic scenes with known ground truth — a textured
image and a known homography/shift — rather than OpenCV descriptor parity
(our rBRIEF pattern is deliberately our own; only self-consistency matters).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stitchingvideo_tpu.ops import features as F
from stitchingvideo_tpu.ops.matching import match_pair
from stitchingvideo_tpu.ops.ransac import ransac_homography
from stitchingvideo_tpu.ops.homography import dlt_homography, transfer_error2


def _textured(rng, h=240, w=320):
    """Random blobs: corner-rich synthetic texture."""
    img = np.zeros((h, w), np.float32)
    for _ in range(150):
        y, x = rng.integers(20, h - 20), rng.integers(20, w - 20)
        s = rng.integers(3, 12)
        img[y:y + s, x:x + s] += rng.uniform(40, 200)
    return np.clip(img, 0, 255)


def test_detect_finds_corners(rng):
    img = _textured(rng)
    xy, resp, valid = F.detect(jnp.asarray(img), threshold=15.0, max_kp=512)
    n = int(np.asarray(valid).sum())
    assert n > 50, n
    # all detected keypoints respect the border
    xy = np.asarray(xy)[np.asarray(valid)]
    assert xy[:, 0].min() >= 24 and xy[:, 0].max() < 320 - 24
    assert xy[:, 1].min() >= 24 and xy[:, 1].max() < 240 - 24


def test_descriptor_shift_invariance(rng):
    """Same content shifted by 8 px -> descriptors at shifted keypoints match."""
    img = _textured(rng)
    sh = np.roll(img, (0, 8), axis=(0, 1))
    f1 = F.detect_and_describe(jnp.asarray(img), threshold=15.0, max_kp=256)
    f2 = F.detect_and_describe(jnp.asarray(sh), threshold=15.0, max_kp=256)
    src, dst, dist, valid = match_pair(f1["desc"], f1["valid"], f2["desc"], f2["valid"])
    src, dst = np.asarray(src), np.asarray(dst)
    valid = np.asarray(valid)
    assert valid.sum() > 30
    xy1 = np.asarray(f1["xy"])[src[valid]]
    xy2 = np.asarray(f2["xy"])[dst[valid]]
    dx = xy2[:, 0] - xy1[:, 0]
    dy = xy2[:, 1] - xy1[:, 1]
    # majority of matches should agree with the true (8, 0) shift
    good = (np.abs(dx - 8) < 2) & (np.abs(dy) < 2)
    assert good.mean() > 0.6, good.mean()


def test_dlt_exact():
    rng = np.random.default_rng(3)
    H_true = np.array([[1.1, 0.05, 10], [-0.03, 0.95, -6], [1e-4, -5e-5, 1]], np.float32)
    p1 = rng.uniform(-100, 100, (20, 2)).astype(np.float32)
    hp = (np.c_[p1, np.ones(20)] @ H_true.T)
    p2 = (hp[:, :2] / hp[:, 2:3]).astype(np.float32)
    H = np.asarray(dlt_homography(jnp.asarray(p1), jnp.asarray(p2), jnp.ones(20)))
    np.testing.assert_allclose(H / H[2, 2], H_true / H_true[2, 2], atol=2e-3)


def test_ransac_recovers_h_with_outliers():
    rng = np.random.default_rng(4)
    H_true = np.array([[1.05, 0.02, 5], [0.01, 0.98, -3], [5e-5, 1e-5, 1]], np.float32)
    M = 200
    p1 = rng.uniform(-150, 150, (M, 2)).astype(np.float32)
    hp = np.c_[p1, np.ones(M)] @ H_true.T
    p2 = (hp[:, :2] / hp[:, 2:3]).astype(np.float32)
    p2 += rng.normal(0, 0.3, p2.shape).astype(np.float32)
    n_out = 80
    p2[:n_out] = rng.uniform(-150, 150, (n_out, 2))  # outliers
    valid = np.ones(M, bool)
    valid[-10:] = False  # padding slots
    out = ransac_homography(jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2),
                            jnp.asarray(valid), thresh=3.0, iters=256)
    assert bool(out["ok"])
    ni = int(out["num_inliers"])
    assert ni > 95, ni  # ~110 true inliers available
    err2 = np.asarray(transfer_error2(out["H"], jnp.asarray(p1), jnp.asarray(p2)))
    inl = np.asarray(out["inliers"])
    assert np.all(err2[inl] < 9.0)
    # no padding slot marked inlier
    assert not inl[-10:].any()


def test_ransac_degenerate_pair():
    """Too few valid matches -> ok=False, H=I."""
    p = jnp.zeros((32, 2))
    valid = jnp.zeros((32,), bool)
    out = ransac_homography(jax.random.PRNGKey(1), p, p, valid)
    assert not bool(out["ok"])
    assert int(out["num_inliers"]) == 0


@pytest.mark.slow
def test_pyramid_features_scale_tolerance(rng):
    """Keypoints from a 1.4x-scaled copy still match via pyramid levels."""
    img = _textured(rng, 288, 384)
    import jax
    big = np.asarray(jax.image.resize(jnp.asarray(img, jnp.float32),
                                      (403, 537), method="linear"))
    f1 = F.detect_and_describe_pyramid(jnp.asarray(img), 15.0, 512, levels=3)
    f2 = F.detect_and_describe_pyramid(jnp.asarray(big), 15.0, 512, levels=3)
    src, dst, dist, valid = match_pair(f1["desc"], f1["valid"], f2["desc"], f2["valid"])
    valid = np.asarray(valid)
    assert valid.sum() > 15, valid.sum()
    xy1 = np.asarray(f1["xy"])[np.asarray(src)[valid]]
    xy2 = np.asarray(f2["xy"])[np.asarray(dst)[valid]]
    ratio = xy2 / np.maximum(xy1, 1e-6)
    good = np.abs(ratio - 1.4) < 0.12
    assert (good.all(axis=1)).mean() > 0.4


def test_harris_brief_detector(rng):
    """The 'harris_brief' feature kind detects and matches."""
    img = _textured(rng)
    sh = np.roll(img, (0, 8), axis=(0, 1))
    f1 = F.detect_and_describe(jnp.asarray(img), 1.0, 256, detector="harris")
    f2 = F.detect_and_describe(jnp.asarray(sh), 1.0, 256, detector="harris")
    assert int(np.asarray(f1["valid"]).sum()) > 50
    src, dst, dist, valid = match_pair(f1["desc"], f1["valid"], f2["desc"], f2["valid"])
    valid = np.asarray(valid)
    assert valid.sum() > 30
    xy1 = np.asarray(f1["xy"])[np.asarray(src)[valid]]
    xy2 = np.asarray(f2["xy"])[np.asarray(dst)[valid]]
    good = (np.abs(xy2[:, 0] - xy1[:, 0] - 8) < 2) & (np.abs(xy2[:, 1] - xy1[:, 1]) < 2)
    assert good.mean() > 0.6


def test_shape_bucketing_one_trace_many_extents():
    """Work images bucket-pad to a shared shape and the true extent is a
    traced VALUE: rigs with nearby sizes share one compiled detector, and
    keypoints stay inside their own true extent minus the border."""
    import jax.numpy as jnp

    from stitchingvideo_tpu.register.pipeline import (_batched_detector,
                                                      _pad_to_bucket)
    rng = np.random.default_rng(0)
    run = _batched_detector(128, 8, (1, 1), "harris", "brief")
    n0 = run._cache_size() if hasattr(run, "_cache_size") else None
    outs = []
    for (h, w) in ((290, 390), (295, 413), (320, 416)):
        img = rng.uniform(0, 255, (2, h, w)).astype(np.float32)
        batch = jnp.asarray(np.stack([_pad_to_bucket(g) for g in img]))
        assert batch.shape[1:] == (320, 416), batch.shape
        f = run(batch, 1.0, jnp.asarray([h, w], jnp.int32))
        sm = np.asarray(f["small"])
        xy, valid = sm[..., 0:2], sm[..., 2] > 0.5
        assert valid.any()
        assert (xy[valid][:, 0] < w - 8).all(), "kp beyond true width"
        assert (xy[valid][:, 1] < h - 8).all(), "kp beyond true height"
        outs.append(valid.sum())
    if n0 is not None:
        assert run._cache_size() - n0 == 1, \
            "bucketed shapes must share ONE compiled detector"


def test_chunked_two_nn_matches_dense():
    """The streamed (O(K*chunk) memory) 2-NN is bit-identical to the dense
    [K1,K2] field for both metrics, ragged chunks and ties included — the
    TPU-native answer to the reference's FLANN scale path (matchers.cpp:
    147-202): exact chunked brute force, not approximate hashing."""
    from stitchingvideo_tpu.ops import matching as m
    rng = np.random.default_rng(5)
    for kind in ("binary", "float"):
        K1, K2 = 173, 259               # ragged vs chunk=64
        if kind == "binary":
            d1 = rng.integers(0, 2, (K1, 256)).astype(np.uint8)
            d2 = rng.integers(0, 2, (K2, 256)).astype(np.uint8)
            # force ties: duplicate descriptor rows
            d2[50] = d2[10]
        else:
            d1 = rng.normal(size=(K1, 64)).astype(np.float32)
            d2 = rng.normal(size=(K2, 64)).astype(np.float32)
            d2[40] = d2[7]
        v1 = rng.uniform(size=K1) > 0.1
        v2 = rng.uniform(size=K2) > 0.1
        import jax.numpy as jnp
        D = m._metric_block(jnp.asarray(d1), jnp.asarray(d2),
                            jnp.asarray(v1), jnp.asarray(v2))
        want = tuple(np.asarray(x) for x in m._two_nn(D))
        got = tuple(np.asarray(x) for x in m._two_nn_chunked(
            jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2),
            jnp.asarray(v2), chunk=64))
        np.testing.assert_array_equal(got[2], want[2])
        np.testing.assert_allclose(got[0], want[0], rtol=1e-6)
        np.testing.assert_allclose(got[1], want[1], rtol=1e-6)


def test_match_pair_large_k_bounded_memory():
    """K=8192 per image routes through the chunked path and matches the
    small-K semantics on an embedded identical subset."""
    import jax.numpy as jnp
    from stitchingvideo_tpu.ops import matching as m
    assert 8192 * 8192 > m.CHUNKED_ABOVE
    rng = np.random.default_rng(6)
    K = 8192
    d1 = rng.integers(0, 2, (K, 256)).astype(np.uint8)
    d2 = rng.integers(0, 2, (K, 256)).astype(np.uint8)
    # plant 40 near-identical pairs (flip 2 bits) — must be found
    for t in range(40):
        d2[200 + t] = d1[100 + t]
        d2[200 + t, t % 256] ^= 1
    v = np.ones(K, bool)
    src, dst, dist, keep = m.match_pair(
        jnp.asarray(d1), jnp.asarray(v), jnp.asarray(d2), jnp.asarray(v),
        match_conf=0.3, max_matches=256)
    src, dst, keep = np.asarray(src), np.asarray(dst), np.asarray(keep)
    planted = {(100 + t, 200 + t) for t in range(40)}
    found = set(zip(src[keep].tolist(), dst[keep].tolist()))
    assert len(planted & found) >= 38, len(planted & found)


def test_match_pair_enforces_keypoint_ceiling():
    """Beyond MAX_KEYPOINTS the exact brute-force envelope refuses loudly
    (clear error naming the knob) instead of degrading quietly — the
    documented boundary where an ANN prefilter, not exact 2-NN, would be
    the right tool (reference FLANN intent, matchers.cpp:147-202)."""
    import jax
    import jax.numpy as jnp
    import pytest
    from stitchingvideo_tpu.ops import matching as m
    K = m.MAX_KEYPOINTS + 1
    d = jax.ShapeDtypeStruct((K, 256), jnp.uint8)
    v = jax.ShapeDtypeStruct((K,), jnp.bool_)
    ok_d = jax.ShapeDtypeStruct((64, 256), jnp.uint8)
    ok_v = jax.ShapeDtypeStruct((64,), jnp.bool_)
    with pytest.raises(ValueError, match="MAX_KEYPOINTS"):
        jax.eval_shape(m.match_pair, d, v, ok_d, ok_v)
    with pytest.raises(ValueError, match="MAX_KEYPOINTS"):
        jax.eval_shape(m.match_pair, ok_d, ok_v, d, v)
    # at the ceiling itself it still traces
    d_at = jax.ShapeDtypeStruct((m.MAX_KEYPOINTS, 256), jnp.uint8)
    v_at = jax.ShapeDtypeStruct((m.MAX_KEYPOINTS,), jnp.bool_)
    jax.eval_shape(m.match_pair, d_at, v_at, ok_d, ok_v)
