"""Seam finders: distance transform golden, maxflow vs brute force, seam
properties (partition of overlap, cut quality)."""
import itertools

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from stitchingvideo_tpu.ops.distance import distance_transform_l1  # noqa: E402
from stitchingvideo_tpu.seams.voronoi import voronoi_seams  # noqa: E402


def test_distance_transform_matches_cv2(rng):
    mask = (rng.uniform(size=(40, 60)) > 0.2).astype(np.uint8)
    ref = cv2.distanceTransform(mask, cv2.DIST_L1, 3)
    ours = np.asarray(distance_transform_l1(jnp.asarray(mask.astype(bool))))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_voronoi_seams_partition():
    H, W = 60, 100
    masks = np.zeros((2, H, W), bool)
    masks[0, :, :70] = True
    masks[1, :, 30:] = True
    out = np.asarray(voronoi_seams(jnp.asarray(masks)))
    # overlap fully partitioned, nothing outside original masks
    assert not (out[0] & out[1]).any()
    assert ((out[0] | out[1]) == (masks[0] | masks[1])).all()
    # seam should sit near the middle of the overlap (x=50)
    cut_cols = np.where(out[0].sum(0) > 0)[0]
    assert abs(cut_cols.max() - 49) <= 1


def _brute_force_mincut(h, w, tsrc, tsnk, capr, capd):
    """Enumerate all 2^(h*w) labelings (tiny grids only)."""
    n = h * w
    best = np.inf
    best_lab = None
    for bits in itertools.product([0, 1], repeat=n):
        lab = np.array(bits).reshape(h, w)  # 1 = source side
        cost = tsrc[lab == 0].sum() + tsnk[lab == 1].sum()
        cost += (capr * (lab[:, :-1] != lab[:, 1:])).sum()
        cost += (capd * (lab[:-1] != lab[1:])).sum()
        if cost < best - 1e-9:
            best = cost
            best_lab = lab
    return best, best_lab


def test_maxflow_matches_bruteforce(rng):
    import ctypes
    from stitchingvideo_tpu.native import build as native_build
    lib = native_build.load()
    for trial in range(5):
        h, w = 3, 4
        tsrc = rng.uniform(0, 5, (h, w)).astype(np.float32)
        tsnk = rng.uniform(0, 5, (h, w)).astype(np.float32)
        capr = rng.uniform(0.1, 3, (h, w - 1)).astype(np.float32)
        capd = rng.uniform(0.1, 3, (h - 1, w)).astype(np.float32)
        labels = np.zeros(h * w, np.uint8)

        def p(a, t=ctypes.c_float):
            return np.ascontiguousarray(a.ravel()).ctypes.data_as(ctypes.POINTER(t))

        flow = lib.grid_maxflow(h, w, p(tsrc), p(tsnk), p(capr), p(capd),
                                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        best, _best_lab = _brute_force_mincut(h, w, tsrc, tsnk, capr, capd)
        assert flow == pytest.approx(best, rel=1e-5), (trial, flow, best)
        # check our labeling achieves the min cut value
        lab = labels.reshape(h, w)
        cost = tsrc[lab == 0].sum() + tsnk[lab == 1].sum()
        cost += (capr * (lab[:, :-1] != lab[:, 1:])).sum()
        cost += (capd * (lab[:-1] != lab[1:])).sum()
        assert cost == pytest.approx(best, rel=1e-5)


def test_graphcut_seams_partition_and_quality(rng):
    """Graph-cut seam on a two-view canvas: partition + avoids high-diff cut."""
    from stitchingvideo_tpu.seams.graphcut import graphcut_seams
    H, W = 48, 80
    base = rng.integers(0, 255, (H, W, 3)).astype(np.float32)
    base = cv2.GaussianBlur(base, (7, 7), 2.0)
    img1 = np.zeros((H, W, 3), np.float32)
    img2 = np.zeros((H, W, 3), np.float32)
    img1[:, :55] = base[:, :55]
    img2[:, 25:] = base[:, 25:]
    # make image2 differ strongly in a vertical stripe x in [30, 35): the seam
    # should avoid crossing content there... (diff high -> expensive cut)
    img2[:, 30:35] += 80
    masks = np.zeros((2, H, W), bool)
    masks[0, :, :55] = True
    masks[1, :, 25:] = True
    out = graphcut_seams(np.stack([img1, img2]), masks, "color")
    assert not (out[0] & out[1]).any()
    assert ((out[0] | out[1]) == (masks[0] | masks[1])).all()
    # seam must not pass through the high-difference stripe
    boundary_cols = set()
    for y in range(H):
        row = out[0][y]
        xs = np.where(row)[0]
        if len(xs):
            boundary_cols.add(xs.max())
    assert not any(30 <= c < 35 for c in boundary_cols), sorted(boundary_cols)


def test_graphcut_cost_parity_with_cv2(rng):
    """Our min-cut partition should cost no more than cv2's GraphCutSeamFinder
    partition under the same color-difference objective."""
    from stitchingvideo_tpu.seams.graphcut import graphcut_seams
    H, W = 64, 96
    base = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    base = cv2.GaussianBlur(base, (9, 9), 3.0)
    img1 = np.zeros((H, W, 3), np.float32)
    img2 = np.zeros((H, W, 3), np.float32)
    img1[:, :70] = base[:, :70]
    img2[:, 30:] = base[:, 30:] + rng.normal(0, 6, (H, W - 30, 3))
    masks = np.zeros((2, H, W), bool)
    masks[0, :, :70] = True
    masks[1, :, 30:] = True

    ours = graphcut_seams(np.stack([img1, img2]), masks, "color")

    m1 = (masks[0] * 255).astype(np.uint8)
    m2 = (masks[1] * 255).astype(np.uint8)
    gc = cv2.detail_GraphCutSeamFinder('COST_COLOR')
    out = gc.find([img1, img2], [(0, 0), (0, 0)], [m1, m2])
    cv2_masks = np.stack([np.asarray(cv2.UMat.get(u) if isinstance(u, cv2.UMat) else u) > 0
                          for u in out]) if out and out[0] is not None else None
    if cv2_masks is None or cv2_masks[0].shape != (H, W):
        pytest.skip("cv2 GraphCutSeamFinder returned no masks")

    diff = np.sqrt(((img1 - img2) ** 2).sum(-1))

    def cut_cost(seams):
        lab = seams[0] & masks[1]  # boundary inside overlap
        c = 0.0
        a = seams[0].astype(np.int8)
        c += (np.abs(np.diff(a, axis=1)) * (diff[:, :-1] + diff[:, 1:])).sum()
        c += (np.abs(np.diff(a, axis=0)) * (diff[:-1] + diff[1:])).sum()
        return c

    ours_cost = cut_cost(ours)
    cv2_cost = cut_cost(cv2_masks)
    assert ours_cost <= cv2_cost * 1.1 + 1e-3, (ours_cost, cv2_cost)


def test_graphcut_banded_matches_full(rng):
    """graphcut_seams_banded (fetches only overlap bands from device) must
    produce the same masks as the full-canvas host path."""
    import jax.numpy as jnp
    from stitchingvideo_tpu.seams.graphcut import (graphcut_seams,
                                                   graphcut_seams_banded)
    H, W, n = 72, 200, 3
    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (H, W, 3)).astype(np.float32), (9, 9), 3.0)
    imgs = np.zeros((n, H, W, 3), np.float32)
    masks = np.zeros((n, H, W), bool)
    spans = [(0, 90), (60, 150), (120, 200)]
    for i, (a, b) in enumerate(spans):
        imgs[i, :, a:b] = np.round(base[:, a:b])  # u8-grid values
        masks[i, :, a:b] = True
    ref = graphcut_seams(imgs, masks, "color")
    out = graphcut_seams_banded(jnp.asarray(imgs.astype(np.uint8)),
                                jnp.asarray(masks), "color")
    np.testing.assert_array_equal(out, ref)


def test_graphcut_banded_wrap_pair(rng):
    """A 360° wrap pair (overlap straddling the canvas x edges) must get a
    TIGHT circular band — not the full canvas width a plain bbox produces —
    and still partition the overlap. Round-4 warm-path fix: the full-width
    band was a ~24 MB relay fetch + an 11 s recompile per band-shape flip."""
    import jax.numpy as jnp
    from stitchingvideo_tpu.seams import graphcut as gc
    H, W, n = 64, 512, 2
    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (H, W, 3)).astype(np.float32), (9, 9), 3.0)
    imgs = np.zeros((n, H, W, 3), np.float32)
    masks = np.zeros((n, H, W), bool)
    # camera 0 owns the wrap region [480..512) + [0..64); camera 1 owns
    # [32..500): overlaps are [480..500) and [32..64) — both at the edges
    masks[0, :, 480:] = True
    masks[0, :, :64] = True
    masks[1, :, 32:500] = True
    for i in range(n):
        imgs[i][masks[i]] = np.round(base[masks[i]])
    sticky = {}
    out = np.asarray(gc.graphcut_seams_banded(
        jnp.asarray(imgs.astype(np.uint8)), jnp.asarray(masks), "color",
        sticky=sticky))
    # tight circular band: occupied arc is 480..64 (96 cols) + margins,
    # far below the 512 full width
    assert sticky["bw"] <= 256, sticky
    assert not (out[0] & out[1]).any()
    assert ((out[0] | out[1]) == (masks[0] | masks[1])).all()
    # both overlap strips must be split sanely: each camera keeps its
    # exclusive territory
    assert out[0][:, 0].any() or out[0][:, 511].any()
    assert out[1][:, 256].all()


def test_graphcut_banded_segments_distant_blobs(rng):
    """One pair overlapping in TWO blobs ~1500 px apart must produce two
    TIGHT band segments (not one giant arc): round-4 fix for the stray-blob
    band inflation seen on the reference rig's (3,4) pair."""
    import jax.numpy as jnp
    from stitchingvideo_tpu.seams import graphcut as gc
    H, W = 64, 2048
    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (H, W, 3)).astype(np.float32), (9, 9), 3.0)
    masks = np.zeros((2, H, W), bool)
    masks[0, :, 100:200] = True
    masks[0, :, 1700:1780] = True
    masks[1, :, 160:1750] = True       # overlaps: 160..200 and 1700..1750
    imgs = np.zeros((2, H, W, 3), np.float32)
    for i in range(2):
        imgs[i][masks[i]] = np.round(base[masks[i]])
    ref = gc.graphcut_seams(imgs, masks, "color")
    sticky = {}
    out = np.asarray(gc.graphcut_seams_banded(
        jnp.asarray(imgs.astype(np.uint8)), jnp.asarray(masks), "color",
        sticky=sticky))
    assert sticky["bw"] <= 128, sticky   # two tight segments, not one arc
    assert not (out[0] & out[1]).any()
    assert ((out[0] | out[1]) == (masks[0] | masks[1])).all()
    # the disjoint blobs decompose the BK graph: segment cuts match the
    # full-canvas host path exactly
    np.testing.assert_array_equal(out, ref)


def _dp_fixture(orient: str, seed: int = 0, H=120, W=160, ov=48):
    """Two structured views with an overlap band: 'horizontal' = side-by-side
    cameras (tall narrow overlap), 'vertical' = stacked cameras (wide short
    overlap) — the orientation DpSeamFinder handles via its component sweep
    (reference src/seam_finders.cpp:162-1049)."""
    rng = np.random.default_rng(seed)
    big = rng.uniform(0, 255, (H * 2, W * 2, 3)).astype(np.float32)
    big = cv2.GaussianBlur(big, (0, 0), 6)
    yy, xx = np.mgrid[0:H * 2, 0:W * 2]
    big = np.clip(big + (np.sin(xx / 17.0) * 40 +
                         np.cos(yy / 23.0) * 40)[..., None], 0, 255)
    if orient == "horizontal":
        i1, i2 = big[:H, :W], big[:H, W - ov:2 * W - ov]
        c1, c2 = (0, 0), (W - ov, 0)
    else:
        i1, i2 = big[:H, :W], big[H - ov:2 * H - ov, :W]
        c1, c2 = (0, 0), (0, H - ov)
    i2 = np.clip(i2 * 1.05 + rng.normal(0, 3, i2.shape), 0, 255)
    return i1.astype(np.float32), i2.astype(np.float32), c1, c2


def _canvas_cut_cost(i1c, i2c, m1, m2, cost_type="color"):
    """Seam cut cost under the reference DpSeamFinder objective
    (seam_finders.cpp:703-780): squared-L2 cross diffs on boundary edges;
    'colorgrad' divides by the axis-matched |Sobel| magnitudes + 1."""
    from stitchingvideo_tpu.seams.dp import _sobel_x
    a, b = i1c.astype(np.float32), i2c.astype(np.float32)

    def d2(u, v):
        return ((u - v) ** 2).sum(-1)

    ev = 0.5 * (d2(a[:, :-1], b[:, 1:]) + d2(a[:, 1:], b[:, :-1]))
    eh = 0.5 * (d2(a[:-1], b[1:]) + d2(a[1:], b[:-1]))
    if cost_type == "colorgrad":
        def lum(img):
            return img @ np.array([0.299, 0.587, 0.114], np.float32)
        gx1, gx2 = np.abs(_sobel_x(lum(a))), np.abs(_sobel_x(lum(b)))
        gy1 = np.abs(_sobel_x(lum(a).T).T)
        gy2 = np.abs(_sobel_x(lum(b).T).T)
        ev = ev / (gx1[:, :-1] + gx1[:, 1:] + gx2[:, :-1] + gx2[:, 1:] + 1.0)
        eh = eh / (gy1[:-1] + gy1[1:] + gy2[:-1] + gy2[1:] + 1.0)
    b1, b2 = m1.astype(bool), m2.astype(bool)
    h = (b1[:, :-1] & b2[:, 1:]) | (b2[:, :-1] & b1[:, 1:])
    v = (b1[:-1] & b2[1:]) | (b2[:-1] & b1[1:])
    return ev[h].sum() + eh[v].sum()


@pytest.mark.parametrize("orient", ["horizontal", "vertical"])
@pytest.mark.parametrize("cost", ["color", "colorgrad"])
def test_dp_seam_cost_parity_with_cv2(orient, cost):
    """DP seam cut cost vs cv2.detail_DpSeamFinder on BOTH overlap
    orientations (VERDICT item 7): ours must be within 10% of cv2's cut cost
    (it is typically well below — a cheaper cut is a better seam)."""
    from stitchingvideo_tpu.seams.dp import dp_seams
    i1, i2, c1, c2 = _dp_fixture(orient, seed=3 if cost == "color" else 4)
    H1, W1 = i1.shape[:2]
    H2, W2 = i2.shape[:2]
    CW, CH = max(c1[0] + W1, c2[0] + W2), max(c1[1] + H1, c2[1] + H2)

    def on_canvas(img, c):
        out = np.zeros((CH, CW, 3), np.float32)
        out[c[1]:c[1] + img.shape[0], c[0]:c[0] + img.shape[1]] = img
        return out

    i1c, i2c = on_canvas(i1, c1), on_canvas(i2, c2)
    masks = np.zeros((2, CH, CW), bool)
    masks[0, c1[1]:c1[1] + H1, c1[0]:c1[0] + W1] = True
    masks[1, c2[1]:c2[1] + H2, c2[0]:c2[0] + W2] = True

    sf = cv2.detail_DpSeamFinder("COLOR" if cost == "color" else "COLOR_GRAD")
    cvm = [np.full((H1, W1), 255, np.uint8), np.full((H2, W2), 255, np.uint8)]
    out = sf.find([i1, i2], [c1, c2], cvm)
    r = [np.asarray(u.get() if isinstance(u, cv2.UMat) else u) for u in out]
    cv_m = np.zeros((2, CH, CW), bool)
    cv_m[0, c1[1]:c1[1] + H1, c1[0]:c1[0] + W1] = r[0] > 0
    cv_m[1, c2[1]:c2[1] + H2, c2[0]:c2[0] + W2] = r[1] > 0
    cv_cost = _canvas_cut_cost(i1c, i2c, cv_m[0], cv_m[1], cost)

    ours = dp_seams(np.stack([i1c, i2c]), masks, cost)
    # partition invariants: disjoint, covering the union
    assert not (ours[0] & ours[1]).any()
    assert ((ours[0] | ours[1]) == (masks[0] | masks[1])).all()
    our_cost = _canvas_cut_cost(i1c, i2c, ours[0], ours[1], cost)
    assert our_cost <= cv_cost * 1.1 + 1e-3, (orient, cost, our_cost, cv_cost)


def test_dp_seams_multi_component_overlap(rng):
    """A pair overlapping in TWO disjoint regions (the wrap-around case):
    each component gets its own DP seam (reference findComponents,
    seam_finders.cpp:254-332). The single-bbox sweep this replaces cut one
    seam through the inf-cost gap, assigning a whole component to one side."""
    from stitchingvideo_tpu.seams.dp import dp_seams
    H, W = 64, 96
    img = rng.integers(0, 255, (H, W, 3)).astype(np.float32)
    i1 = img + rng.normal(0, 2, (H, W, 3)).astype(np.float32)
    i2 = img + rng.normal(0, 2, (H, W, 3)).astype(np.float32)
    m1 = np.zeros((H, W), bool)
    m2 = np.zeros((H, W), bool)
    m1[:, :60] = True
    m1[:, 80:] = True          # wrap-around piece
    m2[:, 50:] = True
    overlap = m1 & m2          # two disjoint strips: 50:60 and 80:96
    out = dp_seams(np.stack([i1, i2]), np.stack([m1, m2]), "color")
    o1, o2 = out[0], out[1]
    # partition of the overlap, nothing lost outside it
    assert not (o1 & o2).any()
    assert ((o1 | o2) == (m1 | m2)).all()
    # EACH component is split between the two images (each image has unique
    # territory adjacent to each strip, so a sensible seam keeps both sides
    # nonempty in both strips)
    for sl in (np.s_[:, 50:60], np.s_[:, 80:96]):
        ov = overlap[sl]
        assert o1[sl][ov].any() and o2[sl][ov].any(), sl
