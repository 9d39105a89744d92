"""Graph-cut seam finder over the native BK max-flow.

Parity target: GraphCutSeamFinder COST_COLOR / COST_COLOR_GRAD (reference
src/seam_finders.cpp:1052-1305 + gcgraph.hpp): per overlapping pair, build a
grid graph over the overlap ROI (+10 px gap), terminal weight 10000 where a
mask owns a pixel, edge weight = color-difference L2 (optionally divided by
Sobel gradient magnitude) + 1000 penalty at mask borders; BK min-cut assigns
each overlap pixel to one image.

Host-side stage (registration slow path), exactly where the reference runs it
(SURVEY §7.3 'Graph-cut seams'): the cut itself is pointer-chasing-sequential,
so it runs in native C++ at seam scale while everything around it stays on
device.
"""
from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from ..native import build as native_build

TERMINAL_COST = 10000.0
BAD_REGION_PENALTY = 1000.0
WEIGHT_EPS = 1.0
GAP = 10


def _cptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def _grad_mag(img: np.ndarray) -> np.ndarray:
    """Mean |Sobel| over channels (COST_COLOR_GRAD helper)."""
    gy, gx = np.gradient(img.mean(axis=-1))
    return np.abs(gx) + np.abs(gy)


def _pair_cut(img1: np.ndarray, img2: np.ndarray,
              mask1: np.ndarray, mask2: np.ndarray,
              cost_type: str) -> Tuple[np.ndarray, np.ndarray]:
    """Resolve the overlap of one image pair; returns updated (mask1, mask2)."""
    overlap = mask1 & mask2
    if not overlap.any():
        return mask1, mask2
    ys, xs = np.nonzero(overlap)
    y0 = max(int(ys.min()) - GAP, 0)
    y1 = min(int(ys.max()) + GAP + 1, mask1.shape[0])
    x0 = max(int(xs.min()) - GAP, 0)
    x1 = min(int(xs.max()) + GAP + 1, mask1.shape[1])

    m1 = mask1[y0:y1, x0:x1]
    m2 = mask2[y0:y1, x0:x1]
    i1 = img1[y0:y1, x0:x1].astype(np.float32)
    i2 = img2[y0:y1, x0:x1].astype(np.float32)
    h, w = m1.shape

    term_src = np.where(m1 & ~m2, TERMINAL_COST, 0.0).astype(np.float32)
    term_snk = np.where(m2 & ~m1, TERMINAL_COST, 0.0).astype(np.float32)

    diff = np.sqrt(((i1 - i2) ** 2).sum(axis=-1))  # [h,w] color distance
    both = m1 & m2

    def edge_w(a_sl, b_sl):
        wgt = diff[a_sl] + diff[b_sl] + WEIGHT_EPS
        if cost_type == "colorgrad":
            g1 = _grad_mag(i1)
            g2 = _grad_mag(i2)
            grad = g1[a_sl] + g2[a_sl] + g1[b_sl] + g2[b_sl] + WEIGHT_EPS
            wgt = wgt / grad + WEIGHT_EPS
        bad = ~(both[a_sl] & both[b_sl])
        return (wgt + bad * BAD_REGION_PENALTY).astype(np.float32)

    cap_right = edge_w((slice(None), slice(0, w - 1)), (slice(None), slice(1, w)))
    cap_down = edge_w((slice(0, h - 1), slice(None)), (slice(1, h), slice(None)))

    labels = np.zeros(h * w, np.uint8)
    lib = native_build.load()
    lib.grid_maxflow(h, w,
                     _cptr(np.ascontiguousarray(term_src.ravel()), ctypes.c_float),
                     _cptr(np.ascontiguousarray(term_snk.ravel()), ctypes.c_float),
                     _cptr(np.ascontiguousarray(cap_right.ravel()), ctypes.c_float),
                     _cptr(np.ascontiguousarray(cap_down.ravel()), ctypes.c_float),
                     _cptr(labels, ctypes.c_uint8))
    to_first = labels.reshape(h, w).astype(bool)

    new_m1 = mask1.copy()
    new_m2 = mask2.copy()
    ov = both
    new_m1[y0:y1, x0:x1] = m1 & (~ov | to_first)
    new_m2[y0:y1, x0:x1] = m2 & (~ov | ~to_first)
    return new_m1, new_m2


def graphcut_seams(images: np.ndarray, masks: np.ndarray,
                   cost_type: str = "color") -> np.ndarray:
    """images: [N, H, W, 3] float canvas-placed (seam scale);
    masks: [N, H, W] bool. Returns seam masks (overlaps resolved)."""
    n = masks.shape[0]
    ms = [np.asarray(m).astype(bool).copy() for m in masks]
    imgs = [np.asarray(im) for im in images]
    for i in range(n):
        for j in range(i + 1, n):
            ms[i], ms[j] = _pair_cut(imgs[i], imgs[j], ms[i], ms[j], cost_type)
    return np.stack(ms)


def _bucket(x: int, q: int) -> int:
    return -(-x // q) * q


_NSEG = 4           # max circular overlap segments recognized per pair
_MIN_GAP = 64       # empty-column run that splits an overlap into segments


def _meta_and_packed_masks():
    """ONE device program: per-pair overlap extents (wrap-aware circular x
    runs — a 360° rig's wrap pair straddles the canvas x edges, and a plain
    bbox inflates to the full canvas width; a stray second overlap blob far
    from the main one likewise inflates a single-arc bound, so the top-_NSEG
    circular gaps are reported and the host splits the overlap into one band
    per run) + the full mask canvas packed 8 pixels/byte for a cheap host
    fetch (8x fewer relay bytes)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("pairs",))
    def run(masks, pairs):
        N, H, W = masks.shape
        ii = jnp.asarray([p[0] for p in pairs])
        jj = jnp.asarray([p[1] for p in pairs])
        ov = masks[ii] & masks[jj]                    # [P,H,W]
        ys = ov.any(axis=2)
        yi = jnp.arange(H)[None]
        ymin = jnp.min(jnp.where(ys, yi, H), axis=1)
        ymax = jnp.max(jnp.where(ys, yi, -1), axis=1)
        # circular empty-run lengths: gap[c] (occupied c only) = number of
        # empty columns in the run ending at c-1, wrapping at W.
        occ = ov.any(axis=1)                          # [P,W]
        xi = jnp.arange(W)[None]
        occd = jnp.where(occ, xi, -1)
        p = jax.lax.cummax(occd, axis=1)              # last occupied <= c
        last = p[:, -1:]
        p_before = jnp.concatenate(
            [jnp.full((p.shape[0], 1), -1, p.dtype), p[:, :-1]], axis=1)
        gap = jnp.where(p_before >= 0, xi - p_before - 1,
                        xi + (W - 1 - last))          # empty run ending at c-1
        gap = jnp.where(occ, gap, -1)
        gv, gi = jax.lax.top_k(gap, _NSEG)            # [P,_NSEG] desc
        meta = jnp.concatenate(
            [jnp.stack([ov.any(axis=(1, 2)).astype(jnp.int32),
                        ymin.astype(jnp.int32), ymax.astype(jnp.int32)],
                       axis=1),
             gv.astype(jnp.int32), gi.astype(jnp.int32)], axis=1)
        wts = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
        # pad W up to a multiple of 8 (product canvases bucket to 64, but
        # direct callers may pass unaligned widths); the host unpack slices
        # back to W
        Wp8 = -(-W // 8) * 8
        mpad = jnp.pad(masks, ((0, 0), (0, 0), (0, Wp8 - W)))
        packed = (mpad.reshape(N, H, Wp8 // 8, 8).astype(jnp.uint8)
                  * wts).sum(axis=-1).astype(jnp.uint8)
        return meta, packed

    return run


def _pair_segments(meta_row, W: int):
    """Circular occupied-column runs for one pair from its meta row
    ([live, ymin, ymax, gap_val*_NSEG, gap_pos*_NSEG]) as (xstart, width)
    tuples, in ascending-x order. Runs separated by an empty stretch
    >= _MIN_GAP become separate bands (independent BK cuts — the stretch
    between them carries no overlap, so the grid graph decomposes there,
    mirroring the reference DpSeamFinder's per-component seams)."""
    gv = meta_row[3:3 + _NSEG]
    gi = meta_row[3 + _NSEG:3 + 2 * _NSEG]
    big = int(gv[0])
    if big <= 0:                       # overlap occupies every column
        return [(0, W)]
    chosen = [(int(gi[s]), int(gv[s])) for s in range(_NSEG)
              if gv[s] >= _MIN_GAP]
    if not chosen:                     # keep at least the largest gap
        chosen = [(int(gi[0]), int(gv[0]))]
    chosen.sort()
    segs = []
    for t, (pos, _val) in enumerate(chosen):
        npos, nval = chosen[(t + 1) % len(chosen)]
        width = (npos - nval - pos) % W
        if len(chosen) == 1:
            width = W - _val       # arc = complement of the single gap
        if width > 0:
            segs.append((pos, width))
    segs.sort()
    return segs


def _crop_bands_wrapped():
    """Batched u8 band crop with wrap-around columns (cols mod W)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("bh", "bw"))
    def crop(canvas_imgs, idx, org, bh, bw):
        W = canvas_imgs.shape[2]

        def one(pair_idx, o):
            rows = o[0] + jnp.arange(bh)
            cols = (o[1] + jnp.arange(bw)) % W

            def cam(c):
                img = jnp.take(canvas_imgs, c, axis=0)
                return jnp.take(jnp.take(img, rows, axis=0), cols, axis=1)
            return jax.vmap(cam)(pair_idx)
        return jax.vmap(one)(idx, org)

    return crop


def _scatter_bands():
    """Write the final host-cut band masks back into the device mask canvas
    (wrapped columns), so the seam canvas never round-trips in full."""
    import jax.numpy as jnp
    from functools import partial
    import jax

    @partial(jax.jit, static_argnames=("bh", "bw"))
    def scatter(masks, band, idx, org, bh, bw):
        W = masks.shape[2]
        P = band.shape[0]

        # fori_loop over the P*2 band writes: each advanced-index scatter
        # (wrapped columns) lowers to sizeable TPU code, and unrolling the
        # loop compiled to a 1.6-5.4 MB SHAPE-DEPENDENT program — one per
        # rig's band bucket, uncacheable across rigs, each costing seconds
        # of per-process first-execution on the remote relay. Emitted once
        # under the loop the program is ~P*2 times smaller; the write order
        # (pt-major, side-minor) is preserved, k = 2*pt + s.
        def body(k, m):
            pt = k // 2
            s = k % 2
            rows = org[pt, 0] + jnp.arange(bh)
            cols = (org[pt, 1] + jnp.arange(bw)) % W
            return m.at[idx[pt, s], rows[:, None],
                        cols[None, :]].set(band[pt, s])

        return jax.lax.fori_loop(0, 2 * P, body, masks)

    return scatter


_OVERLAP_META = None
_CROP_BANDS = None
_SCATTER = None
_L_BUCKET = 4       # live-pair-count bucket (stable jit signatures)
_B_BUCKET = 64      # band-shape bucket


def graphcut_seams_banded(canvas_imgs, canvas_masks,
                          cost_type: str = "color",
                          sticky: Optional[dict] = None):
    """Device-aware variant: canvas_imgs/canvas_masks are jax device arrays;
    returns the resolved seam masks as a DEVICE array.

    Relay traffic per call (the warm re-registration budget, VERDICT r3
    item 1): one fused dispatch fetching pair extents + the bit-packed mask
    canvas (~0.9 MB for 6 cams), one u8 band crop fetch sized by the
    wrap-aware circular overlap extents (~1-2 MB instead of the ~24 MB a
    plain bbox fetches when the 360° wrap pair spans the canvas), and one
    async scatter upload writing the cut bands back — the full image/mask
    canvases never cross the relay. Band shape and pair count are bucketed
    (optionally sticky across re-registrations via `sticky`) so the three
    programs compile once per rig. The sequential BK cuts (reference pair
    order, seam_finders.cpp:1122-1135) run on the host masks exactly as
    `graphcut_seams` does, so results are identical GIVEN IDENTICAL INPUTS
    (for the wrap pair the circular band adds the physically-correct
    cylindrical adjacency the plane-canvas reference lacks).
    Note the product stitcher feeds this path u8-quantized canvases (4x
    smaller relay fetch) while the legacy float path saw float32 values —
    seam placement can differ by rounding between the two entry points; the
    cut-cost parity gates hold for both.
    """
    import jax.numpy as jnp

    global _OVERLAP_META, _CROP_BANDS, _SCATTER
    if _OVERLAP_META is None:
        _OVERLAP_META = _meta_and_packed_masks()
        _CROP_BANDS = _crop_bands_wrapped()
        _SCATTER = _scatter_bands()

    canvas_masks = jnp.asarray(canvas_masks)
    N, H, W = canvas_masks.shape
    ii, jj = np.triu_indices(N, 1)
    pairs = tuple((int(a), int(b)) for a, b in zip(ii, jj))
    meta_dev, packed_dev = _OVERLAP_META(canvas_masks, pairs)
    meta = np.asarray(meta_dev)
    live = [k for k in range(len(pairs)) if meta[k, 0]]
    if not live:
        return canvas_masks
    masks = np.unpackbits(np.asarray(packed_dev), axis=2)[:, :, :W] \
        .astype(bool)

    # one band entry per circular overlap SEGMENT (pair order, then x order)
    entries = []     # (cam_i, cam_j, ymin, xstart, width)
    for k in live:
        for xs, wd in _pair_segments(meta[k], W):
            entries.append((int(ii[k]), int(jj[k]),
                            int(meta[k, 1]), xs, wd))

    bh = min(H, _bucket(max(int(meta[k, 2] - meta[k, 1]) + 1 for k in live)
                        + 2 * GAP, _B_BUCKET))
    bw = min(W, _bucket(max(e[4] for e in entries) + 2 * GAP, _B_BUCKET))
    if sticky is not None:
        bh = min(H, max(bh, sticky.get("bh", 0)))
        bw = min(W, max(bw, sticky.get("bw", 0)))
        sticky["bh"], sticky["bw"] = bh, bw
    origins = [(int(np.clip(e[2] - GAP, 0, H - bh)),
                0 if bw >= W else int((e[3] - GAP) % W))
               for e in entries]
    # one batched fetch of the image bands for every segment; the entry
    # list is padded to a bucket so the crop program signature is stable
    Lp = _bucket(len(entries), _L_BUCKET)
    npad = Lp - len(entries)
    idx_np = np.array([[e[0], e[1]] for e in entries]
                      + [[entries[0][0], entries[0][1]]] * npad)
    org_np = np.array(origins + [origins[0]] * npad)
    idx_dev = jnp.asarray(idx_np)
    org_dev = jnp.asarray(org_np)
    bands = np.asarray(_CROP_BANDS(canvas_imgs, idx_dev, org_dev, bh, bw))

    row_ix = [np.arange(oy, oy + bh) for oy, _ in origins]
    col_ix = [(np.arange(ox, ox + bw) % W) for _, ox in origins]

    # Wave-parallel BK cuts: two cuts commute exactly when their camera sets
    # are disjoint (each _pair_cut reads and writes only masks[i]/masks[j]
    # inside its own band), so entries are scheduled into waves that keep
    # the sequential pair order for any shared camera and run each wave's
    # cuts in host threads (grid_maxflow is stateless C and the ctypes call
    # releases the GIL; the numpy band prep mostly does too). A 6-camera
    # ring's 6 live pairs schedule as 2 waves of 3 — results are identical
    # to the sequential reference order (seam_finders.cpp:1122-1135).
    wave_of = []
    last_wave_of_cam: dict = {}
    for (i, j, _ym, _xs, _wd) in entries:
        w_t = max(last_wave_of_cam.get(i, -1),
                  last_wave_of_cam.get(j, -1)) + 1
        wave_of.append(w_t)
        last_wave_of_cam[i] = last_wave_of_cam[j] = w_t

    def _cut_one(t):
        i, j = entries[t][0], entries[t][1]
        sl = np.ix_(row_ix[t], col_ix[t])
        m1, m2 = _pair_cut(bands[t, 0].astype(np.float32),
                           bands[t, 1].astype(np.float32),
                           masks[i][sl], masks[j][sl], cost_type)
        masks[i][sl] = m1
        masks[j][sl] = m2

    native_build.load()     # build/load once before threads fan out
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=8) as pool:
        for w_t in range(max(wave_of) + 1 if wave_of else 0):
            ts = [t for t in range(len(entries)) if wave_of[t] == w_t]
            if len(ts) == 1:
                _cut_one(ts[0])
            else:
                list(pool.map(_cut_one, ts))

    # final band states (order-independent: every cut-modified pixel lies in
    # some band, and these slices read the FINAL host masks)
    def _final_band(t):
        u = t if t < len(entries) else 0  # padding entries duplicate entry 0
        sl = np.ix_(row_ix[u], col_ix[u])
        return np.stack([masks[idx_np[t, 0]][sl], masks[idx_np[t, 1]][sl]])

    out_bands = np.stack([_final_band(t) for t in range(Lp)])
    return _SCATTER(canvas_masks, jnp.asarray(out_bands), idx_dev, org_dev,
                    bh, bw)
