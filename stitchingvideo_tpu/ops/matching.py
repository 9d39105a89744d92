"""Pairwise descriptor matching on the MXU.

Parity target: CpuMatcher::match — FLANN 2-NN in both directions + Lowe ratio
test `d0 < (1 - match_conf) * d1` (reference src/matchers.cpp:147-202), fanned
out over image pairs (MatchPairsBody :66-109). TPU-first design: the Hamming
distance matrix of two binary descriptor sets is one bf16 matmul
(`ham = |a| + |b| - 2 a.b^T`), so a whole pair's 2-NN search is a single
MXU-friendly [K,256]x[256,K] contraction + top-k, and all pairs batch under
vmap — no trees, no per-pair threads.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# np scalar, NOT jnp: a module-level jnp.float32() is a DEVICE array, and
# embedding it as a jit constant makes MLIR lowering fetch it through the
# TPU relay — measured 200-540 s stall on the FIRST program that closes
# over it in each process (the round-2 cold-start mystery)
_INF = np.float32(1e9)


def hamming_matrix(d1: jnp.ndarray, d2: jnp.ndarray,
                   v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """[K1, K2] Hamming distances; invalid rows/cols get +inf."""
    # bf16 operands, f32 MXU accumulation: EXACT for 0/1 descriptors (bit
    # values and all partial sums <= 256 are representable), and the bf16
    # matmul is the TPU-native path — the f32xf32 dot here compiled ~6x
    # slower (XLA's multi-pass f32 matmul + autotune) and its executable
    # took ~60 s to load per fresh process
    a = d1.astype(jnp.bfloat16)
    b = d2.astype(jnp.bfloat16)
    dot = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    af = d1.astype(jnp.float32)
    bf = d2.astype(jnp.float32)
    ham = af.sum(axis=1)[:, None] + bf.sum(axis=1)[None, :] - 2.0 * dot
    # additive validity penalties instead of a select fused into the matmul
    # output (the fused select compiled pathologically on the remote XLA
    # service); invalid rows/cols end up >= _INF which every consumer
    # treats as "no match"
    ham = ham + jnp.where(v1, 0.0, _INF)[:, None] \
        + jnp.where(v2, 0.0, _INF)[None, :]
    return ham


def l2_matrix(d1: jnp.ndarray, d2: jnp.ndarray,
              v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """[K1, K2] Euclidean distances for FLOAT descriptors (the SURF-class
    modality: reference CpuMatcher uses a FLANN KD-tree for float
    descriptors, matchers.cpp:147-202 — on TPU the whole distance field is
    one MXU contraction, no tree). Same Lowe-ratio semantics as the
    reference since distances are true L2, not squared."""
    a = d1.astype(jnp.float32)
    b = d2.astype(jnp.float32)
    dot = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    sq = (a * a).sum(axis=1)[:, None] + (b * b).sum(axis=1)[None, :] \
        - 2.0 * dot
    dist = jnp.sqrt(jnp.maximum(sq, 0.0))
    return dist + jnp.where(v1, 0.0, _INF)[:, None] \
        + jnp.where(v2, 0.0, _INF)[None, :]


def _two_nn(D: jnp.ndarray):
    """Per-row two smallest distances and argmin. D: [K1, K2].

    Pure min/argmin reductions + a masked second pass — lax.top_k(k=2) here
    lowered to a full sort network whose XLA compile took minutes and whose
    executable took ~60 s to LOAD per fresh process (the single largest
    cold-start cost of the whole registration path)."""
    j0 = jnp.argmin(D, axis=1)
    d0 = jnp.min(D, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    d1 = jnp.min(jnp.where(cols == j0[:, None], _INF, D), axis=1)
    return d0, d1, j0


# Above this K1*K2, match_pair streams the distance field in column chunks
# instead of materializing it: the reference needs FLANN KD/LSH trees to
# stay sub-quadratic in TIME on a CPU (matchers.cpp:147-202); on the MXU
# the quadratic FLOPs are cheap far past any real keypoint budget (K=8192
# is ~34 GFLOP/pair ~ 0.2 ms) and only the [K1,K2] MEMORY is a wall — so
# the TPU-native scale path is exact chunked brute force, not approximate
# hashing. Results are bit-identical to the dense path.
CHUNKED_ABOVE = 4096 * 4096
NN_CHUNK = 2048

# The enforced operating envelope of the exact path. Compute is O(K1*K2)
# per pair; at the ceiling one pair costs 2*K^2*256 ~ 2.2 TFLOP ~ 12 ms on
# a v5e MXU — still far cheaper than building a FLANN tree for the same K
# on any CPU (the reference's answer to the same scaling problem,
# matchers.cpp:147-202), and exact. Detectors in this framework emit
# 1-8 K keypoints (ops/features.detect max_kp), so the ceiling is ~8x above
# any reachable configuration; beyond it brute force stops being the right
# tool (an ANN prefilter would be needed) and match_pair REFUSES loudly
# instead of degrading quietly.
MAX_KEYPOINTS = 65536


def _metric_block(d1, d2, v1, v2):
    if jnp.issubdtype(d1.dtype, jnp.floating):
        return l2_matrix(d1, d2, v1, v2)
    return hamming_matrix(d1, d2, v1, v2)


def _two_nn_chunked(d1, v1, d2, v2, chunk: int = NN_CHUNK):
    """Exact per-row 2-NN of the (virtual) distance matrix, streamed over
    column chunks of d2 — O(K1*chunk) live memory. Tie behavior matches
    _two_nn (first index wins) because chunks scan left to right and merges
    prefer the incumbent on equal distance."""
    K1 = d1.shape[0]
    K2 = d2.shape[0]
    pad = (-K2) % chunk
    d2p = jnp.pad(d2, ((0, pad), (0, 0)))
    v2p = jnp.pad(v2, (0, pad))         # pad entries invalid -> +inf cols
    nc = (K2 + pad) // chunk
    d2c = d2p.reshape(nc, chunk, d2.shape[1])
    v2c = v2p.reshape(nc, chunk)

    def step(carry, xs):
        b0, b1, bj = carry
        dc, vc, off = xs
        D = _metric_block(d1, dc, v1, vc)          # [K1, chunk]
        c0, c1, cj = _two_nn(D)
        cj = cj + off
        take = c0 < b0
        n0 = jnp.where(take, c0, b0)
        nj = jnp.where(take, cj, bj)
        n1 = jnp.where(take, jnp.minimum(b0, c1), jnp.minimum(b1, c0))
        return (n0, n1, nj), None

    init = (jnp.full((K1,), _INF), jnp.full((K1,), _INF),
            jnp.zeros((K1,), jnp.int32))
    offs = jnp.arange(nc, dtype=jnp.int32) * chunk
    (d0, dsecond, j0), _ = jax.lax.scan(step, init, (d2c, v2c, offs))
    return d0, dsecond, j0


def _rank_chunked(d_eff, keep, chunk: int = 4 * NN_CHUNK):
    """rank[i] = #kept entries strictly better than i (distance, then index
    tie-break) — the dense [M,M] comparison matrix streamed in column
    chunks (it is the other quadratic of match_pair at large K)."""
    M = d_eff.shape[0]
    pad = (-M) % chunk
    dp = jnp.pad(d_eff, (0, pad), constant_values=np.float32(np.inf))
    kp = jnp.pad(keep, (0, pad))
    idx = jnp.arange(M + pad, dtype=jnp.int32)
    nc = (M + pad) // chunk

    def step(rank, xs):
        dc, kc, ic = xs
        better = (dc[None, :] < d_eff[:, None]) | \
            ((dc[None, :] == d_eff[:, None]) &
             (ic[None, :] < jnp.arange(M)[:, None]))
        return rank + jnp.sum(better & kc[None, :], axis=1), None

    rank, _ = jax.lax.scan(
        step, jnp.zeros((M,), jnp.int32),
        (dp.reshape(nc, chunk), kp.reshape(nc, chunk),
         idx.reshape(nc, chunk)))
    return rank


@partial(jax.jit, static_argnames=("max_matches",))
def match_pair(d1, v1, d2, v2, match_conf: float = 0.3, max_matches: int = 512):
    """Best-of-2-nearest matching for one ordered image pair.

    Returns (src_idx [M], dst_idx [M], dist [M], valid [M]) with M=max_matches.
    Forward (1->2) ratio survivors plus backward (2->1) survivors not already
    found forward, best-distance-first — the same union rule as
    BestOf2NearestMatcher::match (matchers.cpp:575-611).

    Descriptor dtype selects the metric like the reference's matcher does
    (binary -> Hamming/LSH, float -> L2/KD-tree; matchers.cpp:169-180):
    integer descriptors use the Hamming matmul, floating ones true L2.
    """
    K1, K2 = d1.shape[0], d2.shape[0]
    if max(K1, K2) > MAX_KEYPOINTS:
        raise ValueError(
            f"match_pair: {max(K1, K2)} keypoints exceeds the exact "
            f"brute-force envelope (MAX_KEYPOINTS={MAX_KEYPOINTS}); "
            "reduce the detector budget (features.detect max_kp) — beyond "
            "this scale an ANN prefilter, not exact 2-NN, is the right tool")
    if K1 * K2 > CHUNKED_ABOVE:
        # exact chunked brute force (see CHUNKED_ABOVE): never materializes
        # the [K1,K2] field, bit-identical results
        f0, f1, fj = _two_nn_chunked(d1, v1, d2, v2)
        b0, b1, bi = _two_nn_chunked(d2, v2, d1, v1)
    else:
        D = _metric_block(d1, d2, v1, v2)
        f0, f1, fj = _two_nn(D)
        b0, b1, bi = _two_nn(D.T)
    fwd_keep = (f0 < (1.0 - match_conf) * f1) & (f0 < _INF)
    bwd_keep = (b0 < (1.0 - match_conf) * b1) & (b0 < _INF)
    # Dedup: backward match (bi[j] -> j) already present if fwd row bi[j] kept
    # and points to j.
    already = fwd_keep[bi] & (fj[bi] == jnp.arange(K2))
    bwd_keep = bwd_keep & ~already

    src = jnp.concatenate([jnp.arange(K1), bi])
    dst = jnp.concatenate([fj, jnp.arange(K2)])
    dist = jnp.concatenate([f0, b0])
    keep = jnp.concatenate([fwd_keep, bwd_keep])

    # Best-distance-first truncation to max_matches WITHOUT a sort: each
    # kept entry's output slot is its exact rank = #kept entries strictly
    # better (distance, then index as tie-break). An [M, M] comparison
    # matrix + row-reduce lowers to broadcast/reduce ops — lax.top_k here
    # lowered to a full sort network that cost minutes of XLA compile and
    # a ~60 s executable load per fresh process (cold-start dominant).
    d_eff = jnp.where(keep, dist, jnp.inf)
    if (K1 + K2) ** 2 > CHUNKED_ABOVE:
        rank = _rank_chunked(d_eff, keep)
    else:
        better = (d_eff[None, :] < d_eff[:, None]) | \
            ((d_eff[None, :] == d_eff[:, None]) &
             (jnp.arange(d_eff.shape[0])[None, :]
              < jnp.arange(d_eff.shape[0])[:, None]))
        rank = jnp.sum(better & keep[None, :], axis=1)
    slot = jnp.where(keep & (rank < max_matches), rank, max_matches)
    out_src = jnp.zeros((max_matches + 1,), src.dtype).at[slot].set(src)[:-1]
    out_dst = jnp.zeros((max_matches + 1,), dst.dtype).at[slot].set(dst)[:-1]
    out_dist = jnp.full((max_matches + 1,), _INF, dist.dtype) \
        .at[slot].set(dist)[:-1]
    out_keep = jnp.zeros((max_matches + 1,), jnp.bool_).at[slot].set(keep)[:-1]
    return out_src, out_dst, out_dist, out_keep
