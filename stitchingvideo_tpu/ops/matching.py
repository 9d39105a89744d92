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

_INF = jnp.float32(1e9)


def hamming_matrix(d1: jnp.ndarray, d2: jnp.ndarray,
                   v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """[K1, K2] Hamming distances; invalid rows/cols get +inf."""
    a = d1.astype(jnp.float32)
    b = d2.astype(jnp.float32)
    dot = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ham = a.sum(axis=1)[:, None] + b.sum(axis=1)[None, :] - 2.0 * dot
    ham = jnp.where(v1[:, None] & v2[None, :], ham, _INF)
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
    return jnp.where(v1[:, None] & v2[None, :], dist, _INF)


def _two_nn(D: jnp.ndarray):
    """Per-row two smallest distances and argmin. D: [K1, K2]."""
    neg, idx = jax.lax.top_k(-D, 2)
    d0, d1 = -neg[:, 0], -neg[:, 1]
    return d0, d1, idx[:, 0]


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
    if jnp.issubdtype(d1.dtype, jnp.floating):
        D = l2_matrix(d1, d2, v1, v2)
    else:
        D = hamming_matrix(d1, d2, v1, v2)
    K1, K2 = D.shape

    f0, f1, fj = _two_nn(D)
    fwd_keep = (f0 < (1.0 - match_conf) * f1) & (f0 < _INF)

    b0, b1, bi = _two_nn(D.T)
    bwd_keep = (b0 < (1.0 - match_conf) * b1) & (b0 < _INF)
    # Dedup: backward match (bi[j] -> j) already present if fwd row bi[j] kept
    # and points to j.
    already = fwd_keep[bi] & (fj[bi] == jnp.arange(K2))
    bwd_keep = bwd_keep & ~already

    src = jnp.concatenate([jnp.arange(K1), bi])
    dst = jnp.concatenate([fj, jnp.arange(K2)])
    dist = jnp.concatenate([f0, b0])
    keep = jnp.concatenate([fwd_keep, bwd_keep])

    order_score = jnp.where(keep, -dist, -_INF)
    _, sel = jax.lax.top_k(order_score, max_matches)
    return src[sel], dst[sel], dist[sel], keep[sel]
