"""Planar ([C, H, W]) float pyramids as banded-matrix MXU matmuls.

Same math as ops/pyramid.py (OpenCV 5-tap kernel, BORDER_REFLECT_101,
even sizes) in a TPU-fast formulation. Three generations, fastest last:
ops/pyramid.py lowers the separable filter to a depthwise conv with C=3
channels minor — a shape the TPU backend executes at a tiny fraction of
peak (measured ~3 s/frame of the multiband video path). The shifted-add
polyphase version here (pyr_*_sa) fixed that, but its stride-2 phase
extraction on the minor (lane) axis lowers to cross-lane shuffles. The
default pyr_down_p/pyr_up_p apply the decimation/upsampling as banded
[n, n'] matrices on the MXU — 3.2x faster again at multiband-video sizes
(scripts/bench_pyr_mm.py) and exact-f32-accumulating.
"""
from __future__ import annotations

from functools import lru_cache
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _conv5_axis(x: jnp.ndarray, axis: int, scale: float = 1.0) -> jnp.ndarray:
    """VALID 5-tap filter along `axis` of [C, H+4?, W+4?] via shifted adds."""
    n = x.shape[axis] - 4
    sl = [slice(None)] * x.ndim

    def s(off):
        sl2 = list(sl)
        sl2[axis] = slice(off, off + n)
        return x[tuple(sl2)]

    k = _K5 * scale
    return (k[0] * s(0) + k[1] * s(1) + k[2] * s(2) + k[3] * s(3)
            + k[4] * s(4))


def _blur(x: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Separable 5-tap blur of [C, H, W], BORDER_REFLECT_101."""
    p = jnp.pad(x, ((0, 0), (2, 2), (2, 2)), mode="reflect")
    return _conv5_axis(_conv5_axis(p, 1, scale), 2, scale)


def _down_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Polyphase blur+2:1 decimate along `axis` (reflect-101 border).

    blur-then-subsample computes 4x the outputs it keeps; the polyphase
    split (out[i] = k0 e[i] + k2 e[i+1] + k4 e[i+2] + k1 o[i] + k3 o[i+1]
    over the even/odd phases of the padded input) runs the 5-tap filter on
    HALF-length arrays — ~4x less materialized traffic, which is what the
    shifted-add formulation is bound by on TPU."""
    n = x.shape[axis]
    pw = [(0, 0)] * x.ndim
    pw[axis] = (2, 2)
    xp = jnp.pad(x, pw, mode="reflect")
    shape = list(xp.shape)
    shape[axis:axis + 1] = [(n + 4) // 2, 2]
    ph = xp.reshape(shape)                       # [..., (n+4)/2, 2, ...]
    sl = [slice(None)] * ph.ndim

    def phase(par, off, cnt):
        s = list(sl)
        s[axis + 1] = par
        s[axis] = slice(off, off + cnt)
        return ph[tuple(s)]

    m = n // 2
    return (_K5[0] * phase(0, 0, m) + _K5[2] * phase(0, 1, m)
            + _K5[4] * phase(0, 2, m)
            + _K5[1] * phase(1, 0, m) + _K5[3] * phase(1, 1, m))


def _up_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Polyphase 1:2 zero-stuff + blur (x4 kernel) along `axis`.

    Even outputs = 2(k0 x[i-1] + k2 x[i] + k4 x[i+1]); odd outputs =
    2(k1 x[i] + k3 x[i+1]) — per-axis scale 2 composes to the 4x stuffing
    gain; the stuffed zeros never touch the ALU and the taps run at input
    (half) resolution. Border parity with blur-of-stuffed under reflect-101:
    the pad position left of x[0] lands on stuffed index -2 -> x[1]
    (reflect), but right of x[n-1] lands on stuffed index 2n -> x[n-1]
    (edge-replicate, because the stuffed array ends in a zero)."""
    n = x.shape[axis]
    pw = [(0, 0)] * x.ndim
    pw[axis] = (1, 0)
    xp = jnp.pad(x, pw, mode="reflect")
    pw[axis] = (0, 1)
    xp = jnp.pad(xp, pw, mode="edge")
    sl = [slice(None)] * x.ndim

    def s(off):
        ss = list(sl)
        ss[axis] = slice(off, off + n)
        return xp[tuple(ss)]

    even = 2.0 * (_K5[0] * s(0) + _K5[2] * s(1) + _K5[4] * s(2))
    odd = 2.0 * (_K5[1] * s(1) + _K5[3] * s(2))
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return out.reshape(shape)


@lru_cache(maxsize=64)
def _down_mat(n: int) -> np.ndarray:
    """[n, n//2] banded decimation matrix: out[i] = sum_k K5[k] x[r(2i+k-2)]
    with reflect-101 borders — the matrix form of _down_axis."""
    m = n // 2
    D = np.zeros((n, m), np.float32)
    for i in range(m):
        for k in range(5):
            j = 2 * i + k - 2
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * (n - 1) - j
            D[j, i] += _K5[k]
    return D


@lru_cache(maxsize=64)
def _up_mat(n: int) -> np.ndarray:
    """[n, 2n] zero-stuff upsample matrix (matrix form of _up_axis: left
    reflect-101, right edge-replicate — see _up_axis docstring)."""
    U = np.zeros((n, 2 * n), np.float32)
    for i in range(n):
        for k, off in ((0, -1), (2, 0), (4, 1)):   # even output 2i
            j = i + off
            j = 1 if j < 0 else (n - 1 if j >= n else j)
            U[j, 2 * i] += 2.0 * _K5[k]
        for k, off in ((1, 0), (3, 1)):            # odd output 2i+1
            U[min(i + off, n - 1), 2 * i + 1] += 2.0 * _K5[k]
    return U


def _mm_axes(x: jnp.ndarray, A_h: np.ndarray, A_w: np.ndarray,
             out_dtype=None) -> jnp.ndarray:
    """Apply banded resampling matrices along H then W of [C, H, W] as two
    MXU matmuls (f32 accumulation). The banded matrices spend ~n/5 redundant
    zero FLOPs per tap, but the MXU is idle in this pipeline and the
    polyphase shifted-add version's stride-2 phase extraction on the minor
    (lane) axis lowers to cross-lane shuffles — measured 3.2x slower than
    this form at multiband-video sizes (scripts/bench_pyr_mm.py)."""
    dt = x.dtype
    mm = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
    Ah = jnp.asarray(A_h, mm)
    Aw = jnp.asarray(A_w, mm)
    t = jax.lax.dot_general(x.astype(mm), Ah, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [C, W, H']
    o = jax.lax.dot_general(t.astype(mm), Aw, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [C, H', W']
    return o.astype(out_dtype or dt)


def pyr_down_p(x: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """[C, H, W] -> [C, H//2, W//2] (H, W even)."""
    return _mm_axes(x, _down_mat(x.shape[1]), _down_mat(x.shape[2]),
                    out_dtype)


def pyr_up_p(x: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """[C, H, W] -> [C, 2H, 2W]: polyphase zero-stuff upsample.

    out_dtype: override the output dtype without changing the matmul
    operand dtype — bf16 inputs with f32 output keep the exact f32
    accumulation (bf16 operands lose nothing: they ARE the stored data)."""
    return _mm_axes(x, _up_mat(x.shape[1]), _up_mat(x.shape[2]), out_dtype)


def pyr_down_sa(x: jnp.ndarray) -> jnp.ndarray:
    """Shifted-add reference formulation (kept for parity tests)."""
    return _down_axis(_down_axis(x, 1), 2)


def pyr_up_sa(x: jnp.ndarray) -> jnp.ndarray:
    """Shifted-add reference formulation (kept for parity tests)."""
    return _up_axis(_up_axis(x, 1), 2)


def gaussian_pyramid_p(x: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    pyr = [x]
    for _ in range(levels):
        pyr.append(pyr_down_p(pyr[-1]))
    return pyr


def collapse_laplacian_p(pyr: List[jnp.ndarray]) -> jnp.ndarray:
    img = pyr[-1]
    for lvl in reversed(pyr[:-1]):
        img = pyr_up_p(img) + lvl
    return img
