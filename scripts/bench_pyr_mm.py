"""A/B: shifted-add polyphase pyramid vs banded-matrix MXU formulation.

Each dispatch maps the op over R distinct inputs so the relay RTT
amortizes; checks exact-shape agreement and max abs error.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from stitchingvideo_tpu.ops import pyramid_planar as ppyr

C, H, W = 18, 1152, 2176
R = 8
LEVELS = 7


def down_mat(n: int) -> np.ndarray:
    """[n, n//2] decimation matrix: out[i] = sum_k K5[k] x[r(2i+k-2)],
    reflect-101 borders (matches ppyr._down_axis)."""
    m = n // 2
    D = np.zeros((n, m), np.float32)
    for i in range(m):
        for k in range(5):
            j = 2 * i + k - 2
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * (n - 1) - j
            D[j, i] += ppyr._K5[k]
    return D


def up_mat(n: int) -> np.ndarray:
    """[n, 2n] zero-stuff upsample matrix (matches ppyr._up_axis: left
    reflect-101, right edge-replicate)."""
    U = np.zeros((n, 2 * n), np.float32)
    for i in range(n):
        # even output 2i: 2*(k0 x[i-1] + k2 x[i] + k4 x[i+1])
        for k, off in ((0, -1), (2, 0), (4, 1)):
            j = i + off
            if j < 0:
                j = 1
            elif j >= n:
                j = n - 1
            U[j, 2 * i] += 2.0 * ppyr._K5[k]
        # odd output 2i+1: 2*(k1 x[i] + k3 x[i+1])
        for k, off in ((1, 0), (3, 1)):
            j = min(i + off, n - 1)
            U[j, 2 * i + 1] += 2.0 * ppyr._K5[k]
    return U


def pyr_down_mm(x):
    n_h, n_w = x.shape[1], x.shape[2]
    A = jnp.asarray(down_mat(n_h), x.dtype)
    Bm = jnp.asarray(down_mat(n_w), x.dtype)
    t = jax.lax.dot_general(x, A, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [C, W, H2]
    o = jax.lax.dot_general(t.astype(x.dtype), Bm,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [C, H2, W2]
    return o.astype(x.dtype)


def gp_mm(x, levels):
    pyr = [x]
    for _ in range(levels):
        pyr.append(pyr_down_mm(pyr[-1]))
    return pyr


def checksum(pyr):
    return sum(g[:, 1, ::31].astype(jnp.float32).sum() for g in pyr)


@jax.jit
def run_sa(xs):
    return jax.lax.map(
        lambda x: checksum(ppyr.gaussian_pyramid_p(x, LEVELS)), xs)


@jax.jit
def run_mm(xs):
    return jax.lax.map(lambda x: checksum(gp_mm(x, LEVELS)), xs)


def main():
    rng = np.random.default_rng(0)
    xs = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (R, C, H, W)).astype(np.float32)
        .astype(jnp.bfloat16)))
    # correctness single level
    x0 = xs[0]
    a = np.asarray(ppyr.pyr_down_p(x0).astype(jnp.float32))
    b = np.asarray(pyr_down_mm(x0).astype(jnp.float32))
    u_a = np.asarray(ppyr.pyr_up_p(ppyr.pyr_down_p(x0).astype(jnp.float32)))
    print("down max abs diff:", np.abs(a - b).max())
    for name, fn in (("shifted-add", run_sa), ("matmul", run_mm)):
        np.asarray(fn(xs))
        t0 = time.perf_counter()
        iters = 8
        outs = [tuple(np.asarray(fn(xs + i * 0.001)).tolist())
                for i in range(iters)]
        dt = (time.perf_counter() - t0) / (iters * R) * 1e3
        assert len(set(outs)) >= 2
        print(f"{name:12s}: {dt:6.2f} ms per pyramid ({C}x{H}x{W}, "
              f"{LEVELS} levels)", flush=True)


if __name__ == "__main__":
    main()
