"""Probe: can a Pallas HBM->VMEM async copy start at a 32-aligned (not
128-aligned) lane offset, and at what speed? Decides whether the mat2
pipeline can drop the shift_planar_bn stage (VERDICT r3 item 5)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1088, 1920
NWIN = 512          # windows per call
WIN_H, VXW = 32, 256


def make_kernel(align):
    def kernel(org_ref, frames_ref, out_ref, win, sem):
        t = pl.program_id(0)
        buf = jax.lax.rem(t, 2)
        nbuf = jax.lax.rem(t + 1, 2)

        def dma(tt, b):
            oy = pl.multiple_of(org_ref[2 * tt], 8)
            ox = pl.multiple_of(org_ref[2 * tt + 1], align)
            return pltpu.make_async_copy(
                frames_ref.at[:, pl.ds(oy, WIN_H), pl.ds(ox, VXW)],
                win.at[b], sem.at[b])

        @pl.when(t == 0)
        def _():
            dma(0, 0).start()

        @pl.when(t + 1 < pl.num_programs(0))
        def _():
            dma(t + 1, nbuf).start()

        dma(t, buf).wait()
        out_ref[0, :, :] = jnp.sum(
            win[buf].astype(jnp.float32), axis=(0, 1)).reshape(2, 128)

    return kernel


@partial(jax.jit, static_argnames=("align",))
def run(frames, org, align):
    return pl.pallas_call(
        make_kernel(align),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NWIN,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 2, 128), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 3, WIN_H, VXW), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NWIN, 2, 128), jnp.float32),
    )(org, frames)


def main():
    rng = np.random.default_rng(0)
    frames = jax.device_put(jnp.asarray(
        rng.integers(-128, 127, (3, H, W), np.int8)))
    for align in (128, 32):
        oy = rng.integers(0, (H - WIN_H) // 8, NWIN) * 8
        ox = rng.integers(0, (W - VXW) // align, NWIN) * align
        org = jax.device_put(jnp.asarray(
            np.stack([oy, ox], 1).ravel().astype(np.int32)))
        try:
            out = run(frames, org, align)
            out.block_until_ready()
        except Exception as e:
            print(f"align={align}: FAILED {type(e).__name__}: {e}")
            continue
        # correctness vs numpy
        f = np.asarray(frames)
        ref = np.stack([
            f[:, y:y + WIN_H, x:x + VXW].astype(np.float32).sum(axis=(1, 2))
            .repeat(256 // 3 + 1)[:256].reshape(2, 128)
            for y, x in zip(oy, ox)])
        # (sum is per-channel broadcast; simpler: compare total sums)
        got = np.asarray(out).reshape(NWIN, -1)[:, 0] * 0 + np.asarray(
            out).sum(axis=(1, 2))
        want = np.array([
            f[:, y:y + WIN_H, x:x + VXW].astype(np.float32).sum() * 128 * 2
            / (3 * WIN_H * VXW) for y, x in zip(oy, ox)])
        # just check it's deterministic + time it; correctness via sum match
        want2 = np.array([f[:, y:y + WIN_H, x:x + VXW].astype(np.float32)
                          .sum() for y, x in zip(oy, ox)])
        got2 = np.asarray(out).sum(axis=(1, 2)) * (3 * WIN_H * VXW) / (
            3 * WIN_H * VXW)
        # out[t] = per-(sublane,lane) sum over (3, WIN_H) -> total = window sum
        ok = np.allclose(np.asarray(out).sum(axis=(1, 2)), want2)
        n_iter = 50
        t0 = time.perf_counter()
        for _ in range(n_iter):
            run(frames, org, align).block_until_ready()
        dt = (time.perf_counter() - t0) / n_iter
        gb = NWIN * 3 * WIN_H * VXW / 1e9
        print(f"align={align}: ok={ok} {dt*1e6:.0f} us/call "
              f"{gb/dt:.1f} GB/s window-read", flush=True)


if __name__ == "__main__":
    main()
