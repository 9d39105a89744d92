"""A/B harness for the micro-batched mat2 kernel's window-DMA layout.

Compares, on the real-registration LUT (reference footage):
  map1   — jax.lax.map over the single-frame kernel (bench.py's headline)
  perb   — batched kernel, per-frame window DMAs ([B,K,N,3,H,W] layout)
  fused  — batched kernel, one strided window DMA per tile slot
           ([K,N,B,3,H,W] layout)

Methodology matches bench.py run_timing: distinct inputs per iteration and a
checksum fetch per step so the relay cannot memoize or defer.
"""
import time

import numpy as np

from stitchingvideo_tpu.utils.timing import enable_compilation_cache

enable_compilation_cache()

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from bench import load_frames                                 # noqa: E402
from stitchingvideo_tpu.config import StitchConfig            # noqa: E402
from stitchingvideo_tpu.ops.pallas.composite_mat2 import (    # noqa: E402
    composite_mat2_planar, composite_mat2_planar_batched)
from stitchingvideo_tpu.video.runtime import VideoStitcher    # noqa: E402


def _reg_cache_path(cfg: StitchConfig, frames) -> str:
    """Registration cache keyed on the config AND the frame content, so a
    stale cache from different footage or settings can never skew the A/B
    (ADVICE r3: an unconditional /tmp/ab_reg.npz load did exactly that)."""
    import hashlib
    h = hashlib.sha256(repr(cfg).encode())
    for f in frames:
        h.update(np.asarray(f[::97, ::97]).tobytes())   # cheap content probe
    return f"/tmp/ab_reg_{h.hexdigest()[:16]}.npz"


def main():
    frames, src = load_frames()
    assert src == "reference_footage", src
    cfg = StitchConfig()
    vs = VideoStitcher(cfg)
    t0 = time.perf_counter()
    import os
    reg_cache = _reg_cache_path(cfg, frames)
    if os.path.exists(reg_cache):
        vs.load_registration(reg_cache)
    else:
        vs.register(frames, seed=0)
        vs.save_registration(reg_cache)
    print(f"register {time.perf_counter() - t0:.1f}s")
    assert vs._tlut is not None and vs._tlut[0] == "mat2", vs._tlut[0]
    ml = vs._tlut[1]

    n, fh, fw = len(frames), frames[0].shape[0], frames[0].shape[1]
    rng = np.random.default_rng(1)
    B = 16
    batches = [jax.device_put(jnp.asarray(
        rng.integers(-128, 127, (B, n, 3, fh, fw), np.int8)))
        for _ in range(4)]

    # state passed as an ARGUMENT (a closure would bake the multi-GB LUT
    # into the executable as constants)
    @jax.jit
    def step_map1(fb, s):
        outs = jax.lax.map(lambda f: composite_mat2_planar(f, s), fb)
        return outs[:, :, 301, ::401].astype(jnp.int32).sum(axis=(1, 2))

    @jax.jit
    def step_perb(fb, s):
        outs = composite_mat2_planar_batched(fb, s, fused_dma=False)
        return outs[:, :, 301, ::401].astype(jnp.int32).sum(axis=(1, 2))

    @jax.jit
    def step_fused(fb, s):
        outs = composite_mat2_planar_batched(fb, s, fused_dma=True)
        return outs[:, :, 301, ::401].astype(jnp.int32).sum(axis=(1, 2))

    def timeit(name, fn, iters=8):
        for b in batches:
            np.asarray(fn(b, ml))
        t0 = time.perf_counter()
        sums = [tuple(np.asarray(fn(batches[i % len(batches)], ml))
                      .ravel().tolist()) for i in range(iters)]
        dt = (time.perf_counter() - t0) / (iters * B)
        # anti-memoization gate: distinct input batches must yield distinct
        # checksum TUPLES (individual scalar sums of sampled noise collide
        # by pigeonhole; the 16-tuple cannot)
        assert len(set(sums)) >= min(len(batches), iters), \
            "outputs not distinct across input batches"
        print(f"{name}: {1.0 / dt:.1f} fps ({dt * 1e3:.2f} ms/frame)")
        return 1.0 / dt

    # correctness cross-check on device before timing — a divergent variant
    # must never be benchmarked (ADVICE r3: the match rate was only printed)
    ref = np.asarray(step_map1(batches[0], ml))
    for nm, fn in (("perb", step_perb), ("fused", step_fused)):
        got = np.asarray(fn(batches[0], ml))
        same = (got == ref).mean()
        print(f"{nm} checksum match vs map1: {same:.4f}")
        assert same == 1.0, f"{nm} diverges from map1 — aborting timing"

    timeit("map1 ", step_map1)
    timeit("perb ", step_perb)
    timeit("fused", step_fused)


if __name__ == "__main__":
    main()
