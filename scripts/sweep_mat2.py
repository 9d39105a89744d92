"""Parameter sweep for the mat2 kernel (round-4 item 5).

Each config runs in a fresh subprocess (module constants are baked into
traces at first jit). Usage: python scripts/sweep_mat2.py [WIN_HE [VY_DTYPE]]
with no args runs the sweep driver.
"""
import subprocess
import sys
import time

CONFIGS = [(32, "f32"), (24, "f32"), (40, "f32"), (32, "bf16")]


def run_one(win_he: int, vy_dtype: str, B: int = 16) -> None:
    import numpy as np

    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    from stitchingvideo_tpu.ops.pallas import composite_mat2 as m2
    m2.WIN_HE = win_he           # build-time constant (fresh subprocess)
    vy_bf16 = vy_dtype == "bf16"
    mm_int8 = vy_dtype == "i8"

    from bench import load_frames
    from stitchingvideo_tpu.config import StitchConfig
    from stitchingvideo_tpu.video.runtime import VideoStitcher
    sys.path.insert(0, "/root/repo/scripts")
    from ab_mat2_dma import _reg_cache_path

    frames, src = load_frames()
    assert src == "reference_footage"
    cfg = StitchConfig()
    vs = VideoStitcher(cfg)
    import os
    rc = _reg_cache_path(cfg, frames)
    if os.path.exists(rc):
        vs.load_registration(rc)
    else:
        vs.register(frames, seed=0)
        vs.save_registration(rc)
    kind, ml = vs._tlut
    assert kind == "mat2", kind
    print(f"win_he={win_he} vy={vy_dtype}: tg_easy={ml.tg_easy} "
          f"tg_hard={ml.tg_hard} n_fb={ml.n_fb}", flush=True)

    n, fh, fw = len(frames), frames[0].shape[0], frames[0].shape[1]
    rng = np.random.default_rng(1)
    batches = [jax.device_put(jnp.asarray(
        rng.integers(-128, 127, (B, n, 3, fh, fw), np.int8)))
        for _ in range(4)]

    @jax.jit
    def step(fb, s):
        outs = m2.composite_mat2_planar_batched(fb, s, fused_dma=True,
                                                vy_bf16=vy_bf16,
                                                mm_int8=mm_int8)
        return outs[:, :, 301, ::401].astype(jnp.int32).sum(axis=(1, 2))

    for b in batches:
        np.asarray(step(b, ml))
    t0 = time.perf_counter()
    iters = 8
    sums = [tuple(np.asarray(step(batches[i % len(batches)], ml))
                  .ravel().tolist()) for i in range(iters)]
    dt = (time.perf_counter() - t0) / (iters * B)
    assert len(set(sums)) >= min(len(batches), iters), "not distinct"
    print(f"win_he={win_he} vy={vy_dtype} B={B}: {1.0/dt:.1f} fps "
          f"({dt*1e3:.2f} ms/frame)", flush=True)


def main():
    if len(sys.argv) > 1:
        run_one(int(sys.argv[1]),
                sys.argv[2] if len(sys.argv) > 2 else "f32",
                int(sys.argv[3]) if len(sys.argv) > 3 else 16)
        return
    for win_he, vy in CONFIGS:
        r = subprocess.run([sys.executable, __file__, str(win_he), vy],
                           capture_output=True, text=True, timeout=580)
        for line in (r.stdout + r.stderr).splitlines():
            if "fps" in line or "tg_" in line or "Error" in line:
                print(line, flush=True)


if __name__ == "__main__":
    main()
