"""Benchmark: 5-camera 1080p -> 360° panorama per-frame composite fps.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": ...}

Baseline: the reference RT driver's measured hot loop, 26-60 ms/frame ->
~17-38 fps on its 2016 CPU (BASELINE.md); we normalize against its best
(38 fps). Target from BASELINE.json: >=60 fps on one v5e chip.

The benched step is the reference-parity hot path (StitchingAll :724-770):
per-frame multi-camera bilinear gather through the cached composite LUT with
per-pixel gain — device-resident, steady-state (post-compile), averaged.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 38.0


def build_state(n_cams=5, fh=1080, fw=1920, pano_h=1280, pano_w=7168):
    """Realistic composite LUT: 5 cameras cylindrically spread over a 360°
    canvas (~9.2 MP), built through the real registration-state machinery.
    Panorama scale = focal (the reference's warped_image_scale rule), so
    source-vs-output sampling stays near 1:1 like a real registration."""
    import jax.numpy as jnp
    from stitchingvideo_tpu.video.lut import CompositeLUT

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (n_cams, fh, fw, 3), np.uint8)

    # cylindrical backward map per pano pixel: camera = nearest by yaw
    xx = np.arange(pano_w, dtype=np.float32)[None, :]
    yy = np.arange(pano_h, dtype=np.float32)[:, None]
    theta = (xx / pano_w) * 2 * np.pi - np.pi            # [-pi, pi)
    f = pano_w / (2 * np.pi)                             # scale == focal
    yaw_step = 2 * np.pi / n_cams
    cam = np.clip(np.round((theta + np.pi - yaw_step / 2) / yaw_step), 0,
                  n_cams - 1).astype(np.int32)
    cam = np.broadcast_to(cam, (pano_h, pano_w)).copy()
    local = theta - (cam * yaw_step - np.pi + yaw_step / 2)
    src_x = np.float32(f) * np.tan(local) + fw / 2
    v = (yy / pano_h - 0.5) * (fh / f * 1.1)
    src_y = np.broadcast_to(np.float32(f) * v / np.cos(local) + fh / 2,
                            (pano_h, pano_w))
    valid = (src_x >= 0) & (src_x < fw - 1) & (src_y >= 0) & (src_y < fh - 1)
    gain = (1.0 + 0.05 * np.sin(xx / 57.0)).astype(np.float32)
    lut = CompositeLUT(
        cam_idx=jnp.asarray(np.where(valid, cam, -1).astype(np.int32)),
        src_x=jnp.asarray(src_x.astype(np.float32)),
        src_y=jnp.asarray(np.broadcast_to(src_y, (pano_h, pano_w)).astype(np.float32)),
        gain=jnp.asarray(np.broadcast_to(gain, (pano_h, pano_w)).astype(np.float32)))
    return frames, lut


def main():
    import jax
    import jax.numpy as jnp

    frames_np, lut = build_state()
    lut = jax.device_put(lut)

    # Prefer the materialized Pallas MXU composite; fall back to XLA gather.
    # The LUT is a jit *argument* (a closure would inline GBs of constants
    # into the program). Frames stream MICRO-BATCHED (B per execution) —
    # the production serving shape; it also amortizes the ~35 ms
    # per-execution overhead of the remote-TPU relay in this environment.
    B = 16
    rng = np.random.default_rng(1)
    path = "pallas_mat2"
    try:
        try:
            from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
                build_mat2_lut as _build, composite_mat2_planar as _compose)
        except Exception:
            from stitchingvideo_tpu.ops.pallas.composite_mat import (
                build_mat_lut as _build, composite_mat_planar as _compose)
            path = "pallas_mat"
        state = jax.device_put(_build(lut, frames_np.shape[1:3]))
        if int(state.n_fallback) != 0:
            raise RuntimeError(f"{int(state.n_fallback)} fallback tiles")
        n, fh, fw = frames_np.shape[:3]
        batches = [jax.device_put(jnp.asarray(
            rng.integers(-128, 127, (B, n, 3, fh, fw), np.int8)))
            for _ in range(4)]

        @jax.jit
        def step(fb, s):
            outs = jax.lax.map(lambda f: _compose(f, s), fb)
            return outs[:, :, 301, ::401].astype(jnp.int32).sum(axis=(1, 2))
    except Exception:
        path = "xla_gather"
        from stitchingvideo_tpu.video.lut import composite_frame_u8
        state = lut
        B = 1
        batches = [jax.device_put(jnp.asarray(frames_np + i)[None])
                   for i in range(4)]

        @jax.jit
        def step(fb, s):
            out = composite_frame_u8(fb[0], s)
            return out[None, ::301, ::401].astype(jnp.int32).sum(axis=(1, 2))

    # Timing methodology: every iteration gets a DISTINCT input and a small
    # checksum of each output frame is fetched to host. This defeats both
    # lazy/deferred execution and value-memoizing execution layers — without
    # it a remote-TPU relay reports fantasy numbers (dead outputs never run).
    for b in batches:
        np.asarray(step(b, state))
    iters = 6
    t0 = time.perf_counter()
    all_sums = [tuple(np.asarray(step(batches[i % 4], state)))
                for i in range(iters)]
    dt = (time.perf_counter() - t0) / (iters * B)
    flat = [v for t in all_sums for v in t]
    assert len(set(flat)) > len(flat) // 2, "outputs not distinct — invalid"
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "5cam_1080p_360pano_composite_fps",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "path": path,
    }))


if __name__ == "__main__":
    main()
