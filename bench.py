"""Benchmark: per-frame composite fps + registration latency.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": ...,
   "registration_cold_s": ..., "registration_warm_s": ...,
   "registration_stages": {...}, ...}

Baselines (BASELINE.md, reference 32-bit RT driver logs):
  hot loop 26-60 ms/frame -> ~17-38 fps (best 38) on its 2016 CPU;
  registration (cold or re-register) 23.7-26.1 s.
Targets (BASELINE.json): >=60 fps composite on one v5e chip; ~1 s-class
registration.

What is benched:
  1. Registration: VideoStitcher.register() — the full RT slow path
     (features -> matching -> BA -> wave -> seams -> gains -> warp fields ->
     composite LUT -> materialized Pallas weights), cold (first call incl.
     compiles) and warm (re-registration, the reference's 30 s cycle path).
     Uses the reference repo's real 6-camera 1080p footage when mounted.
  2. Composite fps: the per-frame hot loop through the REAL registration's
     materialized LUT (micro-batched planar int8, the serving shape).
     Falls back to a synthetic cylindrical 5-cam LUT if no footage.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FPS = 38.0
BASELINE_REG_S = 26.1
REF_DIR = "/root/reference/stitching/OpenCV2.4.11-Stitching/Release/output1"


def load_frames():
    """Reference 6-cam 1080p footage, or synthetic frames if unmounted."""
    if os.path.isdir(REF_DIR):
        import imageio.v3 as iio
        return [np.asarray(iio.imread(f"{REF_DIR}/img-{i}.jpg"))[..., :3]
                for i in range(6)], "reference_footage"
    rng = np.random.default_rng(0)
    return list(rng.integers(0, 255, (5, 1080, 1920, 3), np.uint8)), "synthetic"


def synthetic_lut(n_cams=5, fh=1080, fw=1920, pano_h=1280, pano_w=7168):
    """Cylindrical 5-cam 360° LUT (fallback when no footage is mounted)."""
    import jax.numpy as jnp
    from stitchingvideo_tpu.video.lut import CompositeLUT

    xx = np.arange(pano_w, dtype=np.float32)[None, :]
    yy = np.arange(pano_h, dtype=np.float32)[:, None]
    theta = (xx / pano_w) * 2 * np.pi - np.pi
    f = pano_w / (2 * np.pi)
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
    return CompositeLUT(
        cam_idx=jnp.asarray(np.where(valid, cam, -1).astype(np.int32)),
        src_x=jnp.asarray(src_x.astype(np.float32)),
        src_y=jnp.asarray(np.broadcast_to(src_y, (pano_h, pano_w))
                          .astype(np.float32)),
        gain=jnp.asarray(np.broadcast_to(gain, (pano_h, pano_w))
                         .astype(np.float32)))


_COLD_CHILD = None   # live cold-sample subprocess, killed by the watchdog


def relay_settle(max_wait_s: float = 600.0, fast_s: float = 5.0):
    """Wait until the TPU relay has digested prior sessions' teardown.

    Measured relay behavior (round-5 cold-start postmortem): the session
    AFTER a heavy one (many/large loaded executables) blocks at its first
    device op until the relay finishes digesting the previous session —
    a tiny probe program has measured 1.8 s on a settled relay and 189 s
    right after a heavy session, with identical code. A cold-registration
    sample taken during that window measures the relay's indigestion, not
    this framework. This loop runs tiny fresh-process probes until one
    completes fast (settled) or the budget expires; each probe itself
    loads only a ~KB executable so it adds no meaningful debt.

    Returns the list of probe durations (diagnostic, recorded in the bench
    JSON as relay_settle_probes).
    """
    import subprocess
    import sys
    code = (
        # Time ONLY backend-init + the device op: the import block is
        # host-load-sensitive (tens of seconds on a busy machine) and says
        # nothing about the relay, so including it makes the settle loop
        # misread host contention as relay indigestion.
        "import time\n"
        "import jax, jax.numpy as jnp, numpy as np\n"
        "t0 = time.perf_counter()\n"
        "np.asarray(jnp.zeros(2048, jnp.uint8) + 1)\n"
        "print('PROBE_S', time.perf_counter() - t0)\n")
    deadline = time.monotonic() + max_wait_s
    probes = []
    while time.monotonic() < deadline:
        budget = max(10.0, deadline - time.monotonic())
        t = None
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True, text=True, timeout=budget).stdout
            for line in out.splitlines():
                if line.startswith("PROBE_S "):
                    t = float(line.split()[1])
        except subprocess.TimeoutExpired:
            pass
        probes.append(round(t, 2) if t is not None else None)
        if t is not None and t < fast_s:
            break
        time.sleep(5.0)
    return probes


def cold_registration_subprocess(timeout_s: float = 1200.0):
    """One fresh-process cold registration; returns seconds or None.

    Cold-start on the remote TPU relay is a lottery: identical code with an
    identical warm persistent cache has measured 15.6 s and 466 s minutes
    apart (relay-server compile-queue jitter, not local cache misses). A
    single sample is therefore not a measurement. This runs one cold in a
    fully fresh process BEFORE the main process initializes its TPU client
    (no concurrent device clients); the main process's own first register()
    is the second independent sample. bench reports the min and records both
    raw values — the same best-of methodology as the warm measurement.
    """
    import subprocess
    import sys
    code = (
        "import time\n"
        "from stitchingvideo_tpu.utils.timing import enable_compilation_cache\n"
        "enable_compilation_cache()\n"
        "from bench import load_frames\n"
        "from stitchingvideo_tpu.config import StitchConfig\n"
        "from stitchingvideo_tpu.video.runtime import VideoStitcher\n"
        "frames, src = load_frames()\n"
        "assert src == 'reference_footage'\n"
        "vs = VideoStitcher(StitchConfig())\n"
        "t0 = time.perf_counter()\n"
        "vs.register(frames, seed=0)\n"
        "print('COLD_S', time.perf_counter() - t0)\n")
    global _COLD_CHILD
    try:
        proc = subprocess.Popen(
            [sys.executable, "-c", code],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        _COLD_CHILD = proc
        try:
            out, _err = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.communicate()
            return None
        for line in out.splitlines():
            if line.startswith("COLD_S "):
                return float(line.split()[1])
    except Exception:
        pass
    finally:
        _COLD_CHILD = None
    return None


def bench_registration(frames):
    """(cold_s, warm_s, stage_breakdown, VideoStitcher with live state)."""
    from stitchingvideo_tpu.config import StitchConfig
    from stitchingvideo_tpu.utils.timing import GLOBAL_TRACER
    from stitchingvideo_tpu.video.runtime import VideoStitcher

    vs = VideoStitcher(StitchConfig())
    t0 = time.perf_counter()
    vs.register(frames, seed=0)
    cold = time.perf_counter() - t0

    # three warm re-registrations; report the best (the remote TPU relay
    # adds multi-second jitter per run, and a one-off shape-bucket crossing
    # recompiles a graph — the final repeat-seed run has every bucket warm,
    # which is what the 30 s re-registration cycle pays in equilibrium).
    # Every run gets DISTINCT frame values (photometric jitter) so a
    # value-memoizing relay cannot serve a cached registration; the repeated
    # seed only keeps the RANSAC sampling, hence the shape buckets, stable.
    rng = np.random.default_rng(7)
    warm = float("inf")
    stages = {}
    for seed in (1, 2, 1):
        jittered = [np.clip(f.astype(np.int16) +
                            rng.integers(-1, 2, f.shape), 0,
                            255).astype(np.uint8) for f in frames]
        GLOBAL_TRACER.spans.clear()
        t0 = time.perf_counter()
        vs.register(jittered, seed=seed)
        w = time.perf_counter() - t0
        if w < warm:
            warm = w
            stages = {k: round(v["last_s"], 3)
                      for k, v in GLOBAL_TRACER.report().items()}
    return cold, warm, stages, vs


def _arm_watchdog(result: dict, deadline_s: float):
    """Print whatever was measured and exit if the bench wedges.

    The remote TPU relay can hang indefinitely (observed: backend init
    blocking forever during a relay outage). Without this, a wedged run
    records NOTHING; with it, the partial result dict plus an error marker
    is still emitted as the one JSON line. Returns a disarm callable."""
    import threading
    done = threading.Event()

    def fire():
        if done.wait(timeout=deadline_s):
            return
        result.setdefault("error", f"watchdog: bench exceeded {deadline_s:.0f}s "
                          "(TPU relay hang?)")
        print(json.dumps(result), flush=True)
        # the cold-sample child enforces its own timeout through the parent's
        # communicate() — kill it before _exit or it runs unbounded holding
        # a TPU client, poisoning the next bench run
        child = _COLD_CHILD
        if child is not None:
            try:
                child.kill()
            except Exception:
                pass
        # exit 0: the partial JSON line is the record; a nonzero code could
        # make a driver discard it entirely
        os._exit(0)

    threading.Thread(target=fire, daemon=True).start()
    return done.set


def main():
    result = {}
    disarm = _arm_watchdog(
        result, float(os.environ.get("BENCH_DEADLINE_S", "3600")))

    import jax
    import jax.numpy as jnp

    from stitchingvideo_tpu.utils.timing import enable_compilation_cache
    enable_compilation_cache()

    frames_list, source = load_frames()

    reg_state = None
    if source == "reference_footage":
        # first fresh-process cold sample (see cold_registration_subprocess
        # docstring: relay compile-queue jitter makes one sample meaningless).
        # Each sample runs on a SETTLED relay (see relay_settle): a sample
        # taken while the relay is digesting a prior session's teardown
        # measures the relay, not the framework.
        settle_probes = relay_settle()
        result["relay_settle_probes"] = settle_probes
        cold_runs = []
        sub_cold = cold_registration_subprocess()
        if sub_cold is not None:
            cold_runs.append(sub_cold)
        result["relay_settle_probes_2"] = relay_settle()
        try:
            cold, warm, stages, vs = bench_registration(frames_list)
            cold_runs.append(cold)
            result.update({
                "registration_cold_s": round(min(cold_runs), 2),
                "registration_cold_runs": [round(c, 2) for c in cold_runs],
                "registration_warm_s": round(warm, 2),
                "registration_stages": stages,
                "reg_vs_baseline": round(BASELINE_REG_S / warm, 2),
            })
            if vs._tlut is not None and vs._tlut[0] == "mat2":
                reg_state = vs._tlut[1]
        except Exception as e:  # registration bench must not kill the fps bench
            result["registration_error"] = repr(e)[:200]

    # Relay-congestion probe: one deliberately-fresh tiny compile (a unique
    # constant baked into the HLO defeats every cache layer). On an idle
    # relay this is ~1-3 s; during relay compile-queue congestion it has
    # measured minutes. Interpret registration_cold_s against it — identical
    # code with an identical warm cache has measured 15.6 s and 466 s cold
    # minutes apart purely from this queue.
    try:
        # bypass the persistent cache so probe entries never pollute the
        # committed .jax_cache (each probe is unique-by-construction anyway)
        cache_dir = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", None)
        try:
            t0 = time.perf_counter()
            salt = float(int(time.time()) % 1000003)
            x = jnp.full((8, 128), salt, jnp.float32)
            np.asarray(jax.jit(lambda a: (a @ a.T + salt).sum())(x))
            result["relay_compile_probe_s"] = round(
                time.perf_counter() - t0, 2)
        finally:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass

    frames_np = np.stack(frames_list)
    path = "pallas_mat2_real_reg"
    if reg_state is not None:
        state = reg_state
        from stitchingvideo_tpu.ops.pallas.composite_mat2 import \
            composite_mat2_planar as _compose
        result["fallback_tiles"] = int(state.n_fallback)
        result["tg_easy"] = state.tg_easy
        result["tg_hard"] = state.tg_hard
        result["pano_hw"] = list(state.pano_hw)
    else:
        # synthetic LUT fallback (no footage or registration failed)
        try:
            from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
                build_mat2_lut as _build, composite_mat2_planar as _compose)
            path = "pallas_mat2_synthetic"
        except Exception:
            from stitchingvideo_tpu.ops.pallas.composite_mat import (
                build_mat_lut as _build, composite_mat_planar as _compose)
            path = "pallas_mat_synthetic"
        lut = jax.device_put(synthetic_lut())
        state = jax.device_put(_build(lut, frames_np.shape[1:3]))

    # Timing methodology: every iteration gets a DISTINCT input and a small
    # checksum of each output frame is fetched to host. This defeats both
    # lazy/deferred execution and value-memoizing execution layers — without
    # it a remote-TPU relay reports fantasy numbers (dead outputs never run).
    def run_timing(step_fn, st, batches, B, iters=6):
        for b in batches:                     # warmup (compiles/traces here)
            np.asarray(step_fn(b, st))
        t0 = time.perf_counter()
        sums = [tuple(np.asarray(step_fn(batches[i % len(batches)], st))
                      .ravel().tolist())
                for i in range(iters)]
        dt = (time.perf_counter() - t0) / (iters * B)
        flat = [v for t in sums for v in t]
        assert len(set(flat)) > len(flat) // 2, "outputs not distinct — invalid"
        return 1.0 / dt

    # Single-frame (B=1) latency: one dispatch + checksum fetch per frame —
    # the reference's own metric is per-frame latency ("Stitching Frame",
    # resultTime-at.txt:82; BASELINE.json "per-frame warp+blend latency").
    # On the remote relay each sample pays one RTT; p50 is the honest
    # serving latency in THIS environment, a local chip would be lower.
    def run_latency(step_fn, st, singles, iters=16):
        for s in singles:
            np.asarray(step_fn(s, st))
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            np.asarray(step_fn(singles[i % len(singles)], st))
            ts.append(time.perf_counter() - t0)
        a = np.asarray(ts) * 1e3
        return round(float(np.percentile(a, 50)), 2), \
            round(float(np.percentile(a, 95)), 2)

    rng = np.random.default_rng(1)
    n, fh, fw = frames_np.shape[:3]
    try:
        B = 16
        batches = [jax.device_put(jnp.asarray(
            rng.integers(-128, 127, (B, n, 3, fh, fw), np.int8)))
            for _ in range(4)]

        # the serving path: B frames stacked into the matmul M dimension
        # (composite_microbatch's kernel), bit-identical per frame to the
        # single-frame _compose
        from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
            MatLUT2, composite_mat2_planar_batched)

        @jax.jit
        def step(fb, s):
            if isinstance(s, MatLUT2):
                outs = composite_mat2_planar_batched(fb, s)
            else:
                outs = jax.lax.map(lambda f: _compose(f, s), fb)
            return outs[:, :, 301, ::401].astype(jnp.int32).sum(axis=(1, 2))

        fps = run_timing(step, state, batches, B)

        # secondary: throughput at B=32 — deeper matmul M-stacking for
        # latency-insensitive pipelines (measured 231 vs 197 fps at B=16
        # with the int8 kernels). B=16 stays the headline serving shape.
        try:
            from stitchingvideo_tpu.ops.pallas.composite_mat2 import \
                MatLUT2 as _ML2
            if isinstance(state, _ML2):
                b32 = [jax.device_put(jnp.asarray(
                    rng.integers(-128, 127, (32, n, 3, fh, fw), np.int8)))
                    for _ in range(2)]
                result["fps_b32"] = round(
                    run_timing(step, state, b32, 32, iters=3), 2)
                del b32              # free 2.3 GB before the later modes
        except Exception as e:
            result["fps_b32_error"] = repr(e)[:120]
    except Exception:
        # Pallas unavailable/failed (incl. at first trace in warmup):
        # demote to the exact XLA gather reference
        path = "xla_gather"
        from stitchingvideo_tpu.video.lut import composite_frame_u8
        state = jax.device_put(synthetic_lut())
        B = 1
        batches = [jax.device_put(jnp.asarray(frames_np + i)[None])
                   for i in range(4)]

        @jax.jit
        def step_g(fb, s):
            out = composite_frame_u8(fb[0], s)
            return out[None, ::301, ::401].astype(jnp.int32).sum(axis=(1, 2))

        fps = run_timing(step_g, state, batches, B)

    result.update({
        "metric": "multicam_1080p_360pano_composite_fps",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "path": path,
        "n_cams": int(frames_np.shape[0]),
        "frames_source": source,
    })

    # ---- B=1 latency + HBM roofline for the headline (mat2) path ----
    if path == "pallas_mat2_real_reg" and reg_state is not None:
        try:
            singles = [jax.device_put(jnp.asarray(
                rng.integers(-128, 127, (n, 3, fh, fw), np.int8)))
                for _ in range(4)]

            @jax.jit
            def step1(f, s):
                out = _compose(f, s)
                return out[:, 301, ::401].astype(jnp.int32).sum()

            p50, p95 = run_latency(step1, state, singles)
            result["latency_ms_p50"] = p50
            result["latency_ms_p95"] = p95

            # HBM traffic accounting for one frame through the mat2 path
            # (v5e peak ~819 GB/s). Components:
            #   shift_planar: read frames once, write N_SHIFTS copies
            #   kernel: weight streams (vx/vy/gcs, read once) + window DMAs
            #           (2 slots x 3ch x win_h x VXW int8 per tile) + f32
            #           tile-block output
            #   untile: f32 read + u8 write (+ u8 transpose read/write)
            from stitchingvideo_tpu.ops.pallas.composite_mat2 import (
                GROUP, MB_CHUNK, N_SHIFTS, VXW, WIN_HE, WIN_HH)
            fbytes = n * 3 * fh * fw
            weights = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                          for cl in (state.easy, state.hard)
                          for a in (cl.vx, cl.vy, cl.gcs))
            windows = (state.tg_easy * GROUP * 2 * 3 * WIN_HE * VXW +
                       state.tg_hard * GROUP * 2 * 3 * WIN_HH * VXW)
            out_px = 3 * state.pano_hw[0] * state.pano_hw[1]
            traffic = ((1 + N_SHIFTS) * fbytes  # shift: read 1x, write Kx
                       + windows                # window DMAs (exact bytes)
                       + weights // MB_CHUNK    # streamed once per chunk
                       + 2 * out_px * 4 + 2 * out_px)
            # windows counts the bytes landed in VMEM; the HBM-side reads of
            # the shifted copies are the same bytes (overlap between windows
            # is re-read, uncovered rows unread — the two roughly cancel).
            gbps = traffic * fps / 1e9
            result["hbm_bytes_frame"] = int(traffic)
            result["hbm_gbps"] = round(gbps, 1)
            result["hbm_frac"] = round(gbps / 819.0, 3)
        except Exception as e:
            result["latency_error"] = repr(e)[:200]

    # ---- serial streaming path: K-deep pipelined B=1 dispatches ----
    # (VERDICT r3 item 4, r4 item 3.) Same bounded-lag contract as
    # video/stream.StreamingComposer: frame i's checksum is fetched before
    # frame i+K is submitted, so the dispatch RTT and the kernel overlap
    # instead of serializing. Inputs are pre-staged device-resident (as in
    # run_timing) so relay H2D bandwidth doesn't cap the measurement.
    # copy_to_host_async at dispatch is what makes the overlap real through
    # the relay: a synchronous delivery-time fetch costs a ~26 ms RTT that
    # nothing overlaps (round-4's 35 fps mystery — scripts/probe_serial.py
    # A-E isolate it); with the copy in flight delivery runs at kernel rate.
    if path == "pallas_mat2_real_reg" and reg_state is not None:
        try:
            from collections import deque

            @jax.jit
            def step_s(f, s):
                out = _compose(f, s)
                return out[:, 301, ::401].astype(jnp.int32).sum()

            for s_ in singles:
                np.asarray(step_s(s_, state))          # warmup
            depth, N = 8, 48    # probe-verified: copies land within ~depth
                                # frames of execute time through the relay
            q = deque()
            checks, tdel = [], []
            t0 = time.perf_counter()
            for i in range(N):
                o = step_s(singles[i % len(singles)], state)
                o.copy_to_host_async()
                q.append(o)
                if len(q) >= depth:
                    checks.append(int(np.asarray(q.popleft())))
                    tdel.append(time.perf_counter())
            while q:
                checks.append(int(np.asarray(q.popleft())))
                tdel.append(time.perf_counter())
            wall = tdel[-1] - t0
            assert len(set(checks)) >= min(len(singles), N), \
                "serial outputs not distinct — invalid"
            gaps = np.diff(np.asarray(tdel)) * 1e3
            result["serial_fps"] = round(N / wall, 2)
            result["serial_depth"] = depth
            result["serial_gap_ms_p50"] = round(
                float(np.percentile(gaps, 50)), 2)
            result["serial_gap_ms_p95"] = round(
                float(np.percentile(gaps, 95)), 2)
        except Exception as e:
            result["serial_error"] = repr(e)[:200]

    # feather-blended hot-loop mode (beyond-reference quality at video rate);
    # reuses the planar int8 batches, so only on the Pallas path
    if reg_state is not None and path == "pallas_mat2_real_reg":
        try:
            if not vs.build_feather_state((fh, fw)):
                result["feather_skipped"] = True
            else:
                from stitchingvideo_tpu.ops.pallas.composite_feather import \
                    composite_feather_planar as _fthr
                fml = vs._ftlut[1]
                result["feather_fallback_tiles"] = int(fml.n_fallback)

                @jax.jit
                def step_f(fb, s):
                    outs = jax.lax.map(lambda f: _fthr(f, s), fb)
                    return outs[:, :, 301, ::401].astype(jnp.int32) \
                        .sum(axis=(1, 2))

                result["feather_fps"] = round(
                    run_timing(step_f, fml, batches, B, iters=4), 2)

                @jax.jit
                def step_f1(f, s):
                    return _fthr(f, s)[:, 301, ::401] \
                        .astype(jnp.int32).sum()

                singles_f = [jax.device_put(jnp.asarray(
                    rng.integers(-128, 127, (n, 3, fh, fw), np.int8)))
                    for _ in range(3)]
                p50f, p95f = run_latency(step_f1, fml, singles_f, iters=10)
                result["feather_latency_ms_p50"] = p50f
                result["feather_latency_ms_p95"] = p95f
        except Exception as e:
            result["feather_error"] = repr(e)[:200]

    # multiband video mode (true Laplacian blending per frame). The feather
    # state (~5 GB of per-slot weights), the mat2 state (~2.4 GB) and the
    # int8 fps batches (~2.4 GB) must be freed first — all three plus the
    # multiband pyramids exceed HBM.
    if reg_state is not None and path == "pallas_mat2_real_reg":
        try:
            vs._ftlut = None
            vs._tlut = None
            fml = None
            state = reg_state = None
            batches = None
            singles = singles_f = None   # free the latency buffers too
            if not vs.build_multiband_state((fh, fw)):
                # a declined build (window overflow / OOM demotion) must be
                # visible in the record, not an absent key
                result["multiband_skipped"] = True
            else:
                from stitchingvideo_tpu.blend.multiband_video import (
                    multiband_video_frame as _mbf,
                    multiband_video_frames_batched as _mbfb)
                stmb, crop_yx = vs._mbtlut

                @jax.jit
                def step_m(fb, s):
                    outs = _mbfb(fb, s, crop_yx=crop_yx)
                    return outs[:, :, 301, ::401].astype(jnp.int32) \
                        .sum(axis=(1, 2))

                # planar int8 frame batches (value-128; see
                # composite_mat.frames_to_planar_i8); Bm=16 amortizes the
                # relay RTT to ~2 ms/frame and the whole band chain runs
                # batched (B in the matmul M dims). HBM headroom after the
                # pyramids is allocation-order dependent, so a
                # RESOURCE_EXHAUSTED retries at half the batch instead of
                # erasing the whole mode from the record (round-4 failure).
                mb_batches = None
                last_oom = None
                for Bm in (16, 8, 4):
                    try:
                        mb_batches = None   # free the previous attempt first
                        mb_batches = [jax.device_put(jnp.asarray(
                            rng.integers(-128, 127, (Bm, n, 3, fh, fw),
                                         np.int8))) for _ in range(3)]
                        result["multiband_fps"] = round(
                            run_timing(step_m, stmb, mb_batches, Bm,
                                       iters=3), 2)
                        result["multiband_Bm"] = Bm
                        break
                    except Exception as e:
                        if "RESOURCE_EXHAUSTED" not in repr(e):
                            raise
                        last_oom = e
                else:
                    raise last_oom

                @jax.jit
                def step_m1(f, s):
                    return _mbf(f, s, crop_yx=crop_yx)[:, 301, ::401] \
                        .astype(jnp.int32).sum()

                singles_m = [mb_batches[0][0], mb_batches[1][1]]
                p50m, p95m = run_latency(step_m1, stmb, singles_m, iters=6)
                result["multiband_latency_ms_p50"] = p50m
                result["multiband_latency_ms_p95"] = p95m
        except Exception as e:
            result["multiband_error"] = repr(e)[:200]
    disarm()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
