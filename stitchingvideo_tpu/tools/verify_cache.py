"""Verify (or populate) the committed compile cache for cold registration.

Round-4 postmortem (VERDICT r4 weak #1): the committed `.jax_cache` was a
hand-synced artifact; late kernel edits silently invalidated registration-path
entries and cold registration collapsed from 11.8 s to 72-222 s. Nothing
*verified* that the cache covers a fresh process, so it rotted every round.

This tool makes the cache a generated, verified artifact:

    # 1. regenerate: fresh process registers once, every compile (min
    #    compile time 0) lands in the cache
    python -m stitchingvideo_tpu.tools.verify_cache --populate

    # 2. verify: fresh process registers again; ANY new cache entry means a
    #    registration-path program compiled instead of loading -> exit 1,
    #    naming the offending entries
    python -m stitchingvideo_tpu.tools.verify_cache

Run both on the real TPU (the cache is TPU-only; the CPU backend opts out in
enable_compilation_cache) as the LAST step before committing `.jax_cache`.
Pass --modes feather,multiband to also cover the blend-state builds.

The registration exercised is exactly bench.py's cold path: a fresh
`VideoStitcher(StitchConfig()).register()` on the reference 6-camera footage
(reference Release/output1/img-*.jpg), the rig whose cold time BENCH gates
against the 2016 binary's 23.7-26.1 s (Release/resultTime-at.txt:68).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REF_DIR = "/root/reference/stitching/OpenCV2.4.11-Stitching/Release/output1"

_CHILD_CODE = r"""
import sys, time
from stitchingvideo_tpu.utils.timing import enable_compilation_cache
enable_compilation_cache()
import jax
if jax.default_backend() == "cpu":
    print("VERIFY_SKIP cpu backend (cache is TPU-only)")
    sys.exit(3)
# surface EVERY compile as a cache write, however fast
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
import imageio.v3 as iio
from stitchingvideo_tpu.config import StitchConfig
from stitchingvideo_tpu.video.runtime import VideoStitcher
frames = [np.asarray(iio.imread(f"{ref_dir}/img-{i}.jpg"))[..., :3]
          for i in range(6)]
vs = VideoStitcher(StitchConfig())
t0 = time.perf_counter()
vs.register(frames, seed=0)
print("COLD_S", round(time.perf_counter() - t0, 2))
fh, fw = frames[0].shape[:2]
for mode in modes:
    t0 = time.perf_counter()
    if mode == "feather":
        ok = vs.build_feather_state((fh, fw))
    elif mode == "multiband":
        ok = vs.build_multiband_state((fh, fw))
    else:
        continue
    print("MODE_S", mode, ok, round(time.perf_counter() - t0, 2))
"""


def cache_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def _listing(d: str) -> set:
    return set(os.listdir(d)) if os.path.isdir(d) else set()


def run_fresh_registration(modes=(), timeout_s: float = 1800.0):
    """One fresh-process cold registration; returns (rc, stdout+stderr)."""
    ref = REF_DIR.replace('"', '')
    code = (f"ref_dir = {ref!r}\nmodes = {tuple(modes)!r}\n" + _CHILD_CODE)
    repo = os.path.dirname(cache_dir())
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo,
                          capture_output=True, text=True, timeout=timeout_s)
    return proc.returncode, proc.stdout + proc.stderr


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--populate", action="store_true",
                    help="fill the cache instead of verifying it")
    ap.add_argument("--modes", default="",
                    help="extra blend states to cover: feather,multiband")
    ap.add_argument("--timeout", type=float, default=1800.0)
    args = ap.parse_args(argv)
    modes = tuple(m.strip() for m in args.modes.split(",") if m.strip())

    if not os.path.isdir(REF_DIR):
        print("verify_cache: reference footage not mounted; nothing to do")
        return 0

    d = cache_dir()
    before = _listing(d)
    t0 = time.perf_counter()
    rc, out = run_fresh_registration(modes, args.timeout)
    wall = time.perf_counter() - t0
    print(out.strip())
    if rc == 3:
        return 0            # CPU backend: cache does not apply
    if rc != 0:
        print(f"verify_cache: registration process failed rc={rc}")
        return rc
    new = sorted(_listing(d) - before)

    if args.populate:
        print(f"populate: {len(new)} new cache entries "
              f"({len(before)} existing), wall {wall:.1f}s")
        for n in new:
            print(f"  + {n}")
        return 0

    if new:
        print(f"VERIFY FAIL: {len(new)} registration-path program(s) "
              "COMPILED in a fresh process (cache incomplete/stale):")
        for n in new:
            print(f"  + {n}")
        print("fix: re-run with --populate, commit .jax_cache, verify again")
        return 1
    print(f"VERIFY OK: zero compiles in a fresh-process registration "
          f"(wall {wall:.1f}s, cache {len(before)} entries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
