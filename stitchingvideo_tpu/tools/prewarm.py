"""Pre-warm the persistent compile cache for a rig spec.

Cold registration on a fresh machine costs one full XLA compile pass over
the registration pipeline (the reference binary pays ~24 s of CPU work
instead, resultTime-at.txt:68; an uncached TPU compile pass can cost more
through a remote relay). Every registration-path jit traces on BUCKETED
shapes (register/pipeline._pad_to_bucket, the sticky canvas/ROI buckets in
models/stitcher.py), so compiling ONCE for a rig spec — camera count, frame
size, compose modes — fills the persistent cache (utils/timing.
enable_compilation_cache) for every rig whose scaled shapes land in the
same buckets. Run this at deploy time (or bake the cache into the image):

    python -m stitchingvideo_tpu.tools.prewarm --cams 6 --width 1920 \
        --height 1088 --modes lut,feather,multiband

A later cold `VideoStitcher.register()` on real footage of that rig shape
then loads compiled executables instead of compiling them.
"""
from __future__ import annotations

import argparse
import dataclasses
import time


def prewarm(n_cams: int, width: int, height: int,
            modes=("lut",), verbose: bool = True) -> dict:
    """Register + composite a synthetic rig of the given spec once per
    compose mode. Returns per-stage seconds."""
    import numpy as np

    from ..config import StitchConfig
    from ..utils import synthetic
    from ..utils.timing import enable_compilation_cache
    from ..video.runtime import VideoStitcher

    enable_compilation_cache()
    views, *_ = synthetic.make_scene(n=n_cams, img_wh=(width, height),
                                     fov_deg=55, overlap_frac=0.4, seed=7)
    views = [np.asarray(v) for v in views]
    times = {}
    for mode in modes:
        cfg = StitchConfig()
        cfg = cfg.replace(video=dataclasses.replace(
            cfg.video, compose_mode=mode))
        vs = VideoStitcher(cfg)
        t0 = time.perf_counter()
        vs.register(views, seed=0)
        times[f"register_{mode}_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        vs.composite(views)
        times[f"composite_{mode}_s"] = round(time.perf_counter() - t0, 2)
        if verbose:
            print(f"mode={mode}: register {times[f'register_{mode}_s']} s, "
                  f"composite {times[f'composite_{mode}_s']} s", flush=True)
    return times


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cams", type=int, default=6)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--modes", default="lut",
                    help="comma list of compose modes to warm "
                         "(lut,feather,multiband)")
    args = ap.parse_args(argv)
    times = prewarm(args.cams, args.width, args.height,
                    tuple(m.strip() for m in args.modes.split(",") if m))
    print(times)


if __name__ == "__main__":
    main()
