"""Cold-registration breakdown: fresh process, populated cache, per-stage
spans + total. Run from anywhere; cache dir resolves from package __file__."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
T0 = time.perf_counter()
def mark(s):
    print(f"{time.perf_counter()-T0:8.2f}  {s}", flush=True)
from stitchingvideo_tpu.utils.timing import enable_compilation_cache, GLOBAL_TRACER
enable_compilation_cache()
import jax
mark(f"jax ready: {jax.devices()}")
import numpy as np, imageio.v3 as iio
from stitchingvideo_tpu.config import StitchConfig
from stitchingvideo_tpu.video.runtime import VideoStitcher
REF = "/root/reference/stitching/OpenCV2.4.11-Stitching/Release/output1"
frames = [np.asarray(iio.imread(f"{REF}/img-{i}.jpg"))[..., :3] for i in range(6)]
mark("frames loaded")
vs = VideoStitcher(StitchConfig())
t0 = time.perf_counter()
vs.register(frames, seed=0)
mark(f"register done ({time.perf_counter()-t0:.2f}s)")
for k, v in GLOBAL_TRACER.report().items():
    print(f"  {k:26s} {v}")
