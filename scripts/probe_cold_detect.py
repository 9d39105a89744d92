"""Isolate the cold find_features cost: upload vs program load vs execute."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
T0 = time.perf_counter()
def mark(s): print(f"{time.perf_counter()-T0:8.2f}  {s}", flush=True)
from stitchingvideo_tpu.utils.timing import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, imageio.v3 as iio
mark(f"jax ready {jax.devices()}")
from stitchingvideo_tpu.config import StitchConfig
from stitchingvideo_tpu.register.pipeline import _batched_detector, _pad_to_bucket
cfg = StitchConfig()
fc = cfg.features
REF = "/root/reference/stitching/OpenCV2.4.11-Stitching/Release/output1"
frames = [np.asarray(iio.imread(f"{REF}/img-{i}.jpg"))[..., :3] for i in range(6)]
# mimic compute_features work-scale resize
from stitchingvideo_tpu.models.stitcher import _scale_for, _resize_all
h0, w0 = frames[0].shape[:2]
ws = _scale_for(cfg.scales.work_megapix, w0, h0)
imgs = _resize_all(frames, ws)
a = np.stack(imgs).astype(np.float32)
gray_np = np.clip(np.round(a[...,0]*0.299 + a[...,1]*0.587 + a[...,2]*0.114),
                  0, 255).astype(np.uint8)
mark("host gray done")
batch = jnp.asarray(np.stack([_pad_to_bucket(g) for g in gray_np]))
batch.block_until_ready()
mark(f"upload synced {batch.shape} {batch.dtype}")
det = "harris" if fc.kind in ("harris_brief", "grad") else "fast"
desc_kind = "grad" if fc.kind == "grad" else "brief"
h_t, w_t = imgs[0].shape[:2]
ext = jnp.asarray([h_t, w_t], jnp.int32); ext.block_until_ready()
fn = _batched_detector(fc.max_keypoints, fc.border, fc.grid, det, desc_kind)
thr = fc.fast_threshold if det == "fast" else 1.0
t0 = time.perf_counter()
# trace+lower+cached-compile-load without execute:
lowered = fn.lower(batch, thr, ext)
mark(f"lowered ({time.perf_counter()-t0:.2f}s)")
t0 = time.perf_counter()
compiled = lowered.compile()
mark(f"compiled/loaded ({time.perf_counter()-t0:.2f}s)")
t0 = time.perf_counter()
out = compiled(batch, thr, ext)
jax.block_until_ready(out)
mark(f"first execute ({time.perf_counter()-t0:.2f}s)")
t0 = time.perf_counter()
out = compiled(batch, thr, ext)
jax.block_until_ready(out)
mark(f"second execute ({time.perf_counter()-t0:.2f}s)")
t0 = time.perf_counter()
sm = np.asarray(out["small"])
mark(f"fetch small ({time.perf_counter()-t0:.2f}s) {sm.shape}")
