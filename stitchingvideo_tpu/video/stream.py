"""K-deep pipelined streaming compositor (the serial real-time path).

The plain hot loop (`VideoStitcher.composite`) pays one full host->device
->host round trip per frame: dispatch, kernel, fetch, serially. On a local
chip that RTT is tens of microseconds; through a remote TPU relay it has
measured ~33 ms — more than the composite kernel itself — so the serial
path was capped near ~30 fps regardless of kernel speed.

JAX dispatch is asynchronous: `device_put`, the composite kernel, and the
device->host copy of frame i all overlap with the host-side ingest and
dispatch of frames i+1..i+K-1 once the host stops blocking on each result.
`StreamingComposer` keeps a K-deep ring of in-flight frames: `submit(f)`
enqueues frame f's dispatch and returns the OLDEST completed panorama
(None while the pipeline fills). Frame i's output is delivered before
frame i+K is accepted — the same bounded-lag hot-loop contract as the
reference 64-bit driver's StitchingAll loop (stitching_detailed.cpp:
724-770), which displays frame i while the capture threads fill i+1.

Per-frame wall cost approaches max(stage time) instead of sum(stage
times); the dispatch RTT is paid once per pipeline fill, not per frame.

`device_reduce` lets a caller substitute the full-panorama fetch with a
device-side transform fetched instead (e.g. a sink that consumes a
checksum, a downscaled preview, or an on-device encoder front-end) —
bench.py uses it so throughput measurement isn't capped by relay D2H
bandwidth, exactly like its batch methodology.
"""
from __future__ import annotations

import time
from collections import deque
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["StreamingComposer"]


class StreamingComposer:
    """Pipelines single-frame composites K deep over a VideoStitcher.

    Not thread-safe (one producer). Re-registration swaps inside the
    stitcher are safe: each submit snapshots the stitcher's state exactly
    like `composite()` does, so in-flight frames finish on the LUT they
    were dispatched with.
    """

    def __init__(self, stitcher, depth: int = 3,
                 device_reduce: Optional[Callable] = None):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self._vs = stitcher
        self.depth = depth
        self._reduce = device_reduce
        self._q: deque = deque()      # (device_out, postprocess)
        self.out_times: List[float] = []   # wall time of each delivery

    # -- dispatch (async) ------------------------------------------------

    def _dispatch(self, frames: List[np.ndarray]):
        """Mirror of VideoStitcher.composite()'s mode dispatch, stopping
        BEFORE the host fetch. Returns (device_array, postprocess)."""
        vs = self._vs
        mode = vs.cfg.video.compose_mode
        with vs._lock:
            reg = vs._reg
            lut, tlut = vs._lut, vs._tlut
            ftlut, ft_reg = vs._ftlut, vs._ftlut_reg
            mbt, mb_reg = vs._mbtlut, vs._mbtlut_reg
            mbs = vs._mbtlut_sharded
        from ..ops.pallas.composite_mat import (frames_to_planar_i8,
                                                planar_to_hwc)
        if mode == "lut":
            out = vs._planar_with(
                jnp.asarray(np.stack(vs._select_frames(frames, reg))),
                lut, tlut)
            if out.ndim == 3 and out.shape[0] == 3:
                out = planar_to_hwc(out)
            return out, None
        if mode == "feather" and ftlut is not None:
            sel = vs._select_frames(frames, ft_reg or reg)
            out = vs._feather_planar(jnp.asarray(np.stack(sel)), ftlut)
            return planar_to_hwc(out), vs._fit_frame
        if mode == "multiband" and mbt is not None:
            from ..blend.multiband_video import multiband_video_frame
            st, crop_yx = mbt
            interpret = jax.default_backend() != "tpu"
            sel = vs._select_frames(frames, mb_reg or reg)
            planar = frames_to_planar_i8(jnp.asarray(np.stack(sel)))
            if mbs is not None:
                smb, sfn = mbs
                out = sfn(planar, smb)
            else:
                out = multiband_video_frame(planar, st, crop_yx=crop_yx,
                                            interpret=interpret)
            return planar_to_hwc(out), vs._fit_frame
        # blend fallback path is host-synchronous by construction
        return jnp.asarray(vs._composite_blend(
            vs._select_frames(frames, reg), mode, reg)), None

    def _finish(self, item) -> np.ndarray:
        dev, post = item
        host = np.asarray(dev)
        # a device_reduce output is no longer a panorama — the mode's
        # postprocess (e.g. _fit_frame) expects panorama shape and would
        # crash or mangle a checksum/preview array
        if post is not None and self._reduce is None:
            host = post(host)
        self.out_times.append(time.perf_counter())
        return host

    # -- public API --------------------------------------------------------

    def submit(self, frames: List[np.ndarray]) -> Optional[np.ndarray]:
        """Enqueue one rig frame-set; return the oldest completed panorama
        once the pipeline is primed (None during the first `depth`-1
        submits)."""
        out, post = self._dispatch(frames)
        if self._reduce is not None:
            out = self._reduce(out)
        # Start the device->host copy NOW, while frames i+1..i+K dispatch:
        # a synchronous fetch at delivery time costs one full host<->device
        # round trip that nothing overlaps (measured ~26 ms through a remote
        # TPU relay, capping delivery at ~38 fps no matter the depth); with
        # the copy in flight the later np.asarray just picks up landed bytes
        # (measured 155 fps, gap p95 7.9 ms, same kernel).
        try:
            out.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass        # non-jax output (blend fallback path) or no support
        self._q.append((out, post))
        if len(self._q) >= self.depth:
            return self._finish(self._q.popleft())
        return None

    def flush(self) -> List[np.ndarray]:
        """Drain and return every in-flight panorama (ends the stream)."""
        outs = [self._finish(item) for item in self._q]
        self._q.clear()
        return outs

    def __len__(self) -> int:
        return len(self._q)
