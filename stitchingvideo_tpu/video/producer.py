"""Video-decode producer process: decode a video file / RTSP URL into a
shared-memory ring.

Parity target: the reference's GetFromRtsp.exe — an external process that
decodes ONE RTSP stream via FFmpeg and publishes raw frames into named shared
memory for the stitcher to consume (binary-only in the reference repo; CLI
contract recovered from its spawn site, 64-bit stitching_detailed.cpp:785-793:
`GetFromRtsp.exe <rtsp-url> <shm-name> <mutex> <server-event> <client-event>`).

This producer is the TPU-framework equivalent:

    python -m stitchingvideo_tpu.video.producer <uri> <shm-name> \
        [--fps F] [--loop] [--frames N]

* Decode is cv2.VideoCapture (FFmpeg-backed) — files, rtsp://, http:// all
  work, matching both reference ingest modes (32-bit driver VideoCapture
  :996-1023 and the GetFromRtsp shm model).
* Transport is the lock-free POSIX ShmRing (native/sharemem.cpp) instead of
  the reference's single-buffer mutex/event handshake — a dead producer can
  never hang the consumer (timeouts), and a slow consumer never blocks decode
  (ring overwrite, newest-wins).
* Pacing: files replay at their container FPS (or --fps); live sources
  publish as fast as decode delivers (the stream paces itself).

The module intentionally never imports jax — producers are pure-CPU ingest
processes (cv2 + numpy + the native ring).
"""
from __future__ import annotations

import argparse
import sys
import time
from typing import Optional


def run_producer(uri: str, name: str, fps: float = 0.0, loop: bool = False,
                 max_frames: int = 0, slots: int = 4) -> int:
    """Decode `uri` and publish RGB frames into ShmRing `name`.

    Returns the number of frames published. fps<=0 = the source's native
    rate for files, free-running for live sources.
    """
    import cv2

    from .sharemem import ShmRing

    cap = cv2.VideoCapture(uri)
    if not cap.isOpened():
        raise OSError(f"cannot open video source {uri!r}")
    ok, frame = cap.read()
    if not ok:
        raise OSError(f"no frames from {uri!r}")
    h, w = frame.shape[:2]
    if fps <= 0:
        src_fps = cap.get(cv2.CAP_PROP_FPS)
        # live sources report 0/NaN FPS: publish as delivered
        fps = src_fps if src_fps and src_fps == src_fps and src_fps > 0 else 0.0

    ring = ShmRing.create(name, w, h, 3, slots)
    published = 0
    start = time.monotonic()
    try:
        while True:
            ring.publish(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB), published)
            published += 1
            if max_frames and published >= max_frames:
                break
            if fps > 0:
                time.sleep(max(0.0, start + published / fps - time.monotonic()))
            ok, frame = cap.read()
            if not ok:
                if not loop:
                    break
                cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
                ok, frame = cap.read()
                if not ok:
                    break
    finally:
        cap.release()
        ring.close(False)   # consumers may still be draining; no unlink
    return published


def main(argv: Optional[list] = None) -> int:
    ap = argparse.ArgumentParser(
        prog="stitchingvideo-producer",
        description="decode one video/RTSP stream into a shared-memory ring "
                    "(GetFromRtsp.exe parity)")
    ap.add_argument("uri", help="video file path or rtsp:///http:// URL")
    ap.add_argument("name", help="shared-memory ring name (e.g. /cam0)")
    ap.add_argument("--fps", type=float, default=0.0,
                    help="publish rate; default = source native rate")
    ap.add_argument("--loop", action="store_true",
                    help="loop file sources forever")
    ap.add_argument("--frames", type=int, default=0,
                    help="stop after N frames (0 = until EOS)")
    ap.add_argument("--slots", type=int, default=4)
    args = ap.parse_args(argv)
    n = run_producer(args.uri, args.name, fps=args.fps, loop=args.loop,
                     max_frames=args.frames, slots=args.slots)
    print(f"published {n} frames from {args.uri}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
