#!/usr/bin/env bash
# Reference ruandata deployment parity: the full RT scenario — the driver
# spawns one decode-producer process per camera (GetFromRtsp.exe model),
# consumes the shared-memory rings, undistorts via the fisheye intrinsics
# compiled into the reference (64-bit driver :209-216), and streams the
# cached-LUT hot loop with 30 s re-registration.
# Usage: scripts/run_rt_shm.sh cam0.mp4 cam1.mp4 ... [extra flags]
set -euo pipefail
exec python -m stitchingvideo_tpu.cli video "$@" \
  --mode shm --undistort \
  --warp cylindrical --conf_thresh 0.6 --reregister_seconds 30
