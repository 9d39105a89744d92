#!/usr/bin/env bash
# Reference ruandata/RunTest2.bat parity: the deployed real-time mode
# (argv-less RT driver). Streams the given inputs through the cached-LUT
# video compositor with the RT-driver defaults (cylindrical warp,
# conf_thresh 0.6, 30 s re-registration).
set -euo pipefail
exec python -m stitchingvideo_tpu.cli video "$@" \
  --warp cylindrical --conf_thresh 0.6 --reregister_seconds 30
