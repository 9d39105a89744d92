#!/usr/bin/env bash
# Reference RunMyTestFishEye.bat parity: 3 fisheye images with the DOT
# match-graph dump (--save_graph test.txt). Add --undistort to fold the
# RT driver's fisheye correction into the warp maps.
set -euo pipefail
exec python -m stitchingvideo_tpu.cli stitch "$@" \
  --save_graph test.txt --output mystitching.jpg
