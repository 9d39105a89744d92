#!/usr/bin/env bash
# Reference RunTest2.bat parity (stitching/OpenCV2.4.11-Stitching/Release/
# RunTest2.bat): 6-image batch stitch of the test2 set with default flags.
# Usage: scripts/run_test2.sh <img0> ... <img5> [extra flags]
set -euo pipefail
exec python -m stitchingvideo_tpu.cli stitch "$@" --output mystitching.jpg
