#!/usr/bin/env bash
# Reference RunMyTestEye.bat parity: plane-projection warp.
set -euo pipefail
exec python -m stitchingvideo_tpu.cli stitch "$@" --warp plane --output mystitching.jpg
