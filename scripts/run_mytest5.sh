#!/usr/bin/env bash
# Reference RunMyTest5.bat parity: 5 images, wave correction disabled.
set -euo pipefail
exec python -m stitchingvideo_tpu.cli stitch "$@" --wave_correct no --output mystitching.jpg
