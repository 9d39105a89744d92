#!/usr/bin/env bash
# Reference old-exe-stitch/RunTest2 -5.0.bat parity: the regression parameter
# sweep (--match_conf 0.4 --warp spherical --conf_thresh 0.3 --work_megapix 0.9).
set -euo pipefail
exec python -m stitchingvideo_tpu.cli stitch "$@" \
  --match_conf 0.4 --warp spherical --conf_thresh 0.3 --work_megapix 0.9 \
  --output mystitching.jpg
