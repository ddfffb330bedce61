#!/bin/bash
# TartanAir test-split validation (reference tools/validate_tartanair.sh analog).
# Usage: tools/validate_tartanair.sh <tartanair_root> [--stereo] [extra flags...]
set -e
ROOT=$1; shift
python - "$ROOT" <<'PY'
import sys, os
from droid_slam_reserch_tpu.data.tartan import TARTAN_TEST_SPLIT
for scene in TARTAN_TEST_SPLIT:
    print(os.path.join(sys.argv[1], scene))
PY
for scene in $(python - "$ROOT" <<'PY'
import sys, os
from droid_slam_reserch_tpu.data.tartan import TARTAN_TEST_SPLIT
for s in TARTAN_TEST_SPLIT:
    print(os.path.join(sys.argv[1], s))
PY
); do
  [ -d "$scene" ] || continue
  echo "=== $scene ==="
  python -m droid_slam_reserch_tpu.cli tartanair \
    --datapath "$scene" --gt "$scene/pose_left.txt" "$@"
done
