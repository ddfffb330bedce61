#!/bin/bash
# ETH3D RGB-D evaluation loop (reference tools/evaluate_eth3d.sh analog).
# Usage: tools/evaluate_eth3d.sh <eth3d_root> [extra flags...]
set -e
ROOT=$1; shift
for scene in "$ROOT"/*/; do
  [ -f "$scene/calibration.txt" ] || continue
  echo "=== $scene ==="
  python -m droid_slam_reserch_tpu.cli eth3d --datapath "$scene" --depth "$@"
done
