#!/bin/bash
# Evaluate TUM-RGBD fr1 sequences (reference tools/evaluate_tum.sh analog).
# Usage: tools/evaluate_tum.sh <tum_root> [extra flags...]
set -e
ROOT=$1; shift
for seq in rgbd_dataset_freiburg1_360 rgbd_dataset_freiburg1_desk \
           rgbd_dataset_freiburg1_desk2 rgbd_dataset_freiburg1_floor \
           rgbd_dataset_freiburg1_plant rgbd_dataset_freiburg1_room \
           rgbd_dataset_freiburg1_rpy rgbd_dataset_freiburg1_teddy \
           rgbd_dataset_freiburg1_xyz; do
  echo "=== $seq ==="
  python -m droid_slam_reserch_tpu.cli tum \
    --datapath "$ROOT/$seq" --gt "$ROOT/$seq/groundtruth.txt" "$@"
done
