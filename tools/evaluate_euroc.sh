#!/bin/bash
# Evaluate all EuRoC sequences (reference tools/evaluate_euroc.sh analog).
# Usage: tools/evaluate_euroc.sh <euroc_root> <gt_dir> [--stereo] [extra flags...]
set -e
ROOT=$1; GT=$2; shift 2
for seq in MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult \
           V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium V2_03_difficult; do
  short=$(echo $seq | cut -d_ -f1,2)
  echo "=== $seq ==="
  python -m droid_slam_reserch_tpu.cli euroc \
    --datapath "$ROOT/$seq/mav0" --gt "$GT/$short.txt" "$@"
done
