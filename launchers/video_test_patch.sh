#!/bin/bash
# Patch-tiled VSR eval preset (reference: video_test_patch.bash — 64x64
# patches, overlap_h=4, TV statistics → run/<model>_64_64_2.npy).
set -e
job_dir=${1:?usage: video_test_patch.sh <job_dir> [--eval_model ...]}

python -m mobilesuperresolution_tpu.cli.test_vsr_by_patch \
  --job_dir "$job_dir" \
  --dataset reds --eval_datasets reds --model_type basic \
  --scale 4 --image_batch 10 \
  --patch_h 64 --patch_w 64 --overlap_h 4 --overlap_w 0 \
  "${@:2}"
