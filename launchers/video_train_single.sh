#!/bin/bash
# Per-frame "single" model on REDS (reference: video_train_single.bash).
set -e
experiment_name=${1:-vsr_single}
now=$(date +'%b%d_%H_%M_%S')
python -m mobilesuperresolution_tpu.cli.train_vsr \
  --job_dir "${JOB_DIR:-runs/${experiment_name}_${now}}" \
  --dataset reds --model_type single \
  --scale 4 --image_batch 10 --epochs 30 \
  --train_batch_size 2 --lr_patch_size 64 --learning_rate 1e-4 \
  "${@:2}"
