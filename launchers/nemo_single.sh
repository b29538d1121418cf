#!/bin/bash
# NEMO per-frame model preset (reference: nemo_single.bash).
set -e
experiment_name=${1:-nemo_single}
now=$(date +'%b%d_%H_%M_%S')
# JOB_DIR pins the job dir (no timestamp) so with_retries.sh resumes
# into the SAME directory across retries
job_dir="${JOB_DIR:-runs/${experiment_name}_${now}}"

python -m mobilesuperresolution_tpu.cli.train_vsr \
  --job_dir "$job_dir" \
  --dataset nemo --model_type single \
  --scale 4 --image_batch 10 --epochs 30 \
  --train_batch_size 2 --lr_patch_size 64 \
  --learning_rate 1e-4 \
  "${@:2}"
