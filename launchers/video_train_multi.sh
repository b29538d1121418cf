#!/bin/bash
# NAS-multi VSR training preset (reference: video_train_multi.bash).
set -e
experiment_name=${1:-vsr_multi}
block_index=${2:?usage: video_train_multi.sh <name> <block_index.txt>}
now=$(date +'%b%d_%H_%M_%S')
# JOB_DIR pins the job dir (no timestamp) so with_retries.sh resumes
# into the SAME directory across retries
job_dir="${JOB_DIR:-runs/${experiment_name}_${now}}"

python -m mobilesuperresolution_tpu.cli.train_vsr \
  --job_dir "$job_dir" \
  --dataset reds --model_type multi --model_path "$block_index" \
  --scale 4 --image_batch 10 --epochs 30 \
  --train_batch_size 2 --lr_patch_size 64 \
  --learning_rate 1e-4 \
  "${@:3}"
