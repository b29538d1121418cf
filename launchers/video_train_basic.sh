#!/bin/bash
# BasicVSR (mobile) training preset (reference: video_train_naive.bash /
# train_video_superresolution.py 'basic': num_feat=24, num_block=8).
set -e
experiment_name=${1:-vsr_basic}
now=$(date +'%b%d_%H_%M_%S')
# JOB_DIR pins the job dir (no timestamp) so with_retries.sh resumes
# into the SAME directory across retries
job_dir="${JOB_DIR:-runs/${experiment_name}_${now}}"

python -m mobilesuperresolution_tpu.cli.train_vsr \
  --job_dir "$job_dir" \
  --dataset reds --model_type basic \
  --scale 4 --image_batch 10 --epochs 30 \
  --train_batch_size 2 --lr_patch_size 64 \
  --learning_rate 1e-4 \
  "${@:2}"
