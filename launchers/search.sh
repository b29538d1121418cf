#!/bin/bash
# NAS search preset (reference: search.bash — speed_target=500, 15/15/10
# epochs, x2 16x32 supernet, width search on).
set -e
experiment_name=${1:-search}
now=$(date +'%b%d_%H_%M_%S')
# JOB_DIR pins the job dir (no timestamp) so with_retries.sh resumes
# into the SAME directory across retries
job_dir="${JOB_DIR:-runs/${experiment_name}_${now}}"

python -m mobilesuperresolution_tpu.cli.search \
  --job_dir "$job_dir" \
  --dataset div2k --eval_datasets set5 \
  --scale 2 --num_blocks 16 --num_residual_units 32 --width_search \
  --speed_target 500 \
  --width_epochs 15 --epochs 15 --kernel_epochs 10 \
  --num_patches 200 --train_batch_size 16 --lr_patch_size 48 \
  --learning_rate 1e-3 \
  "${@:2}"
