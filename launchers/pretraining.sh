#!/bin/bash
# WDSR-B pretraining preset (reference: pretraining.bash).
set -e
experiment_name=${1:-pretrain}
now=$(date +'%b%d_%H_%M_%S')
# JOB_DIR pins the job dir (no timestamp) so with_retries.sh resumes
# into the SAME directory across retries
job_dir="${JOB_DIR:-runs/${experiment_name}_${now}}"

python -m mobilesuperresolution_tpu.cli.pretrain \
  --job_dir "$job_dir" \
  --dataset div2k --eval_datasets set5 set14 \
  --model_type BASIC_MODEL \
  --scale 2 --num_blocks 16 --num_residual_units 24 \
  --epochs 30 --train_batch_size 16 --lr_patch_size 48 \
  --learning_rate 1e-3 \
  "${@:2}"
