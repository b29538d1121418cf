#!/bin/bash
# v1 naive-multi training (reference: video_train_naive.bash).
set -e
experiment_name=${1:-vsr_naive}
block_index=${2:?usage: video_train_naive.sh <name> <block_index.txt>}
now=$(date +'%b%d_%H_%M_%S')
python -m mobilesuperresolution_tpu.cli.train_vsr \
  --job_dir "${JOB_DIR:-runs/${experiment_name}_${now}}" \
  --dataset reds --model_type multi_v1 --model_path "$block_index" \
  --scale 4 --image_batch 10 --epochs 30 \
  --train_batch_size 2 --lr_patch_size 64 --learning_rate 1e-4 \
  "${@:3}"
