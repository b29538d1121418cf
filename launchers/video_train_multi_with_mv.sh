#!/bin/bash
# Motion-vector VSR on REDS+MV (reference: video_train_multi_with_mv.bash).
set -e
experiment_name=${1:-vsr_mv}
now=$(date +'%b%d_%H_%M_%S')
python -m mobilesuperresolution_tpu.cli.train_vsr \
  --job_dir "${JOB_DIR:-runs/${experiment_name}_${now}}" \
  --dataset reds_with_mv --model_type basic_mv \
  --scale 4 --image_batch 10 --epochs 30 \
  --train_batch_size 2 --lr_patch_size 64 --learning_rate 1e-4 \
  "${@:2}"
