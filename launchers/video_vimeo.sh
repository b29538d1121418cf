#!/bin/bash
# Vimeo-90k training preset (reference: video_vimeo.bash).
set -e
experiment_name=${1:-vsr_vimeo}
now=$(date +'%b%d_%H_%M_%S')
python -m mobilesuperresolution_tpu.cli.train_vsr \
  --job_dir "${JOB_DIR:-runs/${experiment_name}_${now}}" \
  --dataset vimeo --model_type basic \
  --scale 4 --image_batch 7 --epochs 30 \
  --train_batch_size 2 --lr_patch_size 64 --learning_rate 1e-4 \
  "${@:2}"
