#!/bin/bash
# Full-frame VSR eval (reference: video_test.bash).
set -e
job_dir=${1:?usage: video_test.sh <job_dir> [--eval_model ... --model_type ...]}
python -m mobilesuperresolution_tpu.cli.test_vsr \
  --job_dir "$job_dir" \
  --dataset reds --eval_datasets reds --model_type basic \
  --scale 4 --image_batch 100 \
  "${@:2}"
