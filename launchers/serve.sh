#!/bin/bash
# Streaming VSR serving preset (no reference counterpart — the reference
# stops at file-based clip eval; see README "Streaming serving").
# Output size defaults to input x scale; add --input_dir a,b,c for lockstep
# multi-stream serving (batch <=4 small-frame streams, DESIGN.md "Serving").
# Add --flow_cache to reuse each SpyNet pair flow across overlapping windows
# (SpyNet-based models; measure with scripts/bench_flow_cache.py — see DESIGN.md "Serving").
set -e
job_dir=${1:?usage: serve.sh <job_dir> <frames_dir> [--eval_model w.npz ...]}
frames=${2:?usage: serve.sh <job_dir> <frames_dir> [--eval_model w.npz ...]}
python -m mobilesuperresolution_tpu.cli.serve \
  --job_dir "$job_dir" \
  --input_dir "$frames" \
  --model_type basic --scale 4 \
  --chunk_frames 4 --chunk_overlap 4 \
  "${@:3}"
