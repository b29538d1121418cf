#!/bin/bash
# Elastic-ish training wrapper: rerun a training CLI with --resume after a
# crash (OOM, preemption, transient backend failure). The checkpoints are
# Orbax CheckpointManager state in <job_dir>/ckpt, so every retry continues
# from the last completed epoch (train/checkpoint.py — REAL resume; the
# reference's --resume flag never loaded anything, SURVEY §5.3/§5.4).
#
# Usage: launchers/with_retries.sh <max_retries> <python -m ...cli.pretrain --job_dir ...>
#
# Composing with a launcher preset: the presets timestamp their job dir per
# invocation, so pin it with JOB_DIR or every retry would start a FRESH run:
#   JOB_DIR=runs/exp launchers/with_retries.sh 5 launchers/pretraining.sh exp
set -u
max_retries=${1:?usage: with_retries.sh <max_retries> <command...>}
shift

attempt=0
while true; do
  "$@" --resume && exit 0
  code=$?
  attempt=$((attempt + 1))
  if [ "$attempt" -gt "$max_retries" ]; then
    echo "with_retries: giving up after ${max_retries} retries (last exit ${code})" >&2
    exit "$code"
  fi
  echo "with_retries: exit ${code}; retry ${attempt}/${max_retries} (resuming from last checkpoint)" >&2
  sleep 5
done
