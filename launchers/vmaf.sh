#!/bin/bash
# VMAF perceptual scoring of dumped eval frames (reference: bash/vmaf.bash).
# Frames come from the eval harness's PNG dumps:
#   <job_dir>/eval/<dataset>/%NNN.png  (SR)  vs  <job_dir>/eval/hr/%NNN.png
set -e
sr_pattern=${1:?usage: vmaf.sh <sr_frame_pattern> <hr_frame_pattern>}
hr_pattern=${2:?usage: vmaf.sh <sr_frame_pattern> <hr_frame_pattern>}

ffmpeg -start_number 0 -i "${sr_pattern}" -start_number 0 \
  -i "${hr_pattern}" -lavfi libvmaf -f null -
