#!/bin/bash
# The reference's experiments/{depth,depth_odometry,depth_odometry_feat}/
# train.sh chain as one script: three stages, each fine-tuning from the
# previous stage's checkpoint (weights-only --init-from, the
# `caffe train --weights=` staged-finetune semantics).
#
# Usage: KITTI_RAW=/data/kitti_raw KITTI_ODOM=/data/kitti_odom \
#        ./examples/train_staged.sh [steps_per_stage]
# Without KITTI_RAW the stages run on synthetic scenes (smoke mode).
set -e
STEPS="${1:-100000}"
CK="${CK:-ck}"
DATA_ARGS=()
if [ -n "$KITTI_RAW" ]; then
  # Build the train list once (per-sequence stereo baselines included).
  [ -f train_list.txt ] || python -m depthvo_tpu.cli prep \
      --kitti-root "$KITTI_RAW" --output train_list.txt
  DATA_ARGS=(--kitti-root "$KITTI_RAW" --train-list train_list.txt)
fi

# Stage 1: stereo photometric depth (reference: experiments/depth).
python -m depthvo_tpu.cli train --variant stereo --steps "$STEPS" \
    --checkpoint-dir "$CK/stereo" "${DATA_ARGS[@]}"

# Stage 2: + odometry net, temporal loss (experiments/depth_odometry).
python -m depthvo_tpu.cli train --variant temporal_stereo --steps "$STEPS" \
    --checkpoint-dir "$CK/temporal_stereo" --init-from "$CK/stereo" \
    "${DATA_ARGS[@]}"

# Optional: pretrain the feature extractor in-framework (replaces the
# reference's external NYUv2 weights download).
python -m depthvo_tpu.cli pretrain-feat --steps 2000 \
    --checkpoint-dir "$CK/feat" "${DATA_ARGS[@]}"

# Stage 3: + deep feature reconstruction loss (the full model;
# experiments/depth_odometry_feat).
python -m depthvo_tpu.cli train --variant full_feat --steps "$STEPS" \
    --checkpoint-dir "$CK/full" --init-from "$CK/temporal_stereo" \
    --init-feat-from "$CK/feat" "${DATA_ARGS[@]}"

echo "done; evaluate with:"
echo "  python -m depthvo_tpu.cli eval-depth --checkpoint-dir $CK/full ..."
echo "  python -m depthvo_tpu.cli eval-odom  --checkpoint-dir $CK/full ..."
