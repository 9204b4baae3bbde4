#!/usr/bin/env bash
# Full THUMOS14 reproduction recipe (the reference README's workflow,
# /root/reference/README.md:100-260, on this framework).
#
# Prerequisites (outside this zero-egress environment):
#   1. Extract frames + optical flow with denseflow (TSN tooling) into
#      $FRAME_PATH/<video>/{img,flow_x,flow_y}_00001.jpg ...
#   2. Download the normalized TAG proposal lists into data/ (reference
#      release), or generate your own via the TAG pipeline below.
#   3. (optional) reference torch checkpoints — see
#      action_detection_tpu/configs/reference_models.yaml; .pth.tar files are
#      converted on load.
set -euo pipefail

FRAME_PATH=${1:?usage: reproduce_thumos14.sh FRAME_PATH [WORKDIR]}
WORK=${2:-work_thumos14}
mkdir -p "$WORK"

# ---- 0. adapt normalized proposal lists to the local frame extraction ----
python gen_proposal_list.py thumos14 "$FRAME_PATH"

# ---- 1. (alternative) generate TAG proposals from scratch ----
#   binary actionness model on the sliding-window lists, then grouping:
# python binary_train.py thumos14 RGB -b 4 --epochs 3 --data_root "$FRAME_PATH"
# python binary_test.py thumos14 RGB testing \
#     ssn_thumos14_BNInception_rgb_binary_checkpoint.msgpack \
#     "$WORK/actionness_rgb.pkl" --data_root "$FRAME_PATH"
#   ('validation' scores the train list instead, for TRAINING proposals)
# python gen_bottom_up_proposals.py "$WORK/actionness_rgb.pkl" --dataset thumos14 \
#     --subset testing --frame_path "$FRAME_PATH" \
#     --write_proposals data/thumos14_tag_test_proposal_list.txt

# ---- 2. train both streams (reference recipe: b=16, lr steps 20/40, 45 ep) ----
# (checkpoint names follow the reference scheme
#  ssn<pref>_<dataset>_<arch>_<modality>_checkpoint.msgpack, landing in cwd)
python ssn_train.py thumos14 RGB -b 16 --lr 0.001 --lr_steps 20 40 --epochs 45 \
    --data_root "$FRAME_PATH"
python ssn_train.py thumos14 Flow -b 16 --lr 0.005 --lr_steps 20 40 --epochs 45 \
    --data_root "$FRAME_PATH" \
    --init_weights "${FLOW_INIT:-flow_init.pth}"  # cross-modality init is automatic

# ---- 3. score the test set (10-crop dense scoring; int8-e2e + shared-stem
#         is the default here — pass --no_int8 for bit-faithful bf16) ----
python ssn_test.py thumos14 RGB ssn_thumos14_BNInception_rgb_checkpoint.msgpack \
    "$WORK/scores_rgb.pkl" --data_root "$FRAME_PATH"
python ssn_test.py thumos14 Flow ssn_thumos14_BNInception_flow_checkpoint.msgpack \
    "$WORK/scores_flow.pkl" --data_root "$FRAME_PATH"

# ---- 4. two-stream fusion + mAP@tIoU (reference weights 1:2 RGB:Flow) ----
python eval_detection_results.py thumos14 \
    "$WORK/scores_rgb.pkl" "$WORK/scores_flow.pkl" --score_weights 1 2
