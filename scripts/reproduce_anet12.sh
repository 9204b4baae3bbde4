#!/usr/bin/env bash
# Full ActivityNet v1.2 reproduction recipe (the reference README's workflow,
# /root/reference/README.md:100-256 on this framework; recipe numbers from
# README.md:256 — batch 16, lr steps 3/6, 7 epochs, Kinetics init optional).
#
# Prerequisites (outside this zero-egress environment):
#   1. Extract frames + optical flow with denseflow (TSN tooling) into
#      $FRAME_PATH/<video>/{img,flow_x,flow_y}_00001.jpg ...
#   2. Download the normalized TAG proposal lists into data/ (reference
#      release), or generate your own via the TAG pipeline in
#      reproduce_thumos14.sh step 1.
#   3. (optional) Kinetics-pretrained initializations — resolved by
#      --kinetics_pretrain from the kinetics_pretrain URL map in
#      configs/dataset_cfg.yaml against the local cache
#      (~/.cache/action_detection_tpu) and converted on load
#      (models/convert.py). Set KINETICS=1 to enable below.
set -euo pipefail

FRAME_PATH=${1:?usage: reproduce_anet12.sh FRAME_PATH [WORKDIR]}
WORK=${2:-work_anet12}
mkdir -p "$WORK"

# ---- 0. adapt normalized proposal lists to the local frame extraction ----
python gen_proposal_list.py activitynet1.2 "$FRAME_PATH"

# ---- 1. train both streams (reference recipe: b=16, lr steps 3/6, 7 ep) ----
# (checkpoint names follow the reference scheme
#  ssn<pref>_<dataset>_<arch>_<modality>_checkpoint.msgpack, landing in cwd)
python ssn_train.py activitynet1.2 RGB -b 16 --lr 0.001 --lr_steps 3 6 \
    --epochs 7 --data_root "$FRAME_PATH" ${KINETICS:+--kinetics_pretrain}
python ssn_train.py activitynet1.2 Flow -b 16 --lr 0.005 --lr_steps 3 6 \
    --epochs 7 --data_root "$FRAME_PATH" ${KINETICS:+--kinetics_pretrain}

# ---- 2. score the validation set (10-crop dense scoring) ----
python ssn_test.py activitynet1.2 RGB \
    ssn_activitynet1.2_BNInception_rgb_checkpoint.msgpack \
    "$WORK/scores_rgb.pkl" --data_root "$FRAME_PATH"
python ssn_test.py activitynet1.2 Flow \
    ssn_activitynet1.2_BNInception_flow_checkpoint.msgpack \
    "$WORK/scores_flow.pkl" --data_root "$FRAME_PATH"

# ---- 3. two-stream fusion + average mAP over IoU 0.5:0.05:0.95 ----
# (ANet eval uses top_k=60, NMS=0.6 from configs/dataset_cfg.yaml)
python eval_detection_results.py activitynet1.2 \
    "$WORK/scores_rgb.pkl" "$WORK/scores_flow.pkl" --score_weights 1 2
