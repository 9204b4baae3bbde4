"""action_detection_tpu — a TPU-native temporal action detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the SSN
(Structured Segment Networks, ICCV'17) reference stack (yjxiong/action-detection):

* TSN-style sparse-segment 2D CNN backbones (BNInception, InceptionV3, ResNet)
  implemented in flax and compiled by XLA with conv+BN folding at inference.
* Structured Temporal Pyramid Pooling expressed as a single static pooling
  matmul (training) and a cumulative-sum gather over per-frame score matrices
  (testing), instead of the reference's per-proposal Python loops.
* OHEM hinge completeness loss and class-wise location regression as
  closed-form differentiable jax ops (no custom autograd backward needed).
* Data-parallel training over a `jax.sharding.Mesh` (ICI collectives inserted
  by XLA), instead of torch DataParallel.
* TAG (Temporal Actionness Grouping) proposal generation, temporal NMS and
  detection mAP evaluation as vectorized host ops with optional C++ kernels.

Package layout:
  models/    flax model definitions + test-time head fusion
  ops/       stpp, losses, nms, iou, tag grouping, metrics, mAP
  data/      proposal-list I/O, dataset DBs, sampling, transforms, pipeline
  train/     pjit trainer, optimizer groups, checkpointing
  infer/     per-device jitted proposal scorer
  parallel/  mesh / sharding helpers
  cli/       command-line entry points mirroring the reference scripts
"""

from .config import (get_configs, get_actionness_configs,
                     get_reference_model_url, DatasetConfig, SamplingConfig)

__version__ = "0.1.0"
