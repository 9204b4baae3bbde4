"""Two-tier configuration system.

Mirrors the reference's split (argparse run flags + YAML dataset settings,
/root/reference/ops/utils.py:6-17 and /root/reference/ssn_opts.py) with typed
dataclasses on top of the YAML so downstream code is not dict-driven.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence, Tuple, Union

import yaml

_CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")

StageCfg = Union[int, Tuple[int, ...]]


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Proposal pool thresholds and per-video sampling ratios."""
    fg_iou_thresh: float = 0.7
    bg_iou_thresh: float = 0.01
    incomplete_iou_thresh: float = 0.3
    bg_coverage_thresh: float = 0.02
    incomplete_overlap_thresh: float = 0.7
    prop_per_video: int = 8
    fg_ratio: int = 1
    bg_ratio: int = 1
    incomplete_ratio: int = 6

    @property
    def fg_per_video(self) -> int:
        denum = self.fg_ratio + self.bg_ratio + self.incomplete_ratio
        return int(self.prop_per_video * (self.fg_ratio / denum))

    @property
    def bg_per_video(self) -> int:
        denum = self.fg_ratio + self.bg_ratio + self.incomplete_ratio
        return int(self.prop_per_video * (self.bg_ratio / denum))

    @property
    def incomplete_per_video(self) -> int:
        return self.prop_per_video - self.fg_per_video - self.bg_per_video


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    top_k: int = 2000
    nms_threshold: float = 0.2
    softmax_before_filter: bool = True


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    name: str
    train_list: str
    test_list: str
    num_class: int
    sampling: SamplingConfig
    evaluation: EvalConfig
    stpp: Tuple[StageCfg, StageCfg, StageCfg] = (1, 1, 1)
    # published pretrained-init URLs: flow_init[arch], kinetics_pretrain[arch][modality]
    flow_init: dict = dataclasses.field(default_factory=dict)
    kinetics_pretrain: dict = dataclasses.field(default_factory=dict)

    @property
    def iou_range(self):
        """The mAP IoU sweep grid (eval_detection_results.py:209-214)."""
        import numpy as np

        if self.name.startswith("activitynet"):
            return np.arange(0.5, 1.0, 0.05)
        if self.name.startswith("thumos"):
            return np.arange(0.1, 1.0, 0.1)
        raise ValueError(f"unknown dataset {self.name}")


def _to_stage(v) -> StageCfg:
    return tuple(v) if isinstance(v, (list, tuple)) else int(v)


def _build(name: str, raw: dict) -> DatasetConfig:
    samp = raw.get("sampling", {})
    sampling = SamplingConfig(**{k: samp[k] for k in samp
                                 if k in SamplingConfig.__dataclass_fields__})
    ev = raw.get("evaluation", {})
    evaluation = EvalConfig(**{k: ev[k] for k in ev
                               if k in EvalConfig.__dataclass_fields__})
    stpp = tuple(_to_stage(s) for s in raw.get("stpp", [1, 1, 1]))
    return DatasetConfig(name=name, train_list=raw["train_list"],
                         test_list=raw["test_list"], num_class=raw["num_class"],
                         sampling=sampling, evaluation=evaluation, stpp=stpp,
                         flow_init=raw.get("flow_init", {}),
                         kinetics_pretrain=raw.get("kinetics_pretrain", {}))


def get_configs(dataset: str, cfg_file: Optional[str] = None) -> DatasetConfig:
    """Load the detection-task config for a dataset."""
    path = cfg_file or os.path.join(_CFG_DIR, "dataset_cfg.yaml")
    with open(path) as f:
        data = yaml.safe_load(f)
    return _build(dataset, data[dataset])


def get_actionness_configs(dataset: str, cfg_file: Optional[str] = None) -> DatasetConfig:
    """Load the binary-actionness-task config for a dataset."""
    path = cfg_file or os.path.join(_CFG_DIR, "dataset_actionness_cfg.yaml")
    with open(path) as f:
        data = yaml.safe_load(f)
    return _build(dataset, data[dataset])


def pretrained_cache_dir() -> str:
    """Local cache for published pretrained checkpoints (the model_zoo cache
    of the reference, ssn_train.py:46-57). Override with $ADT_MODEL_CACHE."""
    return os.environ.get(
        "ADT_MODEL_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "action_detection_tpu"))


def resolve_pretrained_init(cfg: DatasetConfig, arch: str, modality: str,
                            kinetics: bool = False) -> Optional[str]:
    """Pretrained-init URL -> local cached .pth path (ssn_train.py:38-58).

    Returns None when the reference would use no explicit init file (plain
    ImageNet RGB: the torchvision/model_zoo constructor weights). Raises a
    helpful FileNotFoundError in this zero-egress environment when the
    checkpoint has not been placed in the cache yet.
    """
    if kinetics:
        try:
            url = cfg.kinetics_pretrain[arch][modality]
        except KeyError:
            raise KeyError(f"no kinetics_pretrain URL for arch={arch} "
                           f"modality={modality} in dataset '{cfg.name}'")
    elif modality == "Flow":
        try:
            url = cfg.flow_init[arch]
        except KeyError:
            raise KeyError(f"no flow_init URL for arch={arch} "
                           f"in dataset '{cfg.name}'")
    else:
        return None

    path = os.path.join(pretrained_cache_dir(), url.rsplit("/", 1)[-1])
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"pretrained init checkpoint not cached: {path}\n"
            f"This environment has no network egress. Download\n  {url}\n"
            f"out of band and place it at that path (or set $ADT_MODEL_CACHE).")
    return path


def get_reference_model_url(dataset: str, modality: str, init: str,
                            arch: str) -> str:
    """Published reference checkpoint URL (ops/utils.py:15-17 parity).

    ``init`` is 'ImageNet' or 'Kinetics'. Download externally and feed the
    local .pth.tar to ssn_test.py (converted on load).
    """
    with open(os.path.join(_CFG_DIR, "reference_models.yaml")) as f:
        data = yaml.safe_load(f)
    return data[dataset][init][arch][modality]


def resolve_reference_checkpoint(dataset: str, modality: str, init: str,
                                 arch: str) -> str:
    """--use_reference / --use_kinetics_reference resolution: published
    trained-checkpoint URL -> local cache path (the reference downloads with
    model_zoo.load_url, ssn_test.py:119-125; this zero-egress environment
    resolves against the same cache as resolve_pretrained_init and errors
    helpfully when the file has not been placed there)."""
    url = get_reference_model_url(dataset, modality, init, arch)
    path = os.path.join(pretrained_cache_dir(), url.rsplit("/", 1)[-1])
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"reference checkpoint not cached: {path}\n"
            f"This environment has no network egress. Download\n  {url}\n"
            f"out of band and place it at that path (or set $ADT_MODEL_CACHE).")
    return path
