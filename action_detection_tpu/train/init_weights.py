"""Pretrained-weight initialization for trainers.

The reference resolves init weights three ways (ssn_train.py:38-58): an
explicit ``--init_weights`` file, a Kinetics-pretrained URL from the dataset
config, or (Flow models) a flow-init URL — both fetched through
``model_zoo.load_url``'s cache. Here the same surface exists with the
download replaced by a local cache lookup (zero egress), and the torch
state dict converted into our flax trees with cross-modality first-conv
surgery when channel counts differ (ssn_models.py:318-343).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import DatasetConfig, resolve_pretrained_init


def load_torch_backbone_into_state(state, path: str, arch: str):
    """Convert a reference torch backbone checkpoint and graft it onto
    ``state`` (cross-modality surgery if the first-conv channels differ)."""
    from ..models.convert import (convert_torch_backbone_state,
                                  cross_modality_init, load_torch_checkpoint)
    from .optim import FIRST_CONV_NAMES

    raw = load_torch_checkpoint(path)
    sd = raw.get("state_dict", raw)
    bk_params, bk_stats = convert_torch_backbone_state(sd, arch)

    first_conv = next((n for n in FIRST_CONV_NAMES if n in bk_params), None)
    if first_conv is None:
        raise ValueError(
            f"could not locate the first conv among {list(bk_params)[:5]}...; "
            f"expected one of {FIRST_CONV_NAMES}")
    want_c = state.params["backbone"][first_conv]["kernel"].shape[2]
    have_c = np.asarray(bk_params[first_conv]["kernel"]).shape[2]
    if want_c != have_c:
        bk_params = cross_modality_init(bk_params, first_conv, want_c)
        print(f"=> cross-modality first conv: {have_c} -> {want_c} channels")
    new_stats = dict(state.batch_stats or {})
    if bk_stats:
        new_stats["backbone"] = bk_stats
    return state.replace(params={**state.params, "backbone": bk_params},
                         batch_stats=new_stats or state.batch_stats)


def apply_init_weights(state, args, cfg: DatasetConfig,
                       load_checkpoint_fn) -> "object":
    """The full reference init policy: --init_weights file > --kinetics_pretrain
    URL cache > Flow flow-init URL cache > framework default init."""
    if args.init_weights:
        if not os.path.isfile(args.init_weights):
            print(f"=> no weights file found at '{args.init_weights}'")
            return state
        if args.init_weights.endswith((".pth", ".pth.tar", ".pt")):
            state = load_torch_backbone_into_state(state, args.init_weights,
                                                   args.arch)
        else:
            ck = load_checkpoint_fn(args.init_weights)
            state = state.replace(params={**state.params,
                                          "backbone": ck["params"].get(
                                              "backbone", ck["params"])})
            # frozen-BN backbones are useless without the pretrained running
            # stats (the reference's load_state_dict carries running_mean/var,
            # ssn_train.py:42) — graft them alongside the params
            bk_stats = (ck.get("batch_stats") or {}).get("backbone")
            if bk_stats and getattr(state, "batch_stats", None) is not None:
                state = state.replace(batch_stats={**state.batch_stats,
                                                   "backbone": bk_stats})
        print(f"=> loaded init weights from '{args.init_weights}'")
        return state

    kinetics = bool(getattr(args, "kinetics_pretrain", False))
    if kinetics:
        # the user explicitly asked: unknown arch / uncached file is an error
        path: Optional[str] = resolve_pretrained_init(
            cfg, args.arch, args.modality, kinetics=True)
    elif args.modality == "Flow":
        # the reference always loads flow_init here (ssn_train.py:55-58) but
        # only publishes URLs for BNInception/InceptionV3, and it downloads
        # them itself — offline, an uncached file must not kill an implicit
        # init (only the explicit --kinetics_pretrain ask errors hard)
        try:
            path = resolve_pretrained_init(cfg, args.arch, args.modality)
        except KeyError:
            print(f"=> no flow_init URL for arch {args.arch}; "
                  f"using framework init")
            path = None
        except FileNotFoundError as e:
            print(f"=> WARNING: flow init checkpoint not cached; training "
                  f"from framework init (the reference would download it):"
                  f"\n{e}")
            path = None
    else:
        # the reference's RGB trainers always start from torchvision /
        # model_zoo ImageNet-pretrained backbones (ssn_models.py:109,123) —
        # weights its backbone constructors download themselves. There is no
        # published standalone URL to cache here, so make the difference
        # LOUD: random init with frozen random BN statistics trains to
        # garbage on real data.
        print("=> WARNING: no pretrained backbone init. The reference starts "
              "RGB training from ImageNet-pretrained weights; pass "
              "--init_weights <imagenet .pth dump> or --kinetics_pretrain "
              "for a comparable run (fine for synthetic smoke tests).")
        path = None
    if path is not None:
        state = load_torch_backbone_into_state(state, path, args.arch)
        print(f"=> loaded {'kinetics' if kinetics else 'flow'} init "
              f"weights from '{path}'")
    return state
