"""Convert reference torch checkpoints to flax pytrees.

The reference distributes ImageNet/Kinetics-pretrained backbones and trained
SSN models as torch ``state_dict`` pickles (Caffe-ported layer names, possibly
``module.``-prefixed by DataParallel, with ``reg_stats`` riding along —
/root/reference/ssn_train.py:163-169, ssn_test.py:119-129). This module maps
them onto our flax trees:

* conv ``weight (O, I, H, W)`` -> ``kernel (H, W, I, O)``
* linear ``weight (O, I)`` -> ``kernel (I, O)``
* BN ``weight/bias/running_mean/running_var`` -> ``scale/bias`` params and
  ``mean/var`` batch_stats
* BNInception's ``inception_*`` layers nest under their module scope.

Cross-modality init (RGB -> Flow/RGBDiff) replicates the reference's first
conv surgery (ssn_models.py:318-376): average the RGB kernel over input
channels and tile to the new channel count.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def strip_prefix(state_dict: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Remove e.g. the DataParallel ``module.`` prefix from every key."""
    out = {}
    for k, v in state_dict.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def _nest_path(layer: str, arch: str):
    """Scope path of a layer inside our flax module tree.

    BNInception: flat caffe names, inception layers nested under their module.
    InceptionV3: 'Mixed_5b.branch1x1.conv' -> ('Mixed_5b', 'branch1x1_conv').
    ResNet:      'layer1.0.conv1' -> ('layer1_0', 'conv1');
                 'downsample.0/.1' -> 'downsample_conv'/'downsample_bn'.
    """
    if arch == "BNInception" and layer.startswith("inception_"):
        # inception_3a_1x1 -> ('inception_3a', 'inception_3a_1x1')
        module = "_".join(layer.split("_")[:2])
        return (module, layer)
    if arch == "InceptionV3" and "." in layer:
        parts = layer.split(".")
        if parts[-1] in ("conv", "bn"):
            parts = parts[:-2] + [f"{parts[-2]}_{parts[-1]}"]
        return tuple(parts)
    if arch.startswith("vgg"):
        from .backbones.vgg import torch_scope_map

        scope = torch_scope_map(arch).get(layer)
        if scope is None:
            return None  # classifier.6 (the 1000-way layer SSN replaces)
        return (scope,)
    if arch.startswith("resnet") and "." in layer:
        parts = layer.split(".")
        out = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if p.startswith("layer") and i + 1 < len(parts) and parts[i + 1].isdigit():
                out.append(f"{p}_{parts[i + 1]}")
                i += 2
            elif p == "downsample" and i + 1 < len(parts):
                out.append("downsample_conv" if parts[i + 1] == "0"
                           else "downsample_bn")
                i += 2
            else:
                out.append(p)
                i += 1
        return tuple(out)
    return (layer,)


def _set_nested(tree: dict, path, leaf_name: str, value: np.ndarray) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def convert_torch_backbone_state(state_dict: Dict[str, Any],
                                 arch: str = "BNInception"
                                 ) -> Tuple[dict, dict]:
    """Torch backbone state dict -> (params, batch_stats) flax trees."""
    state_dict = strip_prefix(state_dict, "module.")
    state_dict = strip_prefix(state_dict, "base_model.")
    params: dict = {}
    batch_stats: dict = {}

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = _to_numpy(value)
        layer, _, leaf = key.rpartition(".")
        path = _nest_path(layer, arch)
        if path is None:
            continue  # layer deliberately not mapped (e.g. vgg classifier.6)
        is_bn = layer.endswith("_bn") or layer.endswith("bn")
        if leaf == "weight":
            if arr.ndim == 4:       # conv OIHW -> HWIO
                _set_nested(params, path, "kernel", arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:     # linear (O, I) -> (I, O)
                _set_nested(params, path, "kernel", arr.T)
            elif is_bn or arr.ndim == 1:
                _set_nested(params, path, "scale", arr)
        elif leaf == "bias":
            _set_nested(params, path, "bias", arr)
        elif leaf == "running_mean":
            _set_nested(batch_stats, path, "mean", arr)
        elif leaf == "running_var":
            _set_nested(batch_stats, path, "var", arr)
    return params, batch_stats


def convert_torch_ssn_checkpoint(checkpoint: Dict[str, Any],
                                 arch: str = "BNInception") -> Dict[str, Any]:
    """Full reference SSN checkpoint dict -> our checkpoint dict.

    ``checkpoint`` is the torch-saved mapping with ``state_dict``,
    ``reg_stats``, ``epoch``, ``best_loss`` (ssn_train.py:160-169).
    """
    sd = strip_prefix(checkpoint["state_dict"], "module.")
    backbone_sd = {k[len("base_model."):]: v for k, v in sd.items()
                   if k.startswith("base_model.")}
    params, batch_stats = convert_torch_backbone_state(backbone_sd, arch)
    out_params = {"backbone": params}
    out_stats = {"backbone": batch_stats} if batch_stats else {}

    for head in ("activity_fc", "completeness_fc", "regressor_fc", "classifier_fc"):
        w_key, b_key = f"{head}.weight", f"{head}.bias"
        if w_key in sd:
            out_params[head] = {"kernel": _to_numpy(sd[w_key]).T,
                                "bias": _to_numpy(sd[b_key])}

    result = {
        "params": out_params,
        "batch_stats": out_stats,
        "epoch": int(checkpoint.get("epoch", 0)),
        "arch": checkpoint.get("arch", arch),
        "best_loss": float(checkpoint.get("best_loss", float("inf"))),
        "reg_stats": (_to_numpy(checkpoint["reg_stats"])
                      if checkpoint.get("reg_stats") is not None else None),
        "extra": {},
    }
    return result


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a reference .pth/.pth.tar checkpoint (CPU)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def convert_first_conv_cross_modality(kernel: np.ndarray,
                                      new_in_channels: int) -> np.ndarray:
    """RGB first-conv kernel (H, W, 3, O) -> (H, W, C_new, O) by channel-mean
    tiling (the reference's flow/diff model construction,
    ssn_models.py:318-343)."""
    mean = kernel.mean(axis=2, keepdims=True)
    return np.broadcast_to(mean, kernel.shape[:2] + (new_in_channels,)
                           + kernel.shape[3:]).copy()


def cross_modality_init(params: dict, first_conv_name: str,
                        new_in_channels: int) -> dict:
    """Return params with the named first conv converted to a new channel count."""
    import copy

    out = copy.deepcopy(params)
    node = out
    # first conv may be nested (backbone scope)
    if "backbone" in node:
        node = node["backbone"]
    conv = node[first_conv_name]
    conv["kernel"] = convert_first_conv_cross_modality(
        np.asarray(conv["kernel"]), new_in_channels)
    return out
