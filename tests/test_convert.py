"""Checkpoint converter tests: synthetic torch-style state dicts -> flax trees
that load into our BNInception/SSN without shape mismatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from action_detection_tpu.models import SSN
from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.models.convert import (
    convert_torch_backbone_state, convert_torch_ssn_checkpoint,
    cross_modality_init, strip_prefix,
)


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def make_torch_style_backbone_sd(variables, rng):
    """Fabricate a reference-style flat state dict matching our param shapes."""
    sd = {}
    flat_p = flatten(variables["params"])
    flat_s = flatten(variables["batch_stats"])
    for path, v in flat_p.items():
        layer = path[-2]
        leaf = path[-1]
        shape = np.asarray(v).shape
        if leaf == "kernel":
            # fan-in-scaled so activations stay finite through 30+ layers
            fan_in = np.prod(shape[:-1])
            w = (rng.randn(*shape) / np.sqrt(fan_in)).astype(np.float32)
            sd[f"{layer}.weight"] = w.transpose(3, 2, 0, 1)
        elif leaf == "scale":
            sd[f"{layer}.weight"] = (1.0 + 0.1 * rng.randn(*shape)).astype(np.float32)
        elif leaf == "bias":
            sd[f"{layer}.bias"] = (0.1 * rng.randn(*shape)).astype(np.float32)
    for path, v in flat_s.items():
        layer = path[-2]
        leaf = path[-1]
        name = {"mean": "running_mean", "var": "running_var"}[leaf]
        shape = np.asarray(v).shape
        if leaf == "var":
            sd[f"{layer}.{name}"] = (1.0 + rng.rand(*shape)).astype(np.float32)
        else:
            sd[f"{layer}.{name}"] = (0.1 * rng.randn(*shape)).astype(np.float32)
        sd[f"{layer}.num_batches_tracked"] = np.int64(1)
    return sd


def test_backbone_conversion_shapes_match():
    backbone, _, _ = get_backbone("BNInception", "RGB")
    variables = backbone.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.RandomState(0)
    sd = make_torch_style_backbone_sd(variables, rng)

    params, batch_stats = convert_torch_backbone_state(sd, "BNInception")
    ref_p = flatten(variables["params"])
    got_p = flatten(params)
    assert set(got_p) == set(ref_p)
    for k in ref_p:
        assert got_p[k].shape == np.asarray(ref_p[k]).shape, k
    ref_s = flatten(variables["batch_stats"])
    got_s = flatten(batch_stats)
    assert set(got_s) == set(ref_s)

    # converted weights actually run through the model
    out = backbone.apply({"params": params, "batch_stats": batch_stats},
                         jnp.ones((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(out)).all()

    # conv weight layout: OIHW -> HWIO round trip
    w = sd["conv1_7x7_s2.weight"]
    np.testing.assert_array_equal(got_p[("conv1_7x7_s2", "kernel")],
                                  w.transpose(2, 3, 1, 0))


def test_full_ssn_checkpoint_conversion():
    K = 4
    model = SSN(num_class=K, base_model="BNInception", dropout=0.0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 9, 64, 64, 3)), jnp.ones((1, 2)),
                           train=False)
    rng = np.random.RandomState(1)
    backbone_vars = {"params": variables["params"]["backbone"],
                     "batch_stats": variables["batch_stats"]["backbone"]}
    sd = {f"base_model.{k}": v
          for k, v in make_torch_style_backbone_sd(backbone_vars, rng).items()}
    D = 1024
    sd["activity_fc.weight"] = rng.randn(K + 1, D).astype(np.float32)
    sd["activity_fc.bias"] = rng.randn(K + 1).astype(np.float32)
    sd["completeness_fc.weight"] = rng.randn(K, 3 * D).astype(np.float32)
    sd["completeness_fc.bias"] = rng.randn(K).astype(np.float32)
    sd["regressor_fc.weight"] = rng.randn(2 * K, 3 * D).astype(np.float32)
    sd["regressor_fc.bias"] = rng.randn(2 * K).astype(np.float32)
    # DataParallel prefix handling
    sd = {f"module.{k}": v for k, v in sd.items()}

    ck = convert_torch_ssn_checkpoint(
        {"state_dict": sd, "epoch": 5, "arch": "BNInception",
         "best_loss": 1.25, "reg_stats": np.ones((2, 2))})
    assert ck["epoch"] == 5 and abs(ck["best_loss"] - 1.25) < 1e-9
    np.testing.assert_array_equal(ck["reg_stats"], np.ones((2, 2)))

    # converted tree applies cleanly
    out = model.apply({"params": ck["params"],
                       "batch_stats": ck["batch_stats"]},
                      jnp.ones((1, 9, 64, 64, 3)), jnp.ones((1, 2)),
                      train=False)
    act, comp, reg = out
    assert act.shape == (1, K + 1) and np.isfinite(np.asarray(act)).all()
    # linear transpose: kernel == weight.T
    np.testing.assert_array_equal(
        ck["params"]["activity_fc"]["kernel"],
        sd["module.activity_fc.weight"].T)


def test_cross_modality_init():
    backbone, _, _ = get_backbone("BNInception", "RGB")
    variables = backbone.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = jax.tree.map(np.asarray, variables["params"])
    flow_params = cross_modality_init({"backbone": params}, "conv1_7x7_s2", 10)
    k = flow_params["backbone"]["conv1_7x7_s2"]["kernel"]
    assert k.shape == (7, 7, 10, 64)
    # every new channel equals the RGB channel mean
    np.testing.assert_allclose(
        k[:, :, 0], np.asarray(params["conv1_7x7_s2"]["kernel"]).mean(axis=2),
        rtol=1e-6)


def test_strip_prefix():
    sd = {"module.a.weight": 1, "b.bias": 2}
    out = strip_prefix(sd, "module.")
    assert out == {"a.weight": 1, "b.bias": 2}


def test_nest_path_arch_mappings():
    from action_detection_tpu.models.convert import _nest_path

    # InceptionV3 tf-slim naming
    assert _nest_path("Conv2d_1a_3x3.conv", "InceptionV3") == ("Conv2d_1a_3x3_conv",)
    assert _nest_path("Mixed_5b.branch1x1.conv", "InceptionV3") == (
        "Mixed_5b", "branch1x1_conv")
    assert _nest_path("Mixed_5b.branch1x1.bn", "InceptionV3") == (
        "Mixed_5b", "branch1x1_bn")
    # torchvision resnet naming
    assert _nest_path("conv1", "resnet50") == ("conv1",)
    assert _nest_path("layer1.0.conv1", "resnet50") == ("layer1_0", "conv1")
    assert _nest_path("layer1.0.downsample.0", "resnet50") == (
        "layer1_0", "downsample_conv")
    assert _nest_path("layer1.0.downsample.1", "resnet50") == (
        "layer1_0", "downsample_bn")


def test_resnet_backbone_conversion_roundtrip():
    """Fabricated torchvision-style resnet18 state dict loads into our tree."""
    import torch

    from action_detection_tpu.models.convert import convert_torch_backbone_state

    backbone, _, _ = get_backbone("resnet18", "RGB")
    variables = backbone.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    flat = flatten(variables["params"])
    stats = flatten(variables["batch_stats"])

    def torch_name(path):
        parts = []
        for p in path[:-1]:
            if p.startswith("layer"):
                l, b = p.split("_")
                parts.extend([l, b])
            elif p == "downsample_conv":
                parts.extend(["downsample", "0"])
            elif p == "downsample_bn":
                parts.extend(["downsample", "1"])
            else:
                parts.append(p)
        return ".".join(parts)

    rng = np.random.RandomState(0)
    sd = {}
    for path, v in flat.items():
        name = torch_name(path)
        shape = np.asarray(v).shape
        if path[-1] == "kernel":
            sd[name + ".weight"] = rng.randn(*shape).astype(np.float32).transpose(3, 2, 0, 1)
        elif path[-1] == "scale":
            sd[name + ".weight"] = np.ones(shape, np.float32)
        else:
            sd[name + ".bias"] = np.zeros(shape, np.float32)
    for path, v in stats.items():
        name = torch_name(path)
        shape = np.asarray(v).shape
        leaf = {"mean": "running_mean", "var": "running_var"}[path[-1]]
        sd[name + "." + leaf] = (np.zeros(shape, np.float32) if leaf == "running_mean"
                                 else np.ones(shape, np.float32))

    params, batch_stats = convert_torch_backbone_state(sd, "resnet18")
    assert set(flatten(params)) == set(flat)
    assert set(flatten(batch_stats)) == set(stats)
    out = backbone.apply({"params": params, "batch_stats": batch_stats},
                         jnp.ones((1, 32, 32, 3)))
    assert np.isfinite(np.asarray(out)).all()
