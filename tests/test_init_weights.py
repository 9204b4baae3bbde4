"""Pretrained-init wiring: URL -> cache path -> converter -> state graft
(the reference's model_zoo.load_url flow, ssn_train.py:38-58, offline)."""

import dataclasses
import os

import numpy as np
import pytest

from action_detection_tpu.config import (SamplingConfig, get_configs,
                                         resolve_pretrained_init)


def test_resolver_rgb_imagenet_is_none():
    cfg = get_configs("thumos14")
    assert resolve_pretrained_init(cfg, "BNInception", "RGB") is None


def test_resolver_errors_helpfully_when_uncached(monkeypatch, tmp_path):
    monkeypatch.setenv("ADT_MODEL_CACHE", str(tmp_path))
    cfg = get_configs("thumos14")
    with pytest.raises(FileNotFoundError) as ei:
        resolve_pretrained_init(cfg, "BNInception", "Flow")
    msg = str(ei.value)
    assert "https://" in msg and str(tmp_path) in msg and "egress" in msg


def test_resolver_finds_cached_file(monkeypatch, tmp_path):
    monkeypatch.setenv("ADT_MODEL_CACHE", str(tmp_path))
    cfg = get_configs("thumos14")
    url = cfg.kinetics_pretrain["BNInception"]["RGB"]
    fname = url.rsplit("/", 1)[-1]
    (tmp_path / fname).write_bytes(b"x")
    path = resolve_pretrained_init(cfg, "BNInception", "RGB", kinetics=True)
    assert path == str(tmp_path / fname)


def test_resolver_unknown_arch_raises_keyerror():
    cfg = get_configs("thumos14")
    with pytest.raises(KeyError):
        resolve_pretrained_init(cfg, "TinyConv", "RGB", kinetics=True)


def test_apply_init_weights_kinetics_end_to_end(monkeypatch, tmp_path):
    """Full flow on a TinyConv fixture: cached torch checkpoint -> converted
    backbone grafted into the train state."""
    import torch

    import jax
    import jax.numpy as jnp

    from action_detection_tpu.models import SSN
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.models.convert import convert_torch_backbone_state
    from action_detection_tpu.train import (create_train_state, load_checkpoint,
                                            make_optimizer)
    from action_detection_tpu.train.init_weights import apply_init_weights
    from tests.test_convert import make_torch_style_backbone_sd

    monkeypatch.setenv("ADT_MODEL_CACHE", str(tmp_path))

    backbone, _, spec = get_backbone("TinyConv", "RGB")
    bvars = backbone.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          make_torch_style_backbone_sd(bvars, np.random.RandomState(0)).items()}
    url = "https://example.invalid/zoo/tinyconv_kinetics-feedc0de.pth"
    torch.save({"state_dict": sd}, tmp_path / url.rsplit("/", 1)[-1])

    cfg = dataclasses.replace(
        get_configs("thumos14"),
        kinetics_pretrain={"TinyConv": {"RGB": url}})

    model = SSN(num_class=3, base_model="TinyConv", dropout=0.0)
    tx = make_optimizer(1e-3, [20], steps_per_epoch=10)
    rng = np.random.RandomState(0)
    batch = {"frames": rng.randint(0, 256, (8, 9, 32, 32, 3)).astype(np.uint8),
             "scaling": np.ones((8, 2), np.float32)}
    state = create_train_state(model, tx, batch, spec)

    class Args:
        init_weights = ""
        kinetics_pretrain = True
        arch = "TinyConv"
        modality = "RGB"

    new_state = apply_init_weights(state, Args, cfg, load_checkpoint)
    want, _ = convert_torch_backbone_state(sd, "TinyConv")
    got = jax.device_get(new_state.params["backbone"])
    np.testing.assert_allclose(got["conv1_7x7_s2"]["kernel"],
                               want["conv1_7x7_s2"]["kernel"], atol=0)
    np.testing.assert_allclose(
        jax.device_get(new_state.batch_stats["backbone"])["conv1_7x7_s2_bn"]["mean"],
        np.asarray(sd["conv1_7x7_s2_bn.running_mean"]), atol=0)


def test_reference_checkpoint_resolver(monkeypatch, tmp_path):
    """--use_reference resolution: published URL -> cache path, erroring
    helpfully offline (ssn_test.py:119-125's model_zoo.load_url, cached)."""
    from action_detection_tpu.config import (get_reference_model_url,
                                             resolve_reference_checkpoint)

    monkeypatch.setenv("ADT_MODEL_CACHE", str(tmp_path))
    with pytest.raises(FileNotFoundError) as ei:
        resolve_reference_checkpoint("thumos14", "RGB", "ImageNet",
                                     "BNInception")
    assert "https://" in str(ei.value) and str(tmp_path) in str(ei.value)

    url = get_reference_model_url("thumos14", "RGB", "ImageNet", "BNInception")
    fname = url.rsplit("/", 1)[-1]
    (tmp_path / fname).write_bytes(b"x")
    assert resolve_reference_checkpoint(
        "thumos14", "RGB", "ImageNet", "BNInception") == str(tmp_path / fname)


def test_msgpack_init_weights_grafts_batch_stats(tmp_path):
    """--init_weights with an msgpack checkpoint must carry the BN running
    stats along with the params — frozen-BN backbones are useless with
    fresh-init statistics (the reference's load_state_dict carries
    running_mean/var, ssn_train.py:42)."""
    import numpy as np

    from action_detection_tpu.config import SamplingConfig
    from action_detection_tpu.models import SSN
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.train import (create_train_state, load_checkpoint,
                                            make_optimizer, save_checkpoint)
    from action_detection_tpu.train.init_weights import apply_init_weights

    model = SSN(num_class=3, base_model="TinyConv", dropout=0.0)
    _, _, spec = get_backbone("TinyConv", "RGB")
    tx = make_optimizer(1e-3, [20], steps_per_epoch=10)
    rng = np.random.RandomState(0)
    batch = {"frames": rng.randint(0, 256, (8, 9, 32, 32, 3)).astype(np.uint8),
             "scaling": np.ones((8, 2), np.float32)}
    state = create_train_state(model, tx, batch, spec)

    # source checkpoint with distinctive BN stats
    import jax

    src_stats = jax.tree_util.tree_map(lambda x: np.asarray(x) + 7.0,
                                       jax.device_get(state.batch_stats))
    path = str(tmp_path / "init_checkpoint.msgpack")
    save_checkpoint(path, jax.device_get(state.params), np.zeros((2, 2)),
                    batch_stats=src_stats)

    class Args:
        init_weights = path
        kinetics_pretrain = False
        arch = "TinyConv"
        modality = "RGB"

    out = apply_init_weights(state, Args, None, load_checkpoint)
    got = jax.device_get(out.batch_stats)["backbone"]
    want = src_stats["backbone"]
    leaf = next(iter(want))
    np.testing.assert_allclose(got[leaf]["mean"], want[leaf]["mean"])


def test_flow_with_uncached_url_falls_back_gracefully(capsys, monkeypatch,
                                                      tmp_path):
    """BNInception Flow HAS a published flow_init URL; when it is not in the
    local cache the implicit init must warn and continue (the reference
    downloads it — ssn_train.py:55-58 — which zero-egress cannot), not crash
    the run. Only the explicit --kinetics_pretrain ask errors hard."""
    from action_detection_tpu.train import load_checkpoint
    from action_detection_tpu.train.init_weights import apply_init_weights

    monkeypatch.setenv("ADT_MODEL_CACHE", str(tmp_path))

    class Args:
        init_weights = ""
        kinetics_pretrain = False
        arch = "BNInception"
        modality = "Flow"

    cfg = get_configs("thumos14")
    sentinel = object()
    out = apply_init_weights(sentinel, Args, cfg, load_checkpoint)
    assert out is sentinel  # state untouched -> framework init kept
    msg = capsys.readouterr().out
    assert "WARNING" in msg and "not cached" in msg and "https://" in msg


def test_flow_without_url_falls_back_gracefully(capsys):
    import jax
    import jax.numpy as jnp

    from action_detection_tpu.models import SSN
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.train import (create_train_state, load_checkpoint,
                                            make_optimizer)
    from action_detection_tpu.train.init_weights import apply_init_weights

    _, _, spec = get_backbone("TinyConv", "Flow")
    model = SSN(num_class=3, base_model="TinyConv", modality="Flow",
                dropout=0.0)
    tx = make_optimizer(1e-3, [20], steps_per_epoch=10)
    rng = np.random.RandomState(0)
    batch = {"frames": rng.randint(0, 256, (8, 9, 32, 32, 10)).astype(np.uint8),
             "scaling": np.ones((8, 2), np.float32)}
    state = create_train_state(model, tx, batch, spec, modality="Flow")

    class Args:
        init_weights = ""
        kinetics_pretrain = False
        arch = "TinyConv"
        modality = "Flow"

    cfg = get_configs("thumos14")
    new_state = apply_init_weights(state, Args, cfg, load_checkpoint)
    assert "no flow_init URL" in capsys.readouterr().out
    np.testing.assert_allclose(
        np.asarray(new_state.params["backbone"]["conv2_3x3"]["kernel"]),
        np.asarray(state.params["backbone"]["conv2_3x3"]["kernel"]))
