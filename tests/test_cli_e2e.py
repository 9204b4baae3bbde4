"""End-to-end CLI smoke test: ssn_train -> ssn_test -> eval_detection_results
on synthetic frames with the TinyConv backbone (the full minimum slice of
SURVEY.md §7 build order, runnable anywhere)."""

import os
import pickle

import numpy as np
import pytest

# heavy tier: reference-oracle / e2e / real-backbone tests (see pytest.ini)
pytestmark = pytest.mark.slow

from tests.test_datasets import write_proposal_list


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    write_proposal_list(d / "thumos14_tag_val_proposal_list.txt", n_videos=3)
    write_proposal_list(d / "thumos14_tag_test_proposal_list.txt", n_videos=2,
                        seed=7)
    return d


def test_train_test_eval_pipeline(workdir, monkeypatch):
    monkeypatch.chdir(workdir)

    from action_detection_tpu.cli.ssn_train import main as train_main
    from action_detection_tpu.cli.ssn_test import main as test_main
    from action_detection_tpu.cli.eval_detection_results import main as eval_main

    # 1. train one tiny epoch (on an explicit 2-device subset: the
    # reference's --gpus list, ssn_opts.py:60)
    train_main(["thumos14", "RGB", "--arch", "TinyConv", "--synthetic_data",
                "-b", "2", "--epochs", "1", "--tem", "1", "-j", "1",
                "--prop_file_dir", str(workdir), "--lr", "0.001",
                "--print-freq", "1", "--dropout", "0.0", "--gpus", "0", "1"])
    ckpt = "ssn_thumos14_TinyConv_rgb_checkpoint.msgpack"
    assert os.path.exists(ckpt)

    # 2. score the test set
    test_main(["thumos14", "RGB", ckpt, "scores.pkl", "--arch", "TinyConv",
               "--synthetic_data", "--prop_file_dir", str(workdir),
               "--frame_interval", "30", "--test_batchsize", "8",
               "--save_raw_scores", "raw.pkl", "--gpus", "0", "1"])
    with open("scores.pkl", "rb") as f:
        scores = pickle.load(f)
    assert len(scores) == 2
    for vid, tp in scores.items():
        rel, act, comp, reg = tp
        assert act.shape[1] == 21 and comp.shape[1] == 20
        assert reg.shape[1:] == (20, 2)
        assert np.isfinite(act).all()

    # 3. evaluate to a mAP table
    ap = eval_main(["thumos14", "scores.pkl", "--prop_file_dir", str(workdir),
                    "-j", "2"])
    assert ap.shape == (20, 9)
    assert np.isfinite(ap).all()
    # reference side outputs (eval_detection_results.py:205-206)
    import pandas as pd
    with open("gt_dump.pc", "rb") as f:
        gt_by_cls = pickle.load(f)
    with open("pred_dump.pc", "rb") as f:
        plain_detections = pickle.load(f)
    assert len(gt_by_cls) == 20 and len(plain_detections) == 20
    assert list(plain_detections[0].columns) == ["video-id", "cls", "t-start",
                                                 "t-end", "score"]
    assert isinstance(gt_by_cls[0], pd.DataFrame)

    # two-stream fusion path: evaluate the same pickle twice with weights
    ap2 = eval_main(["thumos14", "scores.pkl", "scores.pkl",
                     "--prop_file_dir", str(workdir), "-j", "2",
                     "--score_weights", "1", "2"])
    np.testing.assert_allclose(ap2, ap, atol=1e-6)


def test_binary_train_and_test_and_tag(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    # actionness config points at sw lists; reuse the tag fixtures
    import shutil

    shutil.copy("thumos14_tag_val_proposal_list.txt",
                "thumos14_sw_val_proposal_list.txt")
    shutil.copy("thumos14_tag_test_proposal_list.txt",
                "thumos14_sw_test_proposal_list.txt")

    from action_detection_tpu.cli.binary_train import main as btrain
    from action_detection_tpu.cli.binary_test import main as btest

    btrain(["thumos14", "RGB", "--arch", "TinyConv", "--synthetic_data",
            "--epochs", "1", "--tem", "1", "-j", "1", "-b", "2",
            "--prop_file_dir", str(workdir), "--print-freq", "1",
            "--dropout", "0.0"])
    ckpt = "ssn_thumos14_TinyConv_rgb_binary_checkpoint.msgpack"
    assert os.path.exists(ckpt)

    btest(["thumos14", "RGB", "testing", ckpt, "binary_scores.pkl", "--arch",
           "TinyConv", "--synthetic_data", "--prop_file_dir", str(workdir),
           "--frame_interval", "30", "--test_batchsize", "8"])
    with open("binary_scores.pkl", "rb") as f:
        bscores = pickle.load(f)
    for vid, arr in bscores.items():
        assert arr.ndim == 3 and arr.shape[1:] == (10, 2)
        assert np.isfinite(arr).all()

    # device-side 10-crop (default) must match the host-crop path per crop
    btest(["thumos14", "RGB", "testing", ckpt, "binary_scores_host.pkl",
           "--arch", "TinyConv", "--synthetic_data", "--prop_file_dir",
           str(workdir), "--frame_interval", "30", "--test_batchsize", "8",
           "--host_crops"])
    with open("binary_scores_host.pkl", "rb") as f:
        hscores = pickle.load(f)
    assert set(hscores) == set(bscores)
    for vid in bscores:
        np.testing.assert_allclose(bscores[vid], hscores[vid], atol=1e-5)

    # 'validation' scores the TRAIN list on thumos14 (the reference's route
    # for generating TRAINING proposals, binary_test.py:41-44) — 3 fixture
    # videos there vs 2 in the test list
    btest(["thumos14", "RGB", "validation", ckpt, "binary_scores_val.pkl",
           "--arch", "TinyConv", "--synthetic_data", "--prop_file_dir",
           str(workdir), "--frame_interval", "30", "--test_batchsize", "8"])
    with open("binary_scores_val.pkl", "rb") as f:
        vscores = pickle.load(f)
    assert len(vscores) == 3 and len(bscores) == 2

    # multi-device fan-out (the reference's round-robin --gpus worker pool,
    # binary_test.py:98-167): scores must be IDENTICAL to a single-device
    # run — videos are independent and every device runs the same committed
    # weights
    btest(["thumos14", "RGB", "testing", ckpt, "binary_scores_1dev.pkl",
           "--arch", "TinyConv", "--synthetic_data", "--prop_file_dir",
           str(workdir), "--frame_interval", "30", "--test_batchsize", "8",
           "--gpus", "0"])
    btest(["thumos14", "RGB", "testing", ckpt, "binary_scores_4dev.pkl",
           "--arch", "TinyConv", "--synthetic_data", "--prop_file_dir",
           str(workdir), "--frame_interval", "30", "--test_batchsize", "8",
           "--gpus", "0", "1", "2", "3"])
    with open("binary_scores_1dev.pkl", "rb") as f:
        s1 = pickle.load(f)
    with open("binary_scores_4dev.pkl", "rb") as f:
        s4 = pickle.load(f)
    assert set(s1) == set(s4) == set(bscores)
    for vid in s1:
        np.testing.assert_array_equal(s1[vid], s4[vid])

    # --shared_stem needs the int8-e2e trunk (TinyConv has none): hard error,
    # not a silent fall-through; the BNInception default-on is pinned in
    # tests/test_sharedstem.py (feature layout) + the ssn_test CLI test above
    with pytest.raises(SystemExit, match="shared_stem"):
        btest(["thumos14", "RGB", "testing", ckpt, "x.pkl", "--arch",
               "TinyConv", "--synthetic_data", "--prop_file_dir",
               str(workdir), "--frame_interval", "30", "--shared_stem"])


def test_ssn_test_int8_collects_multivideo_calibration(workdir, monkeypatch):
    """--int8 must calibrate on frames spread across several test videos
    (one-video max-abs calibration under-covers the activation range).
    The scorer itself is stubbed — this pins the CLI's calibration plumbing."""
    monkeypatch.chdir(workdir)

    from action_detection_tpu.infer import scorer as scorer_mod
    from action_detection_tpu.train import save_checkpoint

    captured = {}

    class FakeScorer:
        needs_lazy_calibration = False   # calibration_frames always passed

        def __init__(self, model, params, batch_stats, spec, **kw):
            captured["calib"] = kw.get("calibration_frames")
            captured["quantize"] = kw.get("quantize")
            captured["shared_stem"] = kw.get("shared_stem")

        def export_quantized(self):
            return None    # lazy-mode shape: siblings calibrate themselves

        def close(self):
            pass

        def score_video(self, sample, provider, keep_raw=False):
            P = sample.prop_ticks.shape[0]
            return scorer_mod.ScoredVideo(
                sample.video_id, sample.rel_props,
                np.zeros((P, 21), np.float32), np.zeros((P, 20), np.float32),
                np.zeros((P, 20, 2), np.float32))

    monkeypatch.setattr(scorer_mod, "ProposalScorer", FakeScorer)

    ckpt = "int8_stub_checkpoint.msgpack"
    save_checkpoint(ckpt, {"w": np.zeros(2, np.float32)},
                    np.zeros((2, 2), np.float32), epoch=1, arch="BNInception",
                    best_loss=1.0)

    from action_detection_tpu.cli.ssn_test import main as test_main

    test_main(["thumos14", "RGB", ckpt, "int8_scores.pkl",
               "--synthetic_data", "--prop_file_dir", str(workdir),
               "--int8", "--gpus", "0"])

    assert captured["quantize"] == "e2e"     # the default int8 mode
    calib = captured["calib"]
    # 2 test videos x 1 tick x 10 crops of uint8 input-size frames
    assert calib is not None and calib.dtype == np.uint8
    assert calib.shape == (20, 224, 224, 3), calib.shape
    with open("int8_scores.pkl", "rb") as f:
        assert len(pickle.load(f)) == 2

    # int8 defaults ON for BNInception (no flag needed) and --no_int8 opts
    # out; shared-stem rides the same default (on-chip win measured in
    # scripts/sharedstem_probe.py) and --no_shared_stem opts out alone
    test_main(["thumos14", "RGB", ckpt, "int8_scores.pkl",
               "--synthetic_data", "--prop_file_dir", str(workdir),
               "--gpus", "0"])
    assert captured["quantize"] == "e2e" and captured["calib"] is not None
    assert captured["shared_stem"] is True
    test_main(["thumos14", "RGB", ckpt, "int8_scores.pkl",
               "--synthetic_data", "--prop_file_dir", str(workdir),
               "--no_shared_stem", "--gpus", "0"])
    assert captured["quantize"] == "e2e" and captured["shared_stem"] is False
    test_main(["thumos14", "RGB", ckpt, "int8_scores.pkl",
               "--synthetic_data", "--prop_file_dir", str(workdir),
               "--no_int8", "--gpus", "0"])
    assert captured["quantize"] is False and captured["calib"] is None
    # --no_int8 implies no shared stem (it requires the int8-e2e trunk)
    assert captured["shared_stem"] is False


def test_anet_actionness_100way_head(workdir, monkeypatch):
    """activitynet1.2 actionness: the reference's 100-wide head trained on
    0/1 fg/bg targets (binary_model.py:124), scored to (frames, crops, 100)
    pickles that TAG grouping thresholds at class column 1."""
    monkeypatch.chdir(workdir)
    import shutil

    shutil.copy("thumos14_tag_val_proposal_list.txt",
                "activitynet1.2_sw_train_proposal_list.txt")
    shutil.copy("thumos14_tag_test_proposal_list.txt",
                "activitynet1.2_sw_val_proposal_list.txt")

    from action_detection_tpu.cli.binary_test import main as btest
    from action_detection_tpu.cli.binary_train import main as btrain

    btrain(["activitynet1.2", "RGB", "--arch", "TinyConv", "--synthetic_data",
            "--epochs", "1", "-j", "1", "-b", "2", "--prop_file_dir",
            str(workdir), "--print-freq", "5", "--dropout", "0.0"])
    ckpt = "ssn_activitynet1.2_TinyConv_rgb_binary_checkpoint.msgpack"
    assert os.path.exists(ckpt)

    # anet subset mapping: training -> train list, validation -> test list
    btest(["activitynet1.2", "RGB", "validation", ckpt, "anet_act.pkl",
           "--arch", "TinyConv", "--synthetic_data", "--prop_file_dir",
           str(workdir), "--frame_interval", "30", "--test_batchsize", "8"])
    with open("anet_act.pkl", "rb") as f:
        scores = pickle.load(f)
    assert len(scores) == 2
    for arr in scores.values():
        assert arr.shape[1:] == (10, 100)
        assert np.isfinite(arr).all()

    # TAG labeling consumes the 100-wide score matrix (class 0 -> column 1,
    # exactly as the reference's label_frame_by_threshold with topk_cls=[0])
    from action_detection_tpu.ops.tag import (build_box_by_search,
                                              label_frame_by_threshold)
    mat = next(iter(scores.values())).mean(axis=1)       # (T, 100)
    labeled = label_frame_by_threshold(mat, [0], bw=3,
                                       thresh=[0.005, 0.01], multicrop=False)
    boxes = build_box_by_search(labeled, np.array([0.0, 0.3]))
    assert isinstance(boxes, list)


def test_flow_modality_train_and_test(workdir, monkeypatch):
    """Flow two-stream path: 10-channel stacked flow through train + score."""
    monkeypatch.chdir(workdir)

    from action_detection_tpu.cli.ssn_train import main as train_main
    from action_detection_tpu.cli.ssn_test import main as test_main

    train_main(["thumos14", "Flow", "--arch", "TinyConv", "--synthetic_data",
                "-b", "2", "--epochs", "1", "--tem", "1", "-j", "1",
                "--prop_file_dir", str(workdir), "--print-freq", "1",
                "--dropout", "0.0"])
    ckpt = "ssn_thumos14_TinyConv_flow_checkpoint.msgpack"
    assert os.path.exists(ckpt)

    test_main(["thumos14", "Flow", ckpt, "scores_flow.pkl", "--arch", "TinyConv",
               "--synthetic_data", "--prop_file_dir", str(workdir),
               "--frame_interval", "60", "--test_batchsize", "4"])
    with open("scores_flow.pkl", "rb") as f:
        scores = pickle.load(f)
    for vid, tp in scores.items():
        assert np.isfinite(tp[1]).all()

    # fused two-stream evaluation
    from action_detection_tpu.cli.eval_detection_results import main as eval_main
    ap = eval_main(["thumos14", "scores.pkl", "scores_flow.pkl",
                    "--prop_file_dir", str(workdir), "-j", "2",
                    "--score_weights", "1", "1.5"])
    assert np.isfinite(ap).all()


def test_torch_checkpoint_loading_in_cli(workdir, monkeypatch):
    """ssn_test accepts a reference-style torch .pth.tar and converts it."""
    monkeypatch.chdir(workdir)
    import torch
    import jax
    import jax.numpy as jnp

    from action_detection_tpu.models import SSN
    from tests.test_convert import make_torch_style_backbone_sd

    model = SSN(num_class=20, base_model="TinyConv", dropout=0.0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 9, 32, 32, 3)), jnp.ones((1, 2)),
                           train=False)
    rng = np.random.RandomState(0)
    backbone_vars = {"params": variables["params"]["backbone"],
                     "batch_stats": variables["batch_stats"]["backbone"]}
    sd = {f"module.base_model.{k}": torch.from_numpy(np.asarray(v))
          for k, v in make_torch_style_backbone_sd(backbone_vars, rng).items()}
    D = 32
    for head, out in (("activity_fc", 21), ("completeness_fc", 20),
                      ("regressor_fc", 40)):
        din = D if head == "activity_fc" else 3 * D
        sd[f"module.{head}.weight"] = torch.from_numpy(
            rng.randn(out, din).astype(np.float32) * 0.01)
        sd[f"module.{head}.bias"] = torch.zeros(out)
    torch.save({"state_dict": sd, "epoch": 1, "arch": "TinyConv",
                "best_loss": 1.0,
                "reg_stats": torch.from_numpy(np.array([[0.0, 0.0], [1.0, 1.0]]))},
               "ref_ckpt.pth.tar")

    from action_detection_tpu.cli.ssn_test import main as test_main
    test_main(["thumos14", "RGB", "ref_ckpt.pth.tar", "scores_torch.pkl",
               "--arch", "TinyConv", "--synthetic_data",
               "--prop_file_dir", str(workdir), "--frame_interval", "60",
               "--test_batchsize", "4"])
    with open("scores_torch.pkl", "rb") as f:
        scores = pickle.load(f)
    assert all(np.isfinite(tp[1]).all() for tp in scores.values())


def test_torch_init_weights_cross_modality(workdir, monkeypatch):
    """--init_weights with an RGB torch backbone initializes a Flow model by
    first-conv channel-mean tiling."""
    monkeypatch.chdir(workdir)
    import torch
    import jax
    import jax.numpy as jnp

    from action_detection_tpu.models.backbones import get_backbone
    from tests.test_convert import make_torch_style_backbone_sd

    backbone, _, _ = get_backbone("TinyConv", "RGB")
    variables = backbone.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          make_torch_style_backbone_sd(variables, np.random.RandomState(0)).items()}
    torch.save({"state_dict": sd}, "rgb_backbone.pth")

    from action_detection_tpu.cli.ssn_train import main as train_main
    train_main(["thumos14", "Flow", "--arch", "TinyConv", "--synthetic_data",
                "-b", "2", "--epochs", "1", "--tem", "1", "-j", "1",
                "--prop_file_dir", str(workdir), "--print-freq", "1",
                "--dropout", "0.0", "--init_weights", "rgb_backbone.pth"])
    assert os.path.exists("ssn_thumos14_TinyConv_flow_checkpoint.msgpack")


def test_activitynet_eval_config(workdir, monkeypatch):
    """ActivityNet eval path: 100 classes, top_k=60 filter, IoU 0.5:0.05:0.95."""
    monkeypatch.chdir(workdir)
    from tests.test_datasets import write_proposal_list

    write_proposal_list("activitynet1.2_tag_val_proposal_list.txt", n_videos=2,
                        seed=3)
    rng = np.random.RandomState(0)
    scores = {}
    for v in range(2):
        P = 10
        rel = np.sort(rng.rand(P, 2), axis=1)
        scores[f"video_{v}"] = (rel, rng.randn(P, 101), rng.randn(P, 100),
                                rng.randn(P, 100, 2) * 0.01)
    with open("anet_scores.pkl", "wb") as f:
        pickle.dump(scores, f)

    from action_detection_tpu.cli.eval_detection_results import main as eval_main
    ap = eval_main(["activitynet1.2", "anet_scores.pkl",
                    "--prop_file_dir", str(workdir), "-j", "2"])
    assert ap.shape == (100, 10)
    assert np.isfinite(ap).all()
