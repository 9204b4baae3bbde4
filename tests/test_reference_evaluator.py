"""The reference evaluator SCRIPT as an oracle (VERDICT r2 item 4).

``/root/reference/eval_detection_results.py`` is executed as a subprocess on
a shared synthetic score pickle — its unvendored deps stubbed the way
``test_reference_pipeline`` stubs model_zoo/torchvision:

* ``anet_toolkit.Evaluation.eval_detection`` delegates to our
  ``ops.map_eval.compute_average_precision_detection`` (DataFrame -> tuples),
* ``terminaltables.AsciiTable`` prints tab-separated rows,
* a ``sitecustomize`` shim restores the py2-era APIs the script leans on
  (positional ``DataFrame.drop`` axis, Loader-less ``yaml.load``, ``np.int``).

The script's pre-AP detection state (``gt_dump.pc`` / ``pred_dump.pc``,
eval_detection_results.py:189-206) is then diffed against our
``evaluation/`` pipeline (merge -> generate_detections -> per-class NMS ->
regression) for all three filter modes, and the printed mAP row against our
``evaluate_detections``.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

# heavy tier: reference-oracle / e2e / real-backbone tests (see pytest.ini)
pytestmark = pytest.mark.slow

REFERENCE = "/root/reference"
K = 20          # thumos14 num_class (reference data/dataset_cfg.yaml:4)
NMS_TH = 0.2
IOU_RANGE = np.arange(0.1, 1.0, 0.1)   # thumos grid (eval_detection_results.py:212)

_SITECUSTOMIZE = """
import numpy as np
if not hasattr(np, "int"):
    np.int = int
if not hasattr(np, "float"):
    np.float = float
import yaml
_yload = yaml.load
def _load(stream, Loader=None, **kw):
    return _yload(stream, Loader=Loader or yaml.SafeLoader, **kw)
yaml.load = _load
import pandas as pd
_pdrop = pd.DataFrame.drop
def _drop(self, labels=None, axis=0, *a, **kw):
    return _pdrop(self, labels=labels, axis=axis, *a, **kw)
pd.DataFrame.drop = _drop
"""

_TERMINALTABLES = """
class AsciiTable:
    def __init__(self, table_data, title=None):
        self.table_data = table_data
        self.title = title
        self.justify_columns = {}
        self.inner_footing_row_border = False

    @property
    def table(self):
        return "\\n".join("\\t".join(str(c) for c in row)
                          for row in self.table_data)
"""

_ANET_EVAL = """
def compute_average_precision_detection(ground_truth, prediction,
                                        tiou_thresholds):
    from action_detection_tpu.ops.map_eval import (
        compute_average_precision_detection as ours)
    gt = list(zip(ground_truth["video-id"], ground_truth["t-start"],
                  ground_truth["t-end"]))
    pred = list(zip(prediction["video-id"], prediction["t-start"],
                    prediction["t-end"], prediction["score"]))
    return ours(gt, pred, tiou_thresholds)
"""

_CFG_YAML = """
thumos14:
  train_list: thumos14_tag_val
  test_list: thumos14_tag_test
  num_class: 20
  evaluation:
    top_k: 2000
    nms_threshold: 0.2
    softmax_before_filter: true
"""


def _write_prop_list(path, n_videos=4, frames=900, seed=11):
    """Synthetic denormalized proposal list with GT labels across 1..K."""
    rng = np.random.RandomState(seed)
    lines = []
    for v in range(n_videos):
        vid = f"video_test_{v:07d}"
        gt = []
        for g in range(3):
            s = int(rng.randint(30, frames - 250))
            e = s + int(rng.randint(80, 220))
            gt.append((1 + int(rng.randint(K)), s, e))
        props = []
        for label, s, e in gt:           # fg-ish + shifted + background
            props.append((label, 0.85, 0.9, max(1, s - 20), min(frames, e + 10)))
            props.append((label, 0.35, 0.8, s + 40, min(frames, e + 60)))
        props.append((0, 0.0, 0.0, 5, 70))
        props.append((0, 0.0, 0.0, frames - 80, frames - 5))
        lines.append(f"# {v}\n{vid}\n{frames}\n1\n{len(gt)}\n")
        lines.extend(f"{l} {s} {e}\n" for l, s, e in gt)
        lines.append(f"{len(props)}\n")
        lines.extend(f"{l} {iou:.4f} {ov:.4f} {s} {e}\n"
                     for l, iou, ov, s, e in props)
    with open(path, "w") as f:
        f.writelines(lines)


def _make_scores(prop_file, seed):
    """{vid: (rel_props, act, comp, reg)} with rel coords from the list."""
    from action_detection_tpu.data.proposal_io import load_proposal_file

    rng = np.random.RandomState(seed)
    out = {}
    for vid, n_frames, gt, props in load_proposal_file(prop_file):
        P = len(props)
        # prop rows are [label, best_iou, overlap_self, start, end] tokens
        rel = np.array([[float(p[3]) / n_frames, float(p[4]) / n_frames]
                        for p in props], np.float64)
        out[vid] = (rel,
                    rng.randn(P, K + 1).astype(np.float32),
                    rng.randn(P, K).astype(np.float32),
                    (0.1 * rng.randn(P, K, 2)).astype(np.float32))
    return out


@pytest.fixture(scope="module")
def oracle_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_eval")
    stub = root / "stub"
    (stub / "anet_toolkit" / "Evaluation").mkdir(parents=True)
    (stub / "torchvision").mkdir()
    (stub / "sitecustomize.py").write_text(_SITECUSTOMIZE)
    (stub / "terminaltables.py").write_text(_TERMINALTABLES)
    (stub / "torchvision" / "__init__.py").write_text(
        "from types import SimpleNamespace\n"
        "transforms = SimpleNamespace(Compose=object, CenterCrop=object,"
        " Scale=object)\nmodels = SimpleNamespace()\n")
    (stub / "anet_toolkit" / "__init__.py").write_text("")
    (stub / "anet_toolkit" / "Evaluation" / "__init__.py").write_text("")
    (stub / "anet_toolkit" / "Evaluation" / "eval_detection.py").write_text(
        _ANET_EVAL)

    cwd = root / "run"
    (cwd / "data").mkdir(parents=True)
    (cwd / "data" / "dataset_cfg.yaml").write_text(_CFG_YAML)
    prop_file = cwd / "data" / "thumos14_tag_test_proposal_list.txt"
    _write_prop_list(prop_file)

    s1, s2 = _make_scores(str(prop_file), 1), _make_scores(str(prop_file), 2)
    with open(cwd / "s1.pkl", "wb") as f:
        pickle.dump(s1, f, pickle.HIGHEST_PROTOCOL)
    with open(cwd / "s2.pkl", "wb") as f:
        pickle.dump(s2, f, pickle.HIGHEST_PROTOCOL)
    # classifier scores: byte keys with path+extension, the py2 pickle shape
    # the reference decodes (eval_detection_results.py:84-85)
    rng = np.random.RandomState(7)
    cls_scores = {f"some/dir/{vid}.mp4".encode(): rng.rand(K).astype(np.float32)
                  for vid in s1}
    with open(cwd / "cls.pkl", "wb") as f:
        pickle.dump(cls_scores, f, pickle.HIGHEST_PROTOCOL)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("AXON_POOL_SVC_OVERRIDE", None)
    env.pop("AXON_LOOPBACK_RELAY", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = f"{stub}:{repo}"
    return {"cwd": str(cwd), "env": env, "prop_file": str(prop_file),
            "scores": (s1, s2),
            "cls_scores": {vid: cls_scores[f"some/dir/{vid}.mp4".encode()]
                           for vid in s1}}


def _run_reference(oracle_env, extra_args):
    cmd = [sys.executable, os.path.join(REFERENCE, "eval_detection_results.py"),
           "thumos14", "s1.pkl", "s2.pkl", "--score_weights", "2", "1",
           "-j", "2"] + extra_args
    proc = subprocess.run(cmd, cwd=oracle_env["cwd"], env=oracle_env["env"],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    with open(os.path.join(oracle_env["cwd"], "gt_dump.pc"), "rb") as f:
        gt_by_cls = pickle.load(f)
    with open(os.path.join(oracle_env["cwd"], "pred_dump.pc"), "rb") as f:
        pred_by_cls = pickle.load(f)
    map_row = None
    for line in proc.stdout.splitlines():
        if line.startswith("mean AP"):
            map_row = [float(x) for x in line.split("\t")[1:]]
    assert map_row is not None, proc.stdout[-2000:]
    return gt_by_cls, pred_by_cls, map_row


def _ours(oracle_env, top_k, cls_top_k=1, use_cls=False):
    from action_detection_tpu.evaluation import (apply_classwise_nms,
                                                 apply_regression,
                                                 generate_detections,
                                                 merge_score_dicts)

    merged = merge_score_dicts(list(oracle_env["scores"]), weights=[2.0, 1.0])
    dets = generate_detections(
        merged, K, top_k=top_k, softmax_before_filter=True,
        cls_score_dict=oracle_env["cls_scores"] if use_cls else None,
        cls_top_k=cls_top_k)
    dets = apply_classwise_nms(dets, NMS_TH)
    return apply_regression(dets)


def _canon_pred(rows):
    """(vid, t0, t1, score) rows -> (sorted vid list, sorted float array)."""
    rows = sorted(rows, key=lambda r: (r[0], round(r[1], 9), round(r[2], 9),
                                       round(r[3], 9)))
    vids = [r[0] for r in rows]
    arr = np.array([[r[1], r[2], r[3]] for r in rows], np.float64) \
        if rows else np.zeros((0, 3))
    return vids, arr


def _compare(oracle_env, ref_gt, ref_pred, our_dets):
    from action_detection_tpu.config import SamplingConfig
    from action_detection_tpu.data.ssn_dataset import SSNDataset

    # GT state: the script's per-class DataFrames vs our dataset's get_all_gt
    ds = SSNDataset(oracle_env["prop_file"], SamplingConfig(), verbose=False)
    all_gt = ds.get_all_gt()
    for cls in range(K):
        ours_rows = sorted((vid, float(s), float(e))
                           for vid, c, s, e in all_gt if int(c) == cls)
        ref_rows = sorted(zip(ref_gt[cls]["video-id"],
                              ref_gt[cls]["t-start"], ref_gt[cls]["t-end"]))
        assert [r[0] for r in ours_rows] == [r[0] for r in ref_rows], cls
        np.testing.assert_allclose(
            np.array([r[1:] for r in ours_rows], np.float64).reshape(-1, 2),
            np.array([r[1:] for r in ref_rows], np.float64).reshape(-1, 2),
            atol=1e-6)

    # pre-AP detection state
    for cls in range(K):
        ref_rows = list(zip(ref_pred[cls]["video-id"],
                            ref_pred[cls]["t-start"], ref_pred[cls]["t-end"],
                            ref_pred[cls]["score"]))
        our_rows = [(vid, float(d[0]), float(d[1]), float(d[2]))
                    for vid, dets in our_dets[cls].items()
                    for d in np.asarray(dets)]
        rv, ra = _canon_pred(ref_rows)
        ov, oa = _canon_pred(our_rows)
        assert rv == ov, f"class {cls}: video mismatch"
        np.testing.assert_allclose(oa, ra, atol=1e-6,
                                   err_msg=f"class {cls}")
    return all_gt


def _compare_map(all_gt, our_dets, ref_map_row):
    from action_detection_tpu.evaluation import evaluate_detections

    ap = evaluate_detections(our_dets, all_gt, K, IOU_RANGE, workers=4)
    ours = list(ap.mean(axis=0)) + [float(ap.mean())]
    np.testing.assert_allclose(ours, ref_map_row, atol=1e-3)  # 4-decimal print


def test_reference_evaluator_all_class_mode(oracle_env):
    """top_k<=0: every proposal scored for every class
    (eval_detection_results.py:103-113)."""
    ref_gt, ref_pred, map_row = _run_reference(oracle_env, ["--top_k", "-1"])
    ours = _ours(oracle_env, top_k=0)
    all_gt = _compare(oracle_env, ref_gt, ref_pred, ours)
    _compare_map(all_gt, ours, map_row)


def test_reference_evaluator_topk_mode(oracle_env):
    """Global top-k over softmax(act[:,1:])*exp(comp)
    (eval_detection_results.py:114-129)."""
    ref_gt, ref_pred, map_row = _run_reference(oracle_env, ["--top_k", "37"])
    ours = _ours(oracle_env, top_k=37)
    all_gt = _compare(oracle_env, ref_gt, ref_pred, ours)
    _compare_map(all_gt, ours, map_row)


def test_reference_evaluator_external_classifier_mode(oracle_env):
    """UntrimmedNets-style per-video class filter
    (eval_detection_results.py:130-145)."""
    ref_gt, ref_pred, map_row = _run_reference(
        oracle_env, ["--cls_scores", "cls.pkl", "--cls_top_k", "2"])
    ours = _ours(oracle_env, top_k=0, use_cls=True, cls_top_k=2)
    all_gt = _compare(oracle_env, ref_gt, ref_pred, ours)
    _compare_map(all_gt, ours, map_row)
