"""Closed train -> checkpoint -> score -> eval loop on synthetic data.

VERDICT r2 item 5: the only in-environment proof that the full training path
produces a working detector. Frames carry a plantable signal (class-coded
color inside GT intervals, gray background), SSN+TinyConv trains for a few
dozen steps, and the SAME scoring + evaluation stack the CLIs use
(ProposalScorer -> generate_detections -> NMS -> regression -> mAP) must
score the trained checkpoint materially above random init.

This mirrors the reference's implicit contract ssn_train.py -> ssn_test.py
-> eval_detection_results.py.
"""

import zlib

import numpy as np
import pytest

# heavy tier: reference-oracle / e2e / real-backbone tests (see pytest.ini)
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from action_detection_tpu.config import SamplingConfig
from action_detection_tpu.data.pipeline import assemble_train_batch
from action_detection_tpu.data.ssn_dataset import SSNDataset
from action_detection_tpu.data.transforms import get_train_augmentation
from action_detection_tpu.evaluation import (apply_classwise_nms,
                                             apply_regression,
                                             evaluate_detections,
                                             generate_detections)
from action_detection_tpu.infer.scorer import ProposalScorer
from action_detection_tpu.models import SSN
from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.train import (create_train_state, load_checkpoint,
                                        make_optimizer, make_train_step,
                                        save_checkpoint)

K = 3
PALETTE = {0: (110, 110, 110),          # background
           1: (200, 60, 60), 2: (60, 200, 60), 3: (60, 60, 200)}


class PlantedSignalProvider:
    """Frames whose mean color encodes the action class inside GT intervals.

    The learnable fake data source: inside a GT segment of class c the frame
    is PALETTE[c] plus small deterministic noise; elsewhere gray. A working
    train->eval loop must exploit exactly the per-frame evidence the real
    pipeline would."""

    modality = "RGB"

    def __init__(self, gt_by_vid, width=48, height=40):
        self.gt = gt_by_vid
        self.width = width
        self.height = height

    def load(self, video_id: str, idx: int):
        from PIL import Image

        label = 0
        for l, s, e in self.gt[video_id]:
            if s <= idx <= e:
                label = l
                break
        key = zlib.crc32(f"{video_id}/{int(idx)}".encode())
        rng = np.random.RandomState(key)
        base = np.asarray(PALETTE[label], np.int16)
        arr = base + rng.randint(-12, 13, size=(self.height, self.width, 3))
        return [Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8), "RGB")]


def _write_fixture(path, n_videos=6, frames=600, seed=5):
    """Proposal list + its GT dict; every class appears in several videos."""
    rng = np.random.RandomState(seed)
    gt_by_vid = {}
    lines = []
    for v in range(n_videos):
        vid = f"video_{v}"
        gt = [(1 + v % K, 100, 300), (1 + (v + 1) % K, 400, 520)]
        gt_by_vid[vid] = gt
        props = []
        for g in gt:                       # fg / shifted / incomplete
            props.append((g[0], 0.85, 0.9, g[1] - 20, g[2] + 5))
            props.append((g[0], 0.75, 0.95, g[1] + 5, g[2] - 15))
            props.append((g[0], 0.2, 0.9, g[1] + 30, g[1] + 110))
        props.append((0, 0.0, 0.0, 530, 595))
        props.append((0, 0.005, 0.0, 10, 90))
        lines.append(f"# {v}\n{vid}\n{frames}\n1\n{len(gt)}\n")
        lines.extend(f"{g[0]} {g[1]} {g[2]}\n" for g in gt)
        lines.append(f"{len(props)}\n")
        lines.extend(f"{p[0]} {p[1]:.4f} {p[2]:.4f} {p[3]} {p[4]}\n"
                     for p in props)
    with open(path, "w") as f:
        f.writelines(lines)
    return str(path), gt_by_vid


def _detection_map(model, spec, params, batch_stats, test_ds, provider,
                   reg_stats) -> float:
    """The CLI scoring+eval stack: score every video, detections, NMS,
    regression, mAP@0.5 averaged over classes."""
    scorer = ProposalScorer(model, params, batch_stats, spec,
                            reg_stats=reg_stats, num_class=K, test_crops=1,
                            chunk_frames=8)
    results = {}
    for i in range(len(test_ds.video_list)):
        out = scorer.score_video(test_ds.get_test_sample(i), provider)
        results[out.video_id] = out.as_tuple()
    dets = generate_detections(results, K, top_k=0, softmax_before_filter=True)
    dets = apply_classwise_nms(dets, 0.2)
    dets = apply_regression(dets)
    ap = evaluate_detections(dets, test_ds.get_all_gt(), K, [0.5], workers=2)
    return float(ap.mean())


def test_training_improves_detection_map(tmp_path):
    prop_file, gt_by_vid = _write_fixture(tmp_path / "p.txt")
    sampling = SamplingConfig()
    train_ds = SSNDataset(prop_file, sampling)
    test_ds = SSNDataset(prop_file, sampling, test_interval=25,
                         reg_stats=train_ds.stats)
    provider = PlantedSignalProvider(gt_by_vid)
    aug = get_train_augmentation(32, "RGB")
    model = SSN(num_class=K, base_model="TinyConv", dropout=0.0)
    _, _, spec = get_backbone("TinyConv", "RGB")

    rng = np.random.RandomState(0)
    batch0 = assemble_train_batch(train_ds, [0, 1, 2, 3], provider, aug, rng)
    # lr 0.003: at 0.02 the act head diverges in the first steps and settles
    # into the all-background basin (fg_acc 0) — the loop then proves nothing
    tx = make_optimizer(base_lr=0.003, lr_steps=[1000], steps_per_epoch=1,
                        weight_decay=0.0)
    state = create_train_state(model, tx, batch0, spec, seed=0)

    map_random = _detection_map(model, spec, state.params, state.batch_stats,
                                test_ds, provider, train_ds.stats)

    train_step = make_train_step(model, tx, sampling, spec, donate=False)
    key = jax.random.PRNGKey(0)
    n_vid = len(train_ds.video_list)
    losses = []
    for step in range(40):
        idxs = [(4 * step + j) % n_vid for j in range(4)]
        batch = assemble_train_batch(train_ds, idxs, provider, aug,
                                     np.random.RandomState(step))
        state, metrics = train_step(state, jax.tree.map(jnp.asarray, batch),
                                    key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # round-trip through the checkpoint (the CLIs' medium), then score+eval
    ckpt = tmp_path / "loop_checkpoint.msgpack"
    save_checkpoint(str(ckpt), jax.device_get(state.params), train_ds.stats,
                    batch_stats=jax.device_get(state.batch_stats),
                    epoch=1, arch="TinyConv", best_loss=losses[-1])
    loaded = load_checkpoint(str(ckpt))
    map_trained = _detection_map(model, spec, loaded["params"],
                                 loaded["batch_stats"] or None, test_ds,
                                 provider, loaded["reg_stats"])

    # the trained detector must be materially better than random init
    assert map_trained > map_random + 0.15, (map_random, map_trained)
    assert map_trained > 0.5, (map_random, map_trained)
